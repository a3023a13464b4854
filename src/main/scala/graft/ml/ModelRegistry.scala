package graft.ml

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.Encoders

/** Model lifecycle stages over a [[TrackerBackend]] (reference:
  * selector.py:132 select_best_model + the orchestrator's champion
  * registration — made explicit as candidate → champion → archived
  * transitions in an append-only stage log).
  *
  * Invariant: with a SINGLE promoter (the training pipeline), at most
  * one run settles at [[Champion]]. [[promote]] writes the new champion
  * entry first and then archives the old one, so a torn read sees the
  * old champion, the new one, or briefly both — never none; when both
  * are visible, [[championRunId]] deterministically picks the
  * highest-`seq` (newest) entry. The stage log is an uncoordinated
  * append-only store (parquet has no compare-and-swap): CONCURRENT
  * promoters over one tracker dir, or writers on machines with skewed
  * clocks, need external coordination — the log records every
  * transition either way, so such races are auditable after the fact.
  */
object ModelRegistry {
  val Candidate = "candidate"
  val Champion = "champion"
  val Archived = "archived"

  // seq source: wall-clock ms, nudged past any entry this JVM already
  // wrote so two transitions inside one millisecond stay ordered
  private val lastSeq = new AtomicLong(0L)
  private def nextSeq(): Long =
    lastSeq.updateAndGet(prev => math.max(prev + 1, System.currentTimeMillis()))

  /** Record a freshly trained run as a deployment candidate. */
  def register(tracker: TrackerBackend, runId: String): Unit =
    tracker.logStage(runId, Candidate, nextSeq())

  /** Promote `runId` to champion, archiving the current champion (if
    * any). Promoting the current champion is a no-op. New-champion
    * entry lands BEFORE the archive entries so no reader ever sees zero
    * champions mid-promote (see the object doc for the torn-read and
    * concurrency contract).
    */
  def promote(tracker: TrackerBackend, runId: String): Unit = {
    val current = tracker.runIdsAtStage(Champion)
    if (!current.contains(runId)) {
      tracker.logStage(runId, Champion, nextSeq())
      current.foreach(old => tracker.logStage(old, Archived, nextSeq()))
    }
  }

  /** Retire a run outright (champion or candidate). */
  def archive(tracker: TrackerBackend, runId: String): Unit =
    tracker.logStage(runId, Archived, nextSeq())

  /** A run's current stage (None = never registered). */
  def stageOf(tracker: TrackerBackend, runId: String): Option[String] = {
    import org.apache.spark.sql.functions._
    tracker.stageLog().filter(col("runId") === runId)
      .orderBy(col("seq").desc).limit(1)
      .collect().headOption.map(_.getAs[String]("stage"))
  }

  /** The current champion; if a torn read surfaces two (mid-promote),
    * the newest champion entry (highest seq) wins deterministically.
    */
  def championRunId(tracker: TrackerBackend): Option[String] = {
    import org.apache.spark.sql.functions._
    val ids = tracker.runIdsAtStage(Champion)
    if (ids.size <= 1) ids.headOption
    else tracker.stageLog()
      .filter(col("runId").isin(ids: _*) && col("stage") === Champion)
      .orderBy(col("seq").desc).limit(1)
      .collect().headOption.map(_.getAs[String]("runId"))
  }

  /** The champion's tracker run record (stage log joined back to the
    * run log).
    */
  def championRun(tracker: TrackerBackend): Option[ExperimentTracker.Run] =
    championRunId(tracker).flatMap { id =>
      import org.apache.spark.sql.functions._
      tracker.listRuns().filter(col("runId") === id)
        .as[ExperimentTracker.Run](Encoders.product[ExperimentTracker.Run])
        .collect().headOption
    }

  /** Load the STAGED champion's deployable bundle: the run currently at
    * [[Champion]] must carry a `bundle` artifact (TrainPipeline records
    * the Deployment.save directory there). This is how a scorer picks
    * its model — by lifecycle stage, not by metric ranking.
    *
    * RECOVERY PATH (reference orchestrator.py:808-840 downloads the
    * champion model from the tracker when no local copy exists): if
    * the recorded bundle directory is GONE — a scorer node that lost
    * its working dir — and the backend carries the binary asset
    * ([[TrackerBackend.downloadArtifactDir]]), the bundle is fetched
    * from the tracker into a temp dir and loaded from there. A missing
    * dir on a backend with no asset wire still fails loudly.
    */
  def loadChampionBundle(tracker: TrackerBackend,
      bundleArtifact: String = "bundle"): Option[Deployment.Bundle] =
    championRun(tracker).flatMap { run =>
      run.artifacts.get(bundleArtifact).map { dir =>
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(tracker.spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) Deployment.load(tracker.spark, dir)
        else {
          val tmp = java.nio.file.Files.createTempDirectory("graft-bundle-dl").toString
          require(tracker.downloadArtifactDir(run.runId, bundleArtifact, tmp),
            s"champion bundle dir '$dir' is missing and the tracker holds no " +
              s"'$bundleArtifact' asset for run '${run.runId}' — re-train or " +
              "restore the bundle directory")
          Deployment.load(tracker.spark, tmp)
        }
      }
    }
}
