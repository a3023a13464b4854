package graft.ml

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._

import ExperimentTracker.Run

/** Pluggable experiment-tracking backend (reference:
  * src/training/tracking/orchestrator.py:38 TrackerRegistry — the seam
  * that registers comet/mlflow tracker factories by name; here the two
  * public impls are the parquet log and an in-memory store for tests).
  *
  * Everything a tracker stores is queryable as DataFrames; the
  * selection rules ([[bestRun]]/[[bestDeployableRun]]) are default
  * methods so every backend ranks runs identically.
  */
trait TrackerBackend {
  def spark: SparkSession

  def logRun(run: Run): Unit
  /** All runs, most recent first. */
  def listRuns(): DataFrame
  def logTrials(runId: String, trials: Seq[Trainer.Trial]): Unit
  /** A run's logged search trials, in trial order. */
  def trialsOf(runId: String): DataFrame
  def logConfusionMatrix(runId: String, cm: DataFrame): Unit
  def confusionMatrix(runId: String): DataFrame

  /** Log a plot-ready curve artifact (ROC/PR/calibration/lift — the
    * reference's evaluation/visualizer.py figures, stored as data +
    * axis metadata instead of rendered pixels).
    */
  def logCurve(runId: String, name: String, curve: EvalArtifacts.Curve): Unit
  def curve(runId: String, name: String): EvalArtifacts.Curve
  def curveNames(runId: String): Seq[String]

  /** Upload a LOCAL directory (a model bundle — Deployment.save
    * layout) as run-attached binary artifact `name` on the tracker's
    * own store. Returns false when the backend has no binary-asset
    * wire (pointer-only backends: parquet/memory/comet keep payloads
    * on shared storage under the recorded pointer); true after a
    * completed upload. Reference: orchestrator.py:500-523 registers
    * the champion model WITH the tracker so a node that lost its
    * working dir can recover it.
    */
  def uploadArtifactDir(runId: String, name: String, localDir: String): Boolean = false

  /** Download binary artifact `name` of `runId` into `destDir`
    * (created if missing). Returns false when the backend has no
    * binary-asset wire or holds no such artifact — callers fall back
    * or fail loudly ([[ModelRegistry.loadChampionBundle]]'s recovery
    * path, reference orchestrator.py:808-840).
    */
  def downloadArtifactDir(runId: String, name: String, destDir: String): Boolean = false

  /** Append a lifecycle stage transition for a run (see
    * [[ModelRegistry]]; stages: candidate → champion → archived).
    * `seq` orders transitions; callers use [[ModelRegistry]] rather
    * than calling this directly.
    */
  def logStage(runId: String, stage: String, seq: Long): Unit
  /** The append-only stage log: (runId, stage, seq). */
  def stageLog(): DataFrame

  /** runIds whose LATEST stage transition is `stage`. */
  final def runIdsAtStage(stage: String): Seq[String] = {
    val log = stageLog()
    if (log.isEmpty) Seq.empty
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("runId")).orderBy(col("seq").desc)
      log.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1 && col("stage") === stage)
        .select("runId").collect().map(_.getString(0)).toSeq
    }
  }

  /** Best run by a metric (ties → most recent), among the most recent
    * `maxRuns` (reference: training-config.yml max_eval_experiments).
    */
  final def bestRun(metric: String, maxRuns: Int): Option[Run] =
    collectRuns(maxRuns)
      .sortBy(r => (-r.metrics.getOrElse(metric, Double.NegativeInfinity), -r.timestampMs))
      .headOption

  /** Best run that ALSO carries a registered model artifact — the
    * deployable-only selection rule (reference: selector.py
    * select_best_model skips experiments without model files). Runs
    * whose lifecycle stage is `archived` are never deployable; runs
    * with no stage entry stay eligible (pre-registry logs).
    */
  final def bestDeployableRun(metric: String, maxRuns: Int,
      modelArtifact: String = "model"): Option[Run] = {
    val archived = runIdsAtStage(ModelRegistry.Archived).toSet
    collectRuns(maxRuns)
      .filter(r => r.artifacts.contains(modelArtifact) && !archived.contains(r.runId))
      .sortBy(r => (-r.metrics.getOrElse(metric, Double.NegativeInfinity), -r.timestampMs))
      .headOption
  }

  private def collectRuns(maxRuns: Int): Array[Run] =
    listRuns().limit(maxRuns).as[Run](Encoders.product[Run]).collect()
}

/** The parquet-backed tracker — [[ExperimentTracker]]'s append-only
  * layout behind the backend trait. Curves live under
  * `dir/curves/<runId>/<name>` (data columns + constant metadata
  * columns); stages under `dir/stages`.
  */
final class ParquetTracker(val spark: SparkSession, dir: String) extends TrackerBackend {
  import org.apache.hadoop.fs.Path

  override def logRun(run: Run): Unit = ExperimentTracker.logRun(spark, dir, run)
  override def listRuns(): DataFrame = ExperimentTracker.listRuns(spark, dir)
  override def logTrials(runId: String, trials: Seq[Trainer.Trial]): Unit =
    ExperimentTracker.logTrials(spark, dir, runId, trials)
  override def trialsOf(runId: String): DataFrame =
    ExperimentTracker.trialsOf(spark, dir, runId)
  override def logConfusionMatrix(runId: String, cm: DataFrame): Unit =
    ExperimentTracker.logConfusionMatrix(dir, runId, cm)
  override def confusionMatrix(runId: String): DataFrame =
    ExperimentTracker.confusionMatrix(spark, dir, runId)

  // curve layout: data frame at .../<name>/data, axis metadata as a
  // 1-row sidecar at .../<name>/meta — metadata must survive row-free
  // so an EMPTY curve frame (e.g. calibration over an empty split)
  // still round-trips with its chart kind and labels
  override def logCurve(runId: String, name: String, curve: EvalArtifacts.Curve): Unit = {
    import spark.implicits._
    val base = s"$dir/curves/$runId/$name"
    curve.frame.write.mode("overwrite").parquet(s"$base/data")
    Seq((curve.chart, curve.xLabel, curve.yLabel))
      .toDF("chart", "x_label", "y_label")
      .write.mode("overwrite").parquet(s"$base/meta")
  }

  override def curve(runId: String, name: String): EvalArtifacts.Curve = {
    val base = s"$dir/curves/$runId/$name"
    val meta = spark.read.parquet(s"$base/meta").head()
    EvalArtifacts.Curve(meta.getAs[String]("chart"), meta.getAs[String]("x_label"),
      meta.getAs[String]("y_label"), spark.read.parquet(s"$base/data"))
  }

  override def curveNames(runId: String): Seq[String] = {
    val p = new Path(s"$dir/curves/$runId")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  override def logStage(runId: String, stage: String, seq: Long): Unit = {
    import spark.implicits._
    Seq((runId, stage, seq)).toDF("runId", "stage", "seq")
      .write.mode("append").parquet(s"$dir/stages")
  }

  override def stageLog(): DataFrame = {
    val p = new Path(s"$dir/stages")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(p.toString)
    else spark.createDataFrame(java.util.Collections.emptyList[Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("runId", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("stage", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType))))
  }
}

/** In-memory tracker for tests and notebook-scale use: same contract,
  * no filesystem. Instances are shared per registry key (see
  * [[TrackerRegistry.create]]), so a pipeline can log into the store a
  * spec later reads. Test-scale only — state lives on the driver.
  */
final class InMemoryTracker(val spark: SparkSession) extends TrackerBackend {
  private val runs = scala.collection.mutable.ArrayBuffer[Run]()
  private val trials = scala.collection.mutable.LinkedHashMap[String, Seq[Trainer.Trial]]()
  private val cms = scala.collection.mutable.LinkedHashMap[String, DataFrame]()
  private val curves = scala.collection.mutable.LinkedHashMap[(String, String), EvalArtifacts.Curve]()
  private val stages = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()

  override def logRun(run: Run): Unit = synchronized { runs += run }
  override def listRuns(): DataFrame = synchronized {
    require(runs.nonEmpty, "no experiment runs logged")
    spark.createDataFrame(runs.toSeq).orderBy(col("timestampMs").desc)
  }
  override def logTrials(runId: String, ts: Seq[Trainer.Trial]): Unit =
    synchronized { trials(runId) = ts }
  override def trialsOf(runId: String): DataFrame = synchronized {
    import spark.implicits._
    trials(runId).zipWithIndex.map { case (t, i) => (i, t.params, t.metric) }
      .toDF("trial", "params", "metric").orderBy(col("trial"))
  }
  override def logConfusionMatrix(runId: String, cm: DataFrame): Unit =
    synchronized { cms(runId) = cm }
  override def confusionMatrix(runId: String): DataFrame = synchronized { cms(runId) }
  override def logCurve(runId: String, name: String, curve: EvalArtifacts.Curve): Unit =
    synchronized { curves((runId, name)) = curve }
  override def curve(runId: String, name: String): EvalArtifacts.Curve =
    synchronized { curves((runId, name)) }
  override def curveNames(runId: String): Seq[String] =
    synchronized { curves.keys.filter(_._1 == runId).map(_._2).toSeq.sorted }
  override def logStage(runId: String, stage: String, seq: Long): Unit =
    synchronized { stages += ((runId, stage, seq)) }
  override def stageLog(): DataFrame = synchronized {
    import spark.implicits._
    stages.toSeq.toDF("runId", "stage", "seq")
  }
}

/** Backend factories by name (reference: orchestrator.py:38
  * TrackerRegistry.register). `parquet` and `memory` ship built in;
  * users register their own with [[register]]. Memory instances are
  * shared per (name-independent) URI so the writer and a later reader
  * get the same store.
  */
object TrackerRegistry {
  type Factory = (SparkSession, String) => TrackerBackend

  private val factories = TrieMap[String, Factory](
    "parquet" -> ((s, uri) => new ParquetTracker(s, uri)),
    "memory" -> ((s, uri) => memoryStores.getOrElseUpdate(uri, new InMemoryTracker(s))),
    // uri = an MLflow tracking server URL (http://host:port); spec'd
    // against a local wire-format stub — see MlflowTracker
    "mlflow" -> ((s, uri) => new MlflowTracker(s, uri)),
    // uri = a Comet-format REST server URL — the reference registry's
    // second remote backend (orchestrator.py:84-105); spec'd against a
    // local wire-format stub — see CometTracker
    "comet" -> ((s, uri) => new CometTracker(s, uri)))
  private val memoryStores = TrieMap[String, InMemoryTracker]()

  def register(name: String, factory: Factory): Unit = factories.put(name, factory)
  def registered: Set[String] = factories.keySet.toSet

  /** Drop a shared in-memory store (memory trackers are retained per
    * key for the JVM lifetime otherwise — call this when a test or
    * notebook is done with a key).
    */
  def dropMemoryStore(uri: String): Unit = memoryStores.remove(uri)

  def create(name: String, spark: SparkSession, uri: String): TrackerBackend =
    factories.getOrElse(name,
      sys.error(s"unknown tracker backend '$name' (registered: ${registered.mkString(", ")})"))(
      spark, uri)
}
