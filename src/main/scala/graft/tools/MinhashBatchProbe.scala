package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev-only: per-stage AND per-job timing of one minhashDedupBatch
  * microbatch (the StreamBench minhash cells measured ~47 s per
  * 250-doc batch — find the term; r14: the remaining ~3.4 s/batch
  * floor is JOBS, not data — count them).
  *
  * args: [universeDir] [keptDocs] [batchDocs]
  */
object MinhashBatchProbe {
  def main(args: Array[String]): Unit = {
    val universe = args.headOption.getOrElse("/root/repo/benchdata/sf10")
    val keptN = args.drop(1).headOption.map(_.toLong).getOrElse(50000L)
    val batchN = args.drop(2).headOption.map(_.toInt).getOrElse(250)
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = graft.GraftSession.builder("mh-probe", cpus)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", (!args.contains("--no-aqe")).toString)
      // local-FS bytesRead honesty (same knob as Bench — see SCALING.md)
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled",
        sys.env.getOrElse("SPARK_GRAFT_VECTORED_IO", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, universe).select(col("doc_id"), col("text"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
    val ranked = docs.withColumn("__rn", row_number().over(w).cast("long"))
    val corpus = {
      val base = ranked.filter(col("__rn") <= keptN).drop("__rn")
      // SPARK_GRAFT_STREAM_CORPUS_PARQUET=1: id-sorted parquet corpus
      // (the 100 TB placement — see StreamBench.corpusOf)
      if (sys.env.get("SPARK_GRAFT_STREAM_CORPUS_PARQUET").contains("1")) {
        // per-run temp dir (r17): the old fixed /tmp path leaked GBs
        // across runs and raced concurrent probes. $SPARK_GRAFT_SCRATCH
        // overrides; the JVM-unique default is deleted on exit.
        val p = sys.env.get("SPARK_GRAFT_SCRATCH")
          .map(s => s"$s/mh-corpus")
          .getOrElse {
            val d = java.nio.file.Files
              .createTempDirectory("graft-mh-corpus").toString
            sys.addShutdownHook(
              org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
            d
          }
        base.repartitionByRange(cpus, col("doc_id")).sortWithinPartitions("doc_id")
          .write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      } else base.repartition(cpus).localCheckpoint()
    }
    val wd = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id").desc)
    val stream = docs.withColumn("__rn", row_number().over(wd))
      .filter(col("__rn") <= 4 * batchN).drop("__rn").localCheckpoint()

    import graft.dedup.Dedup
    // the STREAMING.md grid's sink parameters
    val (n, b, r, seed, threshold) = (7, 21, 3, 7L, 0.62)
    val corpusText = corpus
    val corpusSig = Dedup.shingled(corpus, "doc_id", "text", n)
      .withColumn("hs", Dedup.shingleHashes(col("sh")))
      .select(col("id"), Dedup.minhashSignature(col("hs"), Dedup.permCoeffs(b * r, seed)).as("sig"))
    val corpusBands = Dedup.bandedSigRows(corpusSig, b, r)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var t0 = System.nanoTime()
    println(s"corpusBands rows: ${corpusBands.count()} " +
      f"(build ${(System.nanoTime() - t0) / 1e9}%.1f s)")

    val stages = new scala.collection.concurrent.TrieMap[Int, String]()
    val jobStart = new scala.collection.concurrent.TrieMap[Int, (Long, String)]()
    val jobs = new scala.collection.concurrent.TrieMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (dur > 0.3) {
          val rdds = si.rddInfos.map(r => s"${r.id}:${r.name}${r.scope.map("/" + _.name).getOrElse("")}")
            .mkString(" | ").take(300)
          val run = si.taskMetrics.executorRunTime / 1e3
          val cpu = si.taskMetrics.executorCpuTime / 1e9
          val deser = si.taskMetrics.executorDeserializeTime / 1e3
          val inMb = si.taskMetrics.inputMetrics.bytesRead / 1048576
          stages.put(si.stageId,
            f"stage ${si.stageId}%4d ${si.numTasks}%5d tasks $dur%6.2f s (run $run%.2f cpu $cpu%.2f deser $deser%.2f in ${inMb}%d MB)  $rdds")
        }
        ()
      }
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobStart.put(j.jobId, (j.time, desc)); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        jobStart.get(j.jobId).foreach { case (t0j, desc) =>
          jobs.put(j.jobId, f"job ${j.jobId}%4d ${(j.time - t0j) / 1e3}%6.2f s  ${desc.take(180)}")
        }
        ()
      }
    })
    val out = "/tmp/graft-mh-probe/out"
    graft.tools.StreamBenchUtil.clean("/tmp/graft-mh-probe")
    for (bi <- 0 until 3) {
      stages.clear(); jobs.clear(); jobStart.clear()
      val batch = stream.filter(col("doc_id") % 4 === bi).limit(batchN)
      t0 = System.nanoTime()
      graft.streaming.Streams.minhashDedupBatch(corpusText, corpusSig, corpusBands,
        batch, bi.toLong, "doc_id", "text", n, b, r, seed, threshold, out)
      println(f"== batch $bi: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      Thread.sleep(300)
      jobs.toSeq.sortBy(_._1).foreach { case (_, l) => println("  " + l) }
      // stages printed BEFORE any diag work so the dump is the batch's
      // own stages only (the diag candidate count re-minhashes the
      // whole un-persisted corpusSig — its stages polluted earlier
      // reads of this dump)
      stages.toSeq.sortBy(_._1).foreach { case (_, l) => println("  " + l) }
      if (args.contains("--diag")) {
        // time the verify pieces in isolation: shingle stats, candidate
        // counts, and the bipartite verify join alone
        val shNew = Dedup.shingled(batch, "doc_id", "text", n)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sigNew = shNew.withColumn("hs", Dedup.shingleHashes(col("sh")))
          .select(col("id"), Dedup.minhashSignature(col("hs"), Dedup.permCoeffs(b * r, seed)).as("sig"))
        val stats = shNew.agg(avg(col("sh_n")), max(col("sh_n")), count(lit(1))).collect()(0)
        println(s"   shNew: n=${stats.getLong(2)} avg_sh=${stats.getDouble(0)} max_sh=${stats.getInt(1)}")
        val survSig =
          try spark.read.parquet(out).filter(col("__batch_part") =!= bi.toLong)
            .select(col("doc_id").as("id"), col("__sig").as("sig"))
          catch { case _: org.apache.spark.sql.AnalysisException => corpusSig.limit(0) }
        val cands = Dedup.lshCandidatesBipartiteBanded(sigNew, corpusSig.unionByName(survSig), b, r)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nc = cands.count()
        val selfCands = Dedup.lshCandidatesBanded(sigNew, b, r)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nSelf = selfCands.count()
        println(s"   cross_cands=$nc self_cands=$nSelf")
        val hit = corpusText.join(cands.select(col("id_old").as("doc_id")), Seq("doc_id"), "left_semi")
        val shOld = Dedup.shingled(hit.repartition(cpus), "doc_id", "text", n).localCheckpoint()
        t0 = System.nanoTime()
        val nv = Dedup.verifyJaccardBipartite(
          cands.repartition(cpus, col("id_new")), shNew, shOld, threshold).count()
        println(f"   cross verify: $nv hits in ${(System.nanoTime() - t0) / 1e9}%.1f s")
        t0 = System.nanoTime()
        val selfVerify = Dedup.verifyJaccard(
          selfCands.repartition(cpus, col("id_a")), shNew, threshold)
        val ns2 = selfVerify.count()
        println(f"   self verify: $ns2 hits in ${(System.nanoTime() - t0) / 1e9}%.1f s")
        // second count on the SAME Dataset: same QueryExecution, so no
        // re-plan/re-codegen — separates per-query setup from per-row work
        t0 = System.nanoTime()
        selfVerify.count()
        println(f"   self verify rerun: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        t0 = System.nanoTime()
        Dedup.verifyJaccard(
          selfCands.repartition(cpus, col("id_a")), shNew, threshold).count()
        println(f"   self verify fresh-DF rerun: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        if (args.contains("--explain") && bi == 1) {
          println("---- self verify plan ----")
          println(selfVerify.queryExecution.executedPlan.toString.take(8000))
        }
        shNew.unpersist(); cands.unpersist(); selfCands.unpersist()
        ()
      }
    }
    spark.stop()
  }
}

private[tools] object StreamBenchUtil {
  def clean(p: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(p))
    new java.io.File(p).mkdirs()
    ()
  }
}
