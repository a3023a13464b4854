package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev-only: per-stage timing of one minhashDedupBatch microbatch (the
  * StreamBench minhash cells measured ~47 s per 250-doc batch — find
  * the term).
  */
object MinhashBatchProbe {
  def main(args: Array[String]): Unit = {
    val universe = args.headOption.getOrElse("/root/repo/benchdata/sf10")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = graft.GraftSession.builder("mh-probe", cpus)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        args.drop(1).headOption.getOrElse("true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, universe).select(col("doc_id"), col("text"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
    val ranked = docs.withColumn("__rn", row_number().over(w).cast("long"))
    val corpus = ranked.filter(col("__rn") <= 50000).drop("__rn")
      .repartition(cpus).localCheckpoint()
    val wd = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id").desc)
    val stream = docs.withColumn("__rn", row_number().over(wd))
      .filter(col("__rn") <= 1000).drop("__rn").localCheckpoint()

    import graft.dedup.Dedup
    val (n, b, r, seed, threshold) = (7, 32, 2, 7L, 0.62)
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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (dur > 0.3) {
          val rdds = si.rddInfos.map(r => s"${r.id}:${r.name}${r.scope.map("/" + _.name).getOrElse("")}")
            .mkString(" | ").take(400)
          stages.put(si.stageId,
            f"stage ${si.stageId}%4d ${si.numTasks}%5d tasks $dur%6.2f s  $rdds")
        }
        ()
      }
    })
    val out = "/tmp/graft-mh-probe/out"
    graft.tools.StreamBenchUtil.clean("/tmp/graft-mh-probe")
    for (bi <- 0 until 3) {
      stages.clear()
      val batch = stream.filter(col("doc_id") % 4 === bi).limit(250)
      t0 = System.nanoTime()
      graft.streaming.Streams.minhashDedupBatch(corpusText, corpusSig, corpusBands,
        batch, bi.toLong, "doc_id", "text", n, b, r, seed, threshold, out)
      println(f"== batch $bi: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      // re-derive the batch's internal frames for counts
      val sigNew = Dedup.shingled(batch, "doc_id", "text", n)
        .withColumn("hs", Dedup.shingleHashes(col("sh")))
        .select(col("id"), Dedup.minhashSignature(col("hs"), Dedup.permCoeffs(b * r, seed)).as("sig"))
      val survSig =
        try spark.read.parquet(s"$out.__sig").filter(col("__batch_part") =!= bi.toLong)
          .select(col("id"), col("sig"))
        catch { case _: org.apache.spark.sql.AnalysisException => corpusSig.limit(0) }
      val cands = Dedup.lshCandidatesBipartiteBanded(sigNew, corpusSig.unionByName(survSig), b, r)
      t0 = System.nanoTime()
      val nc = cands.count()
      val nOld = cands.select(col("id_old")).distinct().count()
      println(f"   cands=$nc distinct_old=$nOld (count ${(System.nanoTime() - t0) / 1e9}%.1f s)")
      Thread.sleep(300)
      stages.toSeq.sortBy(_._1).foreach { case (_, l) => println("  " + l) }
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
