package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Dev-only: stage-level profile of q_span_scrub at a given SF plus the
  * touched-doc fraction (docs that lose at least one span). Decides
  * whether carrying `__orig` through the reconstruction join (the r12
  * byte-identical passthrough) is a measurable shuffle term worth
  * splitting (ADVICE r12: join `__orig` back only for ivs-null docs).
  */
object SpanScrubProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf10")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = graft.GraftSession.builder("spanscrub-probe", cpus)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // touched fraction: docs with >1 occurrence of some word-3-gram
    val docs = graft.Tables.documents(spark, sfDir)
    val tk = docs.select(col("doc_id").as("id"),
      graft.text.TextFunctions.tokens(col("text")).as("tk"))
    val spans = tk.select(col("id"),
        posexplode(graft.text.TextFunctions.wordNgramsOf(col("tk"), 3)).as(Seq("pos", "g")))
      .select(col("id"), col("pos"), xxhash64(col("g")).as("h"),
        xxhash64(lit(0x9E3779B9L), col("g")).as("h2"))
    val dupSpans = spans.groupBy(col("h"), col("h2"))
      .agg(count(lit(1)).as("c"), min(struct(col("id"), col("pos"))).as("keep"))
      .filter(col("c") > 1)
    val touched = spans.join(dupSpans.hint("shuffle_hash"), Seq("h", "h2"))
      .filter(!(col("id") === col("keep.id") && col("pos") === col("keep.pos")))
      .select(col("id")).distinct().count()
    val total = docs.count()
    println(f"== docs=$total touched=$touched (${touched * 100.0 / total}%.1f%%)")

    val stages = new scala.collection.concurrent.TrieMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (dur > 0.3) {
          val m = si.taskMetrics
          stages.put(si.stageId,
            f"stage ${si.stageId}%4d ${si.numTasks}%5d tasks $dur%6.2f s  " +
            f"spillMem=${m.memoryBytesSpilled / 1048576}%d MB " +
            f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1048576}%d MB " +
            f"shufR=${m.shuffleReadMetrics.remoteBytesRead / 1048576 + m.shuffleReadMetrics.localBytesRead / 1048576}%d MB  " +
            si.rddInfos.map(r => s"${r.name}${r.scope.map("/" + _.name).getOrElse("")}").mkString("|").take(140))
        }
        ()
      }
    })
    for (run <- 0 until 2) {
      stages.clear()
      val t0 = System.nanoTime()
      graft.queries.DocQueries.all("q_span_scrub")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      println(f"== run $run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Thread.sleep(500)
      stages.toSeq.sortBy(_._1).foreach { case (_, l) => println("  " + l) }
    }
    spark.stop()
  }
}
