package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev-only: stage-level profile of any SparkEntry query at a given SF.
  * Usage: `sbt "runMain graft.tools.QueryProbe <sfDir> <query> [runs]"`.
  * Prints per-run wall time plus every stage above 0.3 s with task
  * width, spill, and shuffle read/write MB — the 100 TB questions
  * (width collapse? spill? which exchange dominates?) in one dump.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf10")
    val query = args.lift(1).getOrElse("q_span_scrub")
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = graft.GraftSession.builder("query-probe", cpus)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
            f"shufR=${(m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead) / 1048576}%d MB  " +
            si.rddInfos.map(r => s"${r.name}${r.scope.map("/" + _.name).getOrElse("")}").mkString("|").take(140))
        }
        ()
      }
    })
    for (run <- 0 until runs) {
      stages.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(query)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      println(f"== run $run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Thread.sleep(500)
      stages.toSeq.sortBy(_._1).foreach { case (_, l) => println("  " + l) }
    }
    spark.stop()
  }
}
