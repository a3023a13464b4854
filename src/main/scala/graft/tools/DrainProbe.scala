package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev-only: phase + stage breakdown of one qStreamDedupDrain run (the
  * r12 verdict's 81 s bench entry; post-width-fix it should be
  * microbatch-dominated, this finds what is left).
  */
object DrainProbe {
  def main(args: Array[String]): Unit = {
    val universe = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = graft.GraftSession.builder("drain-probe", cpus)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new scala.collection.concurrent.TrieMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (dur > 0.5) {
          stages.put(si.stageId, f"stage ${si.stageId}%4d ${si.numTasks}%5d tasks $dur%6.2f s  " +
            si.rddInfos.map(r => s"${r.name}${r.scope.map("/" + _.name).getOrElse("")}").mkString(" | ").take(200))
        }
        ()
      }
    })
    for (run <- 0 until 2) {
      stages.clear()
      val t0 = System.nanoTime()
      val n = graft.queries.StreamQueries.qStreamDedupDrain(spark, universe).count()
      println(f"== run $run: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n survivors)")
      Thread.sleep(500)
      stages.toSeq.sortBy(_._1).foreach { case (_, l) => println("  " + l) }
    }
    spark.stop()
  }
}
