package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

/** Dev-only probe for q_drift_audit's barrier floor: times the query
  * end-to-end and prints per-job wall-clock so the driver-round-trip
  * cost is visible (SCALING.md / VERDICT r11 finding #1).
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = graft.GraftSession.builder("drift-probe", cpus.toInt)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    graft.SparkEntry.entry(spark).count()
    val jobs = new scala.collection.concurrent.TrieMap[Int, (Long, Long)]()
    val stages = new scala.collection.concurrent.TrieMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.put(j.jobId, (j.time, -1L)); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        jobs.updateWith(j.jobId)(_.map(t => (t._1, j.time))); ()
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        stages.put(si.stageId,
          f"stage ${si.stageId}%3d ${si.numTasks}%4d tasks $dur%6.2f s  ${si.name.take(70)}")
        ()
      }
    })
    for (i <- 1 to 2) {
      jobs.clear(); stages.clear()
      val t0 = System.nanoTime()
      graft.queries.EvalQueries.qDriftAudit(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val el = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val js = jobs.toSeq.sortBy(_._1)
      println(f"== run $i: total $el%.2f s, ${js.size} jobs")
      var prevEnd = -1L
      js.foreach { case (id, (s, e)) =>
        val gap = if (prevEnd > 0) s - prevEnd else 0L
        println(f"  job $id%3d  ${(e - s) / 1e3}%6.2f s  (+gap ${gap / 1e3}%5.2f s)")
        prevEnd = e
      }
      stages.toSeq.sortBy(_._1).foreach { case (_, l) => println(s"  $l") }
    }
    spark.stop()
  }
}
