package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe: Catalyst size estimates (and the resulting
  * GlobalRank.rangeWidth) through localCheckpoint and joins.
  */
object WidthProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("probe", 32).master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.1")
      .select(col("event_type"), col("value"))
    println("scan stats: " + ev.queryExecution.optimizedPlan.stats.sizeInBytes)
    println("scan width: " + graft.operators.GlobalRank.rangeWidth(ev))
    val ck = ev.localCheckpoint()
    println("ckpt stats: " + ck.queryExecution.optimizedPlan.stats.sizeInBytes)
    println("ckpt width: " + graft.operators.GlobalRank.rangeWidth(ck))
    val med = graft.operators.GlobalRank.quantilesByGroup(
      ck, "event_type", col("value"), Seq("med" -> 0.5))
    val wm = ck.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("value") - col("med")).as("ad"))
    println("join stats: " + wm.queryExecution.optimizedPlan.stats.sizeInBytes)
    println("join width: " + graft.operators.GlobalRank.rangeWidth(wm))
    spark.stop()
  }
}
