package graft.tools

import org.apache.spark.sql.functions._

/** Skew-decade evidence harness (SCALING.md skew table): on a
  * `ScaleReplicate … skew` corpus (20% of orders on custkey 1), run
  * the orders⋈customer join in the SHUFFLE-join regime — at 100 TB
  * neither side of that join broadcasts, so local-mode's automatic
  * broadcast would measure the wrong plan — and print:
  *
  *   1. whether AQE's skew split fires (`skew=true` in the executed
  *      plan), with the skew thresholds scaled to this corpus's hot
  *      partition (the 256 MB default targets executor-memory-scale
  *      partitions; the detection MECHANISM is what's under test),
  *   2. wall-clock with the skew split on vs off (the cost of one
  *      straggler partition on 32 cores),
  *   3. wall-clock for the manual alternative, SaltedJoin.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("benchdata/sf10skew")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = graft.GraftSession.builder("skew-probe", cpus)
      .master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for ((k, v) <- Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> (16L * 1024 * 1024).toString,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> (8L * 1024 * 1024).toString))
      spark.conf.set(k, v)
    def q() = graft.Tables.orders(spark, d)
      .join(graft.Tables.customer(spark, d), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), sum($"o_totalprice").as("rev"))
    def time(f: => Unit): Double = {
      // min-of-2, Bench methodology (JIT/codegen/FS-cache absorb)
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    }
    q().collect() // warm-up: scan + codegen outside any timing
    // skew split ON (default); a FRESH frame per timing — re-collecting
    // one Dataset would reuse its shuffle files and time only the
    // final stage
    val tOn = time { q().collect() }
    val qOn = q(); qOn.collect()
    val plan = qOn.queryExecution.executedPlan.toString
    println(f"skew-split ON : $tOn%6.2f s   skew=true in plan: ${plan.contains("skew=true")}")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val tOff = time { q().collect() }
    println(f"skew-split OFF: $tOff%6.2f s")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val tSalt = time {
      graft.operators.SaltedJoin.innerSalted(
        graft.Tables.orders(spark, d).withColumn("k", $"o_custkey"),
        graft.Tables.customer(spark, d).withColumn("k", $"c_custkey"), "k", salts = 32)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"), sum($"o_totalprice").as("rev"))
        .collect()
    }
    println(f"salted join   : $tSalt%6.2f s")
    if (!plan.contains("skew=true"))
      println("PLAN (skew did not fire):\n" + plan.take(3000))
    spark.stop()
  }
}
