package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (VERDICT r16 #4): is the as-of skew gate worth its
  * machinery on the zipf-head corpus? Reproduces q_asof_attribution's
  * asofBackward on the given SF and times the GATED (default
  * hotThreshold) vs UNGATED (hotThreshold = Long.MaxValue — exactly
  * the pre-r17 single-level plan) paths, min-of-2 each, same session.
  *
  * Output: one JSON line with both times.
  */
object AsofSkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "1024")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"event_type", unix_timestamp($"ts").as("ts_s"))
    val purchases = e.filter($"event_type" === "purchase").drop("event_type")
    val clicks = e.filter($"event_type" === "click").drop("event_type")
      .withColumn("click_ts", $"ts_s")
    def run(thr: Long): Double = {
      val t0 = System.nanoTime()
      graft.operators.AsofJoin
        .asofBackward(purchases, clicks, "user_id", "ts_s", "event_id",
          Seq("click_ts"), hotThreshold = thr)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_purchases"),
          sum(when($"asof_click_ts".isNotNull, 1L).otherwise(0L)).as("n_attributed"))
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(Long.MaxValue) // warm (JIT + page cache) — untimed
    // INTERLEAVED (r18): the original U,U,G,G order confounded the
    // comparison with host io weather that swings 4-20x within minutes
    // on this sandbox (one session read gated 92.2 s where another read
    // 16.1 s on the same binary); alternating U,G,U,G puts both paths
    // under the same weather, and the min-of-2 sheds one bad window.
    val u1 = run(Long.MaxValue); val g1 = run(1000000L)
    val u2 = run(Long.MaxValue); val g2 = run(1000000L)
    val ungated = math.min(u1, u2)
    val gated = math.min(g1, g2)
    // self-annotating (r18): host load stamp on both axes
    val (cpuC, ioC) = Calib.readBoth(spark)
    def f3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"probe":"asof_skew","sf":"$sfDir","gated_sec":${f3(gated)},"ungated_sec":${f3(ungated)},"gated_over_ungated":${f3(gated / ungated)},"runs":{"u1":${f3(u1)},"g1":${f3(g1)},"u2":${f3(u2)},"g2":${f3(g2)}},${Calib.jsonFields(cpuC, ioC)}}""")
    spark.stop()
  }
}
