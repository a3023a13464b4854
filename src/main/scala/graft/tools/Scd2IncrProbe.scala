package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (VERDICT r15 #2): what does [[graft.operators.Scd2
  * .applyChanges]] actually BUY at a realistic touched fraction?
  *
  * The oracle seat (q_scd2_apply) deliberately rebuilds the whole
  * dimension — its change batch is a date slice touching ~every key,
  * because rebuild-equality is what makes the oracle total. This probe
  * measures the PRODUCTION shape instead: a stored dimension, a change
  * batch touching f ∈ {0.01%, 0.1%, 1%} of keys, increment vs full
  * rebuild. Scenario per fraction: base = all orders EXCEPT the
  * late-slice events (date ≥ cutoff) of the touched keys, so every
  * change event is strictly later than the key's folded history (the
  * operator's contract) and the dimension differs per fraction exactly
  * as a nightly load would. The dimension is localCheckpoint-ed before
  * timing — it is the STORED table; its build cost is not the
  * increment's.
  *
  * Output: one JSON line per fraction with apply seconds (min of 2),
  * change-batch rows, touched keys, plus one line for the full-rebuild
  * anchor on the same session.
  */
object Scd2IncrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf10")
    val cutoff = "1998-06-01" // last ~2 months of the 92-98 order stream
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

    val all = graft.Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_orderpriority")

    def timeNoop(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def f3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)

    // rebuild anchor: the full scd2 build over all orders (no sort —
    // the increment path below is timed unsorted too)
    val rebuild = math.min(
      timeNoop(graft.queries.CoreQueries2.scd2Of(spark, all)),
      timeNoop(graft.queries.CoreQueries2.scd2Of(spark, all)))
    println(s"""{"probe":"scd2_incr","sf":"$sfDir","mode":"rebuild","sec":${f3(rebuild)}}""")

    for (m <- Seq(10000L, 1000L, 100L)) { // touched fraction = 1/m of keys
      val touched = pmod(hash($"o_custkey"), lit(m)) === 0
      val base = all.filter($"o_orderdate" < lit(cutoff) || !touched)
      val changes = all.filter($"o_orderdate" >= lit(cutoff) && touched)
        .localCheckpoint() // the nightly batch arrives materialized
      val dim = graft.queries.CoreQueries2.scd2Of(spark, base).localCheckpoint()
      val nChanges = changes.count()
      val nKeys = changes.select($"o_custkey").distinct().count()
      def applyOnce() = timeNoop(graft.operators.Scd2.applyChanges(
        dim, changes, "o_custkey",
        unix_timestamp($"o_orderdate"), $"o_orderkey", "o_orderpriority"))
      val sec = math.min(applyOnce(), applyOnce())
      println(s"""{"probe":"scd2_incr","sf":"$sfDir","mode":"apply","frac":${1.0 / m},"touched_keys":$nKeys,"change_rows":$nChanges,"sec":${f3(sec)},"rebuild_sec":${f3(rebuild)},"speedup":${f3(rebuild / sec)}}""")
      // localCheckpoint blocks aren't cacheManager-registered;
      // release them by RDD or an sf100 run accumulates GBs of
      // blockmgr state per fraction (the r15 sweep lesson)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
