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
    // optional second arg: comma-separated inverse fractions (e.g.
    // "100" probes only the 1% case); SPARK_GRAFT_STAGE_DUMP=1 prints
    // every stage >0.3 s of the timed applies (attribution mode)
    val mods = args.lift(1).map(_.split(",").map(_.toLong).toSeq)
      .getOrElse(Seq(10000L, 1000L, 100L))
    val stageDump = sys.env.get("SPARK_GRAFT_STAGE_DUMP").contains("1")
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
    if (stageDump) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = s.stageInfo
          val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
          if (dur > 0.3) {
            val m = si.taskMetrics
            println(f"  stage ${si.stageId}%4d ${si.numTasks}%5d tasks $dur%6.2f s  " +
              f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1048576}%d MB " +
              f"shufR=${(m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead) / 1048576}%d MB  " +
              si.rddInfos.map(r => s"${r.name}${r.scope.map("/" + _.name).getOrElse("")}")
                .mkString("|").take(160))
          }
          ()
        }
      })
    }

    val all = graft.Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_orderpriority")

    def timeNoop(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def f3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)

    // rebuild anchor: the full scd2 build over all orders (no sort —
    // the increment path below is timed unsorted too). min-of-3 (r16):
    // this sandbox shows intermittent multi-second host stalls (same
    // family as the SCALING.md r16 drift finding — one probe run read
    // 8.5/19.5/52.1 s for the IDENTICAL rebuild across sessions), so
    // a min over three draws is the honest floor estimator here.
    val rebuild = Seq.fill(3)(
      timeNoop(graft.queries.CoreQueries2.scd2Of(spark, all))).min
    println(s"""{"probe":"scd2_incr","sf":"$sfDir","mode":"rebuild","sec":${f3(rebuild)}}""")

    for (m <- mods) { // touched fraction = 1/m of keys
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
      val sec = Seq.fill(3)(applyOnce()).min
      println(s"""{"probe":"scd2_incr","sf":"$sfDir","mode":"apply","frac":${1.0 / m},"touched_keys":$nKeys,"change_rows":$nChanges,"sec":${f3(sec)},"rebuild_sec":${f3(rebuild)},"speedup":${f3(rebuild / sec)}}""")
      // localCheckpoint blocks aren't cacheManager-registered;
      // release them by RDD or an sf100 run accumulates GBs of
      // blockmgr state per fraction (the r15 sweep lesson)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
