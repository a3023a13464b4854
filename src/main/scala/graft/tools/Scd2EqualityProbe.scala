package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (VERDICT r16 #3): rebuild-equality of the WAIVED-cap
  * [[graft.operators.Scd2.applyChanges]] seat at scale, sort-free.
  *
  * The q_scd2_apply oracle seat proves increment == rebuild at the
  * gated SFs; at sf100skew the r16 sweep could not verify it — the
  * waived path stalled in a single-task sort of the zipf-head key
  * (SCALING.md r16 Defect 1 residual). r17 skew-proofed the operator
  * itself (SaltedRuns run-collapse + hot-key-split joins); this probe
  * is the verification arm: it builds the seat's exact scenario
  * (pre-cutoff dimension, post-cutoff change batch, cap waived),
  * computes BOTH the increment and the full rebuild, and compares
  * them with `exceptAll` BOTH WAYS — MULTISET difference (r18, ADVICE
  * r17: plain `except` is set-based, so duplicate-(key,version) rows —
  * exactly the defect class an SCD2 increment bug produces — could
  * cancel across sides and pass). exceptAll keeps the sort-free
  * full-row-hash shuffle shape (uniform by construction — no global
  * sort, no per-key mega-partition anywhere).
  *
  * Output: one JSON line {equal, n_inc, n_rebuild, inc_minus_rb,
  * rb_minus_inc, sec_apply, sec_rebuild, sec_compare}.
  */
object Scd2EqualityProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf10")
    val cutoff = args.lift(1).getOrElse("1997-01-01")
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
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val dim = graft.queries.CoreQueries2
      .scd2Of(spark, all.filter($"o_orderdate" < lit(cutoff))).localCheckpoint()
    val changes = all.filter($"o_orderdate" >= lit(cutoff))
    // both sides materialized to PARQUET SCRATCH, not localCheckpoint:
    // at sf100skew the three corpus-scale frames (dim + increment +
    // rebuild, ~750M rows) as block-manager state GC-froze a 32 GB
    // driver past the heartbeat timeout (first r17 attempt). Disk is
    // the right place; the compare then times the comparison alone.
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-scd2eq").toString
    sys.addShutdownHook(
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratch)))
    val (_, secApply) = timed(graft.operators.Scd2.applyChanges(
      dim, changes, "o_custkey", unix_timestamp($"o_orderdate"),
      $"o_orderkey", "o_orderpriority", maxTouchedKeys = Long.MaxValue)
      .write.mode("overwrite").parquet(s"$scratch/inc"))
    val (_, secRebuild) = timed(
      graft.queries.CoreQueries2.scd2Of(spark, all)
        .write.mode("overwrite").parquet(s"$scratch/rb"))
    val inc = spark.read.parquet(s"$scratch/inc")
    val rb = spark.read.parquet(s"$scratch/rb")
    val incP = inc.select(rb.columns.map(col): _*)
    val ((nInc, nRb, d1, d2), secCompare) = timed((
      incP.count(), rb.count(),
      incP.exceptAll(rb).count(), rb.exceptAll(incP).count()))
    val (cpuC, ioC) = Calib.readBoth(spark) // self-annotating (r18)
    def f3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"probe":"scd2_equality","sf":"$sfDir","cutoff":"$cutoff","equal":${d1 == 0 && d2 == 0 && nInc == nRb},"n_inc":$nInc,"n_rebuild":$nRb,"inc_minus_rb":$d1,"rb_minus_inc":$d2,"sec_apply":${f3(secApply)},"sec_rebuild":${f3(secRebuild)},"sec_compare":${f3(secCompare)},${Calib.jsonFields(cpuC, ioC)}}""")
    spark.stop()
  }
}
