package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only end-to-end proof that [[graft.operators.ZOrder.zorderBy]]'s
  * layout actually SKIPS data under a 2-D box predicate (SCALING.md —
  * the ZOrderSpec spread/overlap assertions show the stats are
  * prunable; this measures the parquet reader acting on them): writes
  * sf10 lineitem z-ordered and naturally-partitioned, runs the same
  * box-filter aggregate on both, and reports the scan's
  * decoded-row metric (rows surviving row-group pruning, BEFORE
  * Spark's own Filter) plus wall-clock. A third run with parquet
  * filter pushdown disabled isolates the mechanism.
  */
object ZOrderProbe {

  private def scanDecodedRows(df: DataFrame): (Long, Long) = {
    df.collect()
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => unwrap(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => unwrap(q.plan)
        case other => Seq(other)
      }).flatMap(n => n +: n.children.flatMap(unwrap))
    val scans = unwrap(df.queryExecution.executedPlan)
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    require(scans.nonEmpty, "no FileSourceScanExec in plan")
    (scans.map(_.metrics("numOutputRows").value).sum,
      scans.map(_.metrics("numFiles").value).sum)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf10")
    val scratch = args.drop(1).headOption.getOrElse("/tmp/graft-zorder-probe")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = graft.GraftSession.builder("zorder-probe", cpus)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val li = graft.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice", $"l_discount")
    val total = li.count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("zorder write (64 files)") {
      graft.operators.ZOrder.zorderBy(li, Seq("l_quantity", "l_extendedprice"),
        bits = 6, numFiles = 64).write.mode("overwrite").parquet(s"$scratch/z")
    }
    t("natural write (64 files)") {
      li.repartition(64).write.mode("overwrite").parquet(s"$scratch/base")
    }

    def boxQuery(path: String): DataFrame =
      spark.read.parquet(path)
        .filter($"l_quantity".between(10, 15) && $"l_extendedprice".between(5000, 15000))
        .agg(sum($"l_discount").as("s"), count(lit(1)).as("n"))

    // AQE off: metrics read straight off the executed scan node
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for ((label, path, pushdown) <- Seq(
        ("zorder   +pushdown", s"$scratch/z", true),
        ("natural  +pushdown", s"$scratch/base", true),
        ("zorder   -pushdown", s"$scratch/z", false))) {
      spark.conf.set("spark.sql.parquet.filterPushdown", pushdown)
      // warm + measure
      boxQuery(path).collect()
      val t0 = System.nanoTime()
      val q = boxQuery(path)
      val (decoded, nf) = scanDecodedRows(q)
      val el = (System.nanoTime() - t0) / 1e9
      println(f"$label: decoded $decoded%,d / $total%,d rows " +
        f"(${100.0 * decoded / total}%.1f%%), $nf files, $el%.2f s")
    }
    spark.stop()
  }
}
