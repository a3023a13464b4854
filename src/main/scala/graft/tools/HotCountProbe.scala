package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r18): how many keys does the 1% hot probe flag on the
  * full orders scan vs the pre-cutoff / change slices — diagnosing the
  * q_scd2_apply superset-hot-list regression at sf100skew.
  */
object HotCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf100skew")
    val cutoff = args.lift(1).getOrElse("1997-01-01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderdate")
    val hAll = graft.operators.SaltedRuns.detectHotKeys(all, "o_custkey")
    val hPre = graft.operators.SaltedRuns.detectHotKeys(
      all.filter($"o_orderdate" < lit(cutoff)), "o_custkey")
    val hChg = graft.operators.SaltedRuns.detectHotKeys(
      all.filter($"o_orderdate" >= lit(cutoff)), "o_custkey")
    println(s"""{"probe":"hot_count","sf":"$sfDir","n_all":${hAll.size},"n_pre":${hPre.size},"n_chg":${hChg.size},"all":"${hAll.mkString(",")}","chg":"${hChg.mkString(",")}"}""")
    spark.stop()
  }
}
