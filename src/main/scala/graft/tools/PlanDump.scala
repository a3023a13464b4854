package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Diagnostic: print the executed physical plan of named SparkEntry
  * queries (PLANS.md upkeep). Usage:
  * `sbt "runMain graft.tools.PlanDump q_cosine_topk q_roc_auc"`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      var df = SparkEntry.queries(name)(spark, sfDir)
      df.count() // warm + materialize so AQE finalizes the plan
      val t0 = System.nanoTime()
      df = SparkEntry.queries(name)(spark, sfDir)
      df.count()
      println(f"===== $name  warm ${(System.nanoTime() - t0) / 1e9}%.2f s")
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
