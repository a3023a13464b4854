package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal experiment tracking: append-only parquet log of runs with
  * params and metrics (reference: src/training/tracking/experiment.py
  * + experiment_tracker.py — the MLflow/Comet surface reduced to its
  * queryable core: log runs, list them, pick the best).
  */
object ExperimentTracker {

  final case class Run(runId: String, model: String, params: Map[String, Double],
      metrics: Map[String, Double], timestampMs: Long)

  /** Append one run to the experiment log at `dir`. */
  def logRun(spark: SparkSession, dir: String, run: Run): Unit = {
    import spark.implicits._
    Seq(run).toDF().write.mode("append").parquet(dir)
  }

  /** All runs, most recent first. */
  def listRuns(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).orderBy(col("timestampMs").desc)

  /** Best run by a metric (ties → most recent), among the most recent
    * `maxRuns` (reference: training-config.yml max_eval_experiments).
    */
  def bestRun(spark: SparkSession, dir: String, metric: String, maxRuns: Int): Option[Run] = {
    import spark.implicits._
    listRuns(spark, dir).limit(maxRuns).as[Run].collect()
      .sortBy(r => (-r.metrics.getOrElse(metric, Double.NegativeInfinity), -r.timestampMs))
      .headOption
  }
}
