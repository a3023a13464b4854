package graft.ml

import org.apache.spark.ml.util.MLWritable
import org.apache.spark.ml.Transformer
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Champion-model selection, persistence, and batch scoring
  * (reference: src/training/evaluation/champion.py ModelChampionManager,
  * src/training/evaluation/selector.py, src/inference/predict.py).
  */
object Champion {

  final case class Candidate(name: String, model: Transformer, metric: Double)

  /** Select the champion: highest comparison metric, and only if it
    * clears the deployment threshold
    * (reference: champion.py:52-83 select_best_performer +
    * training-config.yml deployment_score_thresh).
    */
  def select(candidates: Seq[Candidate], deploymentThreshold: Double): Option[Candidate] = {
    require(candidates.nonEmpty, "no candidate models")
    val best = candidates.maxBy(_.metric)
    if (best.metric >= deploymentThreshold) Some(best) else None
  }

  /** Persist a fitted model (model-registry analog). */
  def save(model: Transformer, path: String): Unit =
    model.asInstanceOf[MLWritable].write.overwrite().save(path)

  /** Batch prediction: read parquet, add features + scores, write
    * parquet (reference: src/inference/predict.py predict → parquet).
    * Stays fully distributed end to end.
    */
  def batchPredict(spark: SparkSession, model: Transformer, inPath: String,
      outPath: String, featureArrayCol: String): Unit = {
    val in = spark.read.parquet(inPath)
    val feats = Trainer.withFeaturesFromArray(in, featureArrayCol)
    val scored = model.transform(feats)
      .withColumn("pos_prob", Trainer.posProb("probability"))
      .drop("features", "rawPrediction", "probability")
    scored.write.mode("overwrite").parquet(outPath)
  }

  /** [[batchPredict]] behind a [[graft.features.FeatureSchema]] gate
    * (reference: api_server.py:96-131 validates records before the
    * model sees them; this is the batch analog): malformed rows land in
    * `quarantinePath` with their per-row violation reasons, clean rows
    * score exactly as [[batchPredict]] would (the clean frame's
    * declared columns are cast to their declared types — a no-op when
    * the input already matches). The scoring job never dies on a bad
    * record and the quarantine is auditable.
    */
  def batchPredictValidated(spark: SparkSession, model: Transformer, inPath: String,
      outPath: String, quarantinePath: String, featureArrayCol: String,
      rules: Seq[graft.features.FeatureSchema.Rule]): Unit = {
    val in = spark.read.parquet(inPath)
    val split = graft.features.FeatureSchema.validate(in, rules)
    split.quarantine.write.mode("overwrite").parquet(quarantinePath)
    val feats = Trainer.withFeaturesFromArray(split.ok, featureArrayCol)
    val scored = model.transform(feats)
      .withColumn("pos_prob", Trainer.posProb("probability"))
      .drop("features", "rawPrediction", "probability")
    scored.write.mode("overwrite").parquet(outPath)
  }

  /** Multiclass batch prediction: `prediction` (class index) plus the
    * full per-class probability array — pos_prob is a binary concept.
    */
  def batchPredictMulticlass(spark: SparkSession, model: Transformer, inPath: String,
      outPath: String, featureArrayCol: String): Unit = {
    val in = spark.read.parquet(inPath)
    val feats = Trainer.withFeaturesFromArray(in, featureArrayCol)
    val scored = model.transform(feats)
      .withColumn("class_probs",
        org.apache.spark.ml.functions.vector_to_array(
          org.apache.spark.sql.functions.col("probability")))
      .drop("features", "rawPrediction", "probability")
    scored.write.mode("overwrite").parquet(outPath)
  }
}
