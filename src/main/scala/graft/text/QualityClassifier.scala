package graft.text

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, RegexTokenizer}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document quality filtering — the learned stage LLM
  * pipelines run after rule gates (the GPT-3/PaLM recipe: label a
  * small "good" reference set vs the raw crawl, train a cheap linear
  * classifier over hashed token features, keep documents scoring above
  * a threshold; fastText is the usual implementation).
  *
  * Spark-first shape: RegexTokenizer → HashingTF (hashing trick — NO
  * global vocabulary build, so training scales to any corpus; the
  * tokens never shuffle, only `numFeatures`-wide sparse vectors) →
  * LogisticRegression. Scoring is one model.transform pass —
  * broadcast coefficients, no shuffle at all.
  *
  * The weak-label entry point lets the rule gates already in this repo
  * (q_gopher_rules, TextQualityStats) bootstrap the label column, the
  * standard trick when no hand-labeled reference set exists: train on
  * rules, and the classifier generalizes BEYOND the rules by weighting
  * every token the rules correlate with. Spec'd in PiiBpeSpec: trained
  * on a distinct-token-ratio weak label, it separates held-out clean
  * prose from degenerate repetition with AUC ≥ 0.9.
  */
object QualityClassifier {

  /** Fit the quality model on `docs` with a 0/1 `labelCol`
    * (1 = good). `numFeatures` is the hashing width — collisions
    * degrade gracefully; 2^18 suits real corpora, tests use less.
    */
  def train(docs: DataFrame, textCol: String, labelCol: String,
      numFeatures: Int = 1 << 18): PipelineModel = {
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("__tk").setPattern("\\s+")
    val htf = new HashingTF()
      .setInputCol("__tk").setOutputCol("__tf").setNumFeatures(numFeatures)
    val lr = new LogisticRegression()
      .setFeaturesCol("__tf").setLabelCol(labelCol)
      .setMaxIter(50).setRegParam(1e-3)
    new Pipeline().setStages(Array(tok, htf, lr)).fit(docs)
  }

  /** Score documents: adds `quality_score` = P(good). The helper
    * columns the pipeline needs are dropped on the way out.
    */
  def score(model: PipelineModel, docs: DataFrame, textCol: String): DataFrame =
    model.transform(docs)
      .withColumn("quality_score",
        element_at(org.apache.spark.ml.functions.vector_to_array(col("probability")), 2))
      .drop("__tk", "__tf", "rawPrediction", "probability", "prediction")

  /** A rule-derived weak label (1 = good): distinct-token ratio above
    * `minDistinctRatio` and at least `minTokens` tokens — the
    * repetition/length gate every published rule set shares. Use it to
    * bootstrap [[train]] when no labeled reference set exists.
    */
  def weakLabel(textCol: Column, minTokens: Int = 5,
      minDistinctRatio: Double = 0.4): Column = {
    val tk = split(trim(textCol), "\\s+")
    when(size(tk) >= minTokens &&
      size(array_distinct(tk)).cast("double") / size(tk) >= minDistinctRatio, 1.0)
      .otherwise(0.0)
  }
}
