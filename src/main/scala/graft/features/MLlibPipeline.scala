package graft.features

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature._
import org.apache.spark.sql.DataFrame

/** The reference's sklearn ColumnTransformer pipeline re-expressed as a
  * native MLlib Pipeline (reference: src/feature/utils/data.py:166-259
  * create_data_pipeline): numeric imputer → scaler, categorical
  * indexer → one-hot, assemble → variance-threshold selection.
  *
  * This is the estimator-style twin of [[FeaturePipeline]] (which is
  * DataFrame-first and oracle-checkable); both fit on train only and
  * transform any split. Use this one when the output feeds MLlib
  * models (vector column); use FeaturePipeline when downstream is
  * relational.
  */
object MLlibPipeline {

  /** Hashed TF-IDF vectorization (HashingTF → IDF) — the MLlib scale
    * path for text features when the vocabulary is too large for an
    * explicit token↔index map (the hashing trick: tokens bucket into
    * `numFeatures` slots, no global vocab build, no extra shuffle
    * beyond IDF's one document-frequency aggregation). The exact,
    * relational TF-IDF twin is the q_tfidf query.
    */
  def tfidf(train: DataFrame, tokensCol: String, numFeatures: Int): PipelineModel = {
    val htf = new HashingTF()
      .setInputCol(tokensCol).setOutputCol("__tf").setNumFeatures(numFeatures)
    val idf = new IDF().setInputCol("__tf").setOutputCol("tfidf")
    new Pipeline().setStages(Array(htf, idf)).fit(train)
  }

  /** Build the unfitted pipeline.
    *
    * @param numCols numeric feature columns (imputed median + robust-scaled)
    * @param catCols categorical columns (indexed + one-hot, invalid kept)
    * @param varianceThreshold features with var_samp below this are dropped
    */
  def build(numCols: Seq[String], catCols: Seq[String], varianceThreshold: Double): Pipeline = {
    val imputer = new Imputer()
      .setStrategy("median")
      .setInputCols(numCols.toArray)
      .setOutputCols(numCols.map(_ + "_imp").toArray)
    val numAssembler = new VectorAssembler()
      .setInputCols(numCols.map(_ + "_imp").toArray)
      .setOutputCol("num_vec")
    val scaler = new RobustScaler()
      .setInputCol("num_vec").setOutputCol("num_scaled")
      .setWithCentering(true).setWithScaling(true)
    val indexers = catCols.map(c =>
      new StringIndexer().setInputCol(c).setOutputCol(c + "_idx")
        .setHandleInvalid("keep").setStringOrderType("alphabetAsc"))
    val ohe = new OneHotEncoder()
      .setInputCols(catCols.map(_ + "_idx").toArray)
      .setOutputCols(catCols.map(_ + "_oh").toArray)
      .setDropLast(true)
    val assembler = new VectorAssembler()
      .setInputCols((Seq("num_scaled") ++ catCols.map(_ + "_oh")).toArray)
      .setOutputCol("assembled")
    val selector = new VarianceThresholdSelector()
      .setVarianceThreshold(varianceThreshold)
      .setFeaturesCol("assembled").setOutputCol("features")
    new Pipeline().setStages(
      (Seq(imputer, numAssembler, scaler) ++ indexers ++ Seq(ohe, assembler, selector)).toArray)
  }

  /** Fit on train, return the fitted model (apply with .transform). */
  def fit(train: DataFrame, numCols: Seq[String], catCols: Seq[String],
      varianceThreshold: Double = 0.0): PipelineModel =
    build(numCols, catCols, varianceThreshold).fit(train)
}
