package graft.ml

import org.apache.spark.ml.classification._
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.ml.{Estimator, Model, Transformer}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model training + hyperparameter search, the MLlib re-expression of
  * the reference's training core
  * (reference: src/training/core/trainer.py TrainingOrchestrator,
  * src/training/core/optimizer.py ModelOptimizer,
  * src/training/core/ensemble.py ClassifierEnsembleOrchestrator).
  *
  * Model mapping: LogisticRegression↔sklearn LR (elasticnet, class
  * weights), RandomForestClassifier↔sklearn RF, GBTClassifier↔
  * LightGBM/XGBoost (gradient-boosted trees — Spark's native analog).
  * Optuna's seeded random search ↔ `randomSearch` (same loop shape:
  * sample params → fit on train → score on validation → keep best).
  * All training is distributed; nothing here collects the data.
  */
object Trainer {

  /** Hyperparameter range, log-scaled when `log`
    * (reference: training-config.yml search_space_params [lo, hi, log]).
    */
  final case class ParamRange(name: String, lo: Double, hi: Double, log: Boolean = false) {
    def sample(rnd: scala.util.Random): Double =
      if (log) math.exp(math.log(lo) + rnd.nextDouble() * (math.log(hi) - math.log(lo)))
      else lo + rnd.nextDouble() * (hi - lo)
  }

  sealed trait ModelKind
  case object LogReg extends ModelKind
  case object RandomForest extends ModelKind
  case object GBT extends ModelKind

  /** Add a `features` vector column from an array column. */
  def withFeaturesFromArray(df: DataFrame, arrayCol: String): DataFrame =
    df.withColumn("features", array_to_vector(col(arrayCol).cast("array<double>")))

  /** Positive-class probability as a plain double column. */
  def posProb(probabilityCol: String): Column =
    vector_to_array(col(probabilityCol)).getItem(1)

  /** Build a classifier for a sampled parameter assignment. */
  def classifier(kind: ModelKind, p: Map[String, Double], weightCol: Option[String]): Estimator[_ <: Model[_]] =
    kind match {
      case LogReg =>
        val c = new LogisticRegression()
          .setMaxIter(50)
          .setRegParam(p.getOrElse("regParam", 0.0))
          .setElasticNetParam(p.getOrElse("elasticNetParam", 0.0))
        weightCol.foreach(c.setWeightCol)
        c
      case RandomForest =>
        val c = new RandomForestClassifier()
          .setNumTrees(p.getOrElse("numTrees", 20.0).toInt)
          .setMaxDepth(p.getOrElse("maxDepth", 5.0).toInt)
          .setMinInstancesPerNode(p.getOrElse("minInstancesPerNode", 1.0).toInt)
          .setSeed(42L)
        weightCol.foreach(c.setWeightCol)
        c
      case GBT =>
        val c = new GBTClassifier()
          .setMaxIter(p.getOrElse("maxIter", 20.0).toInt)
          .setMaxDepth(p.getOrElse("maxDepth", 5.0).toInt)
          .setStepSize(p.getOrElse("stepSize", 0.1))
          .setSubsamplingRate(p.getOrElse("subsamplingRate", 1.0))
          .setSeed(42L)
        weightCol.foreach(c.setWeightCol)
        c
    }

  final case class Trial(params: Map[String, Double], metric: Double)
  final case class SearchResult(bestModel: Model[_], bestParams: Map[String, Double],
      bestMetric: Double, trials: Seq[Trial])

  /** Validation ROC-AUC of a fitted model. */
  def validationAuc(model: Transformer, valid: DataFrame): Double = {
    val pred = model.transform(valid)
    new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC")
      .evaluate(pred)
  }

  /** Seeded random search (Optuna-analog): `maxTrials` samples from the
    * declared ranges, each fit on `train`, scored by ROC-AUC on `valid`,
    * best kept. Train/valid stay distributed; only metrics come back.
    */
  def randomSearch(kind: ModelKind, space: Seq[ParamRange], train: DataFrame,
      valid: DataFrame, maxTrials: Int, seed: Long,
      weightCol: Option[String] = None): SearchResult = {
    val rnd = new scala.util.Random(seed)
    val trials = (1 to maxTrials).map { _ =>
      val params = space.map(r => r.name -> r.sample(rnd)).toMap
      val model: Model[_] = classifier(kind, params, weightCol).fit(train)
      (params, model)
    }
    val scoredTrials = trials.map { case (params, model) => (params, model, validationAuc(model, valid)) }
    val (bp, bm, bmetric) = scoredTrials.maxBy(_._3)
    SearchResult(bm, bp, bmetric, scoredTrials.map(t => Trial(t._1, t._3)))
  }

  /** k-fold cross-validated grid search over a small explicit grid —
    * the CrossValidator path (reference: train.py cross_val_folds).
    */
  def crossValidateLogReg(train: DataFrame, regParams: Seq[Double], folds: Int): CrossValidatorModelWrapper = {
    val lr = new LogisticRegression().setMaxIter(50)
    val grid = new ParamGridBuilder().addGrid(lr.regParam, regParams).build()
    val cv = new CrossValidator()
      .setEstimator(lr)
      .setEvaluator(new BinaryClassificationEvaluator().setMetricName("areaUnderROC"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(folds)
      .setSeed(42L)
    val m = cv.fit(train)
    CrossValidatorModelWrapper(m.bestModel.asInstanceOf[LogisticRegressionModel], m.avgMetrics.toSeq)
  }

  final case class CrossValidatorModelWrapper(best: LogisticRegressionModel, avgMetrics: Seq[Double])

  /** Soft-voting ensemble: average the positive-class probabilities of
    * the fitted models (reference: ensemble.py:245-305
    * create_voting_ensemble, voting_rule="soft"). Pure column algebra
    * over each model's transform — no extra shuffle.
    */
  def softVote(models: Seq[Transformer], df: DataFrame, threshold: Double = 0.5): DataFrame = {
    val scored = models.zipWithIndex.foldLeft(df) { case (d, (m, i)) =>
      m.transform(d)
        .withColumn(s"p$i", posProb("probability"))
        .drop("rawPrediction", "probability", "prediction")
    }
    val avgP = models.indices.map(i => col(s"p$i")).reduce(_ + _) / models.size
    scored.withColumn("ens_prob", avgP)
      .withColumn("ens_pred", (col("ens_prob") >= threshold).cast("double"))
      .drop(models.indices.map(i => s"p$i"): _*)
  }

  /** Majority vote over already-computed member 0/1 prediction columns.
    * Ties break to class 0 — sklearn `VotingClassifier`'s argmax-first
    * convention (reference: ensemble.py:44,143 voting_rule="hard").
    */
  def hardVoteColumn(preds: Seq[Column]): Column = {
    val ones = preds.map(_.cast("double")).reduce(_ + _)
    (ones > lit(preds.size) - ones).cast("double")
  }

  /** Hard-voting ensemble: majority over the fitted models' `prediction`
    * columns (reference: ensemble.py:44,143 voting_rule="hard" — the
    * branch [[softVote]] does not cover). Same no-shuffle column algebra
    * as softVote; ties go to class 0.
    */
  def hardVote(models: Seq[Transformer], df: DataFrame): DataFrame = {
    val scored = models.zipWithIndex.foldLeft(df) { case (d, (m, i)) =>
      m.transform(d)
        .withColumn(s"v$i", col("prediction"))
        .drop("rawPrediction", "probability", "prediction")
    }
    scored.withColumn("ens_pred", hardVoteColumn(models.indices.map(i => col(s"v$i"))))
      .drop(models.indices.map(i => s"v$i"): _*)
  }

  /** Successive-halving adaptive search — the budget-efficiency analog
    * of the reference's Optuna multivariate-TPE sampler (reference:
    * optimizer.py:329-400 tune_model, :370-381 TPESampler): sample
    * `initialConfigs` parameter sets, fit each rung on a growing
    * fraction of `train` (1/eta^(rungs−1), …, 1/eta, 1), keep the top
    * 1/eta by validation AUC after each rung. Bad configs die on cheap
    * small-sample fits, so the full-data budget concentrates on the
    * promising region — at equal total fits this dominates pure random
    * search on tasks where config quality is sample-size-stable.
    *
    * Fully seeded/deterministic. The returned best model is fitted on
    * the FULL train frame (final rung). Total fits =
    * Σ_r configs_r ≈ initialConfigs · eta/(eta−1) + log_eta rungs.
    */
  def successiveHalving(kind: ModelKind, space: Seq[ParamRange], train: DataFrame,
      valid: DataFrame, initialConfigs: Int, eta: Int, seed: Long,
      weightCol: Option[String] = None): SearchResult = {
    require(eta >= 2, "eta must be >= 2")
    val rnd = new scala.util.Random(seed)
    var survivors: Seq[Map[String, Double]] =
      (1 to initialConfigs).map(_ => space.map(r => r.name -> r.sample(rnd)).toMap)
    // fractions 1/eta^(nRungs-1) … 1/eta, 1: the first rung screens on
    // 1/eta of the data (not 1/initialConfigs — tiny first rungs rank
    // configs on noise and eliminate the good ones), the last rung fits
    // the final `eta`-ish survivors on the full frame
    val nRungs = math.max(1,
      math.ceil(math.log(initialConfigs.toDouble) / math.log(eta.toDouble)).toInt)
    var allTrials = Vector.empty[Trial]
    var lastScored: Seq[(Map[String, Double], Model[_], Double)] = Nil
    for (r <- 0 until nRungs if survivors.nonEmpty) {
      val frac = math.pow(eta.toDouble, (r - (nRungs - 1)).toDouble)
      val sub = if (frac >= 1.0) train else train.sample(withReplacement = false, frac, seed)
      lastScored = survivors.map { p =>
        val m: Model[_] = classifier(kind, p, weightCol).fit(sub)
        (p, m, validationAuc(m, valid))
      }
      allTrials ++= lastScored.map(t => Trial(t._1, t._3))
      // stable sort → deterministic survivor order on AUC ties
      survivors = lastScored.sortBy(-_._3).take(math.max(1, survivors.size / eta)).map(_._1)
    }
    val (bp, bm, bmetric) = lastScored.maxBy(_._3)
    SearchResult(bm, bp, bmetric, allTrials)
  }

  /** Feature importances (tree models) / coefficients (linear) as a
    * (feature_index, importance) DataFrame
    * (reference: evaluator.py:109-206 extract_feature_importance).
    */
  def featureImportance(model: Transformer): Seq[(Int, Double)] = model match {
    case m: RandomForestClassificationModel => m.featureImportances.toArray.zipWithIndex.map(_.swap).toSeq
    case m: GBTClassificationModel          => m.featureImportances.toArray.zipWithIndex.map(_.swap).toSeq
    case m: LogisticRegressionModel         => m.coefficients.toArray.zipWithIndex.map(_.swap).toSeq
    case _                                  => Seq.empty
  }
}
