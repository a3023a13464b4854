package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.regression.{IsotonicRegression, IsotonicRegressionModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probability calibration + decision-threshold tuning
  * (reference: src/training/evaluation/champion.py:84-173
  * calibrate_pipeline (CalibratedClassifierCV isotonic) and
  * tune_decision_threshold).
  *
  * Isotonic regression is the distributed analog of sklearn's isotonic
  * CalibratedClassifierCV: fit a monotone map from raw score to
  * empirical probability on a held-out calibration set, apply it as a
  * transform. MLlib's IsotonicRegression runs pool-adjacent-violators
  * on sorted (score, label) — one shuffle of the calibration set only.
  */
object Calibration {

  /** Fit an isotonic score→probability map on a calibration set.
    * `scoreCol` is the model's positive-class probability, `labelCol`
    * the 0/1 truth.
    */
  def fitIsotonic(calib: DataFrame, scoreCol: String, labelCol: String): IsotonicRegressionModel =
    new IsotonicRegression()
      .setFeaturesCol("__cal_features")
      .setLabelCol(labelCol)
      .setIsotonic(true)
      // scratch output name: the calibration frame may already carry a
      // model's `prediction` column (fit validates the output schema)
      .setPredictionCol("__cal_pred")
      .fit(calib.withColumn("__cal_features",
        array_to_vector(array(col(scoreCol).cast("double")))))

  /** Apply a fitted calibration map: adds `calibratedCol`. */
  def applyCalibration(df: DataFrame, model: IsotonicRegressionModel,
      scoreCol: String, calibratedCol: String): DataFrame =
    model
      .setPredictionCol(calibratedCol)
      .transform(df.withColumn("__cal_features",
        array_to_vector(array(col(scoreCol).cast("double")))))
      .drop("__cal_features")

  /** Platt/sigmoid calibration: a 1-feature logistic regression from
    * raw score to 0/1 label — the small-calibration-set branch the
    * reference takes when isotonic would overfit (reference:
    * champion.py:127 `isotonic if len(valid) > 1000 else sigmoid`).
    */
  def fitSigmoid(calib: DataFrame, scoreCol: String, labelCol: String): LogisticRegressionModel =
    new LogisticRegression()
      .setFeaturesCol("__cal_features")
      .setLabelCol(labelCol)
      .setMaxIter(100)
      // scratch output names: the calibration frame may already carry
      // a model's prediction/probability columns
      .setPredictionCol("__cal_pred")
      .setRawPredictionCol("__cal_raw")
      .setProbabilityCol("__cal_prob")
      .fit(calib.withColumn("__cal_features",
        array_to_vector(array(col(scoreCol).cast("double")))))

  /** Apply a fitted Platt map: adds `calibratedCol` = σ(a·score + b). */
  def applySigmoid(df: DataFrame, model: LogisticRegressionModel,
      scoreCol: String, calibratedCol: String): DataFrame =
    model
      .setRawPredictionCol("__cal_raw").setProbabilityCol("__cal_prob")
      .setPredictionCol("__cal_pred")
      .transform(df.withColumn("__cal_features",
        array_to_vector(array(col(scoreCol).cast("double")))))
      .withColumn(calibratedCol, vector_to_array(col("__cal_prob")).getItem(1))
      .drop("__cal_features", "__cal_raw", "__cal_prob", "__cal_pred")

  /** A fitted calibration map, isotonic or sigmoid, applied uniformly. */
  sealed trait Calibrator {
    def method: String
    def calibrate(df: DataFrame, scoreCol: String, calibratedCol: String): DataFrame
  }
  final case class IsotonicCalibrator(model: IsotonicRegressionModel) extends Calibrator {
    val method = "isotonic"
    def calibrate(df: DataFrame, scoreCol: String, calibratedCol: String): DataFrame =
      applyCalibration(df, model, scoreCol, calibratedCol)
  }
  final case class SigmoidCalibrator(model: LogisticRegressionModel) extends Calibrator {
    val method = "sigmoid"
    def calibrate(df: DataFrame, scoreCol: String, calibratedCol: String): DataFrame =
      applySigmoid(df, model, scoreCol, calibratedCol)
  }

  /** CV-fold-averaged calibration — sklearn `CalibratedClassifierCV`
    * ensemble semantics for the calibration-map seat (reference:
    * champion.py:84 calibrate_pipeline): one calibrator per fold (each
    * fit on the other k−1 folds), applied to new data as the MEAN of
    * the per-fold maps. Averaging k step functions / sigmoids smooths
    * the single-fit map's overfit steps on small calibration sets.
    */
  final case class CvCalibrator(folds: Seq[Calibrator]) extends Calibrator {
    require(folds.nonEmpty, "CvCalibrator needs at least one fold")
    val method = s"cv${folds.size}_${folds.head.method}"
    def calibrate(df: DataFrame, scoreCol: String, calibratedCol: String): DataFrame = {
      val perFold = folds.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
        c.calibrate(d, scoreCol, s"__cvc_$i")
      }
      perFold
        .withColumn(calibratedCol,
          folds.indices.map(i => col(s"__cvc_$i")).reduce(_ + _) / folds.size)
        .drop(folds.indices.map(i => s"__cvc_$i"): _*)
    }
  }

  /** Fit a [[CvCalibrator]]: seeded fold assignment (frozen via
    * persist), isotonic-vs-sigmoid auto-selected per the same
    * size rule as [[fitAuto]] on the per-fold TRAINING size.
    */
  def fitCvAuto(calib: DataFrame, scoreCol: String, labelCol: String,
      k: Int = 5, seed: Long = 42L, isotonicMinRows: Long = 1000L): CvCalibrator = {
    require(k >= 2, "k must be >= 2")
    val withFold = calib
      .withColumn("__fold", floor(rand(seed) * k).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nRows = withFold.count() // materializes the frozen folds
      val foldTrainRows = nRows - nRows / k
      CvCalibrator((0 until k).map { i =>
        val trainFolds = withFold.filter(col("__fold") =!= i).drop("__fold")
        if (foldTrainRows > isotonicMinRows)
          IsotonicCalibrator(fitIsotonic(trainFolds, scoreCol, labelCol))
        else SigmoidCalibrator(fitSigmoid(trainFolds, scoreCol, labelCol))
      })
    } finally withFold.unpersist()
  }

  /** The reference's method-selection rule (champion.py:127): isotonic
    * when the calibration set is large enough to support a stepwise
    * monotone fit, Platt sigmoid below the cutoff. The size probe is a
    * BOUNDED count (limit cutoff+1) — deciding a binary rule never
    * needs the full-frame count a 100 TB scan would pay.
    */
  def fitAuto(calib: DataFrame, scoreCol: String, labelCol: String,
      isotonicMinRows: Long = 1000L): Calibrator = {
    val boundedRows = calib.limit(isotonicMinRows.toInt + 1).count()
    if (boundedRows > isotonicMinRows) IsotonicCalibrator(fitIsotonic(calib, scoreCol, labelCol))
    else SigmoidCalibrator(fitSigmoid(calib, scoreCol, labelCol))
  }

  /** Persist a fitted calibrator (method marker + MLlib model) — the
    * tuned decision threshold lives on the calibrated scale, so the
    * map must ship with the champion it calibrates.
    */
  def save(cal: Calibrator, path: String): Unit = cal match {
    case IsotonicCalibrator(m) => m.write.overwrite().save(s"$path/isotonic")
    case SigmoidCalibrator(m)  => m.write.overwrite().save(s"$path/sigmoid")
    case CvCalibrator(folds) =>
      folds.zipWithIndex.foreach { case (c, i) => save(c, s"$path/cv/$i") }
  }

  /** Load a calibrator persisted by [[save]] (method inferred from the
    * on-disk layout).
    */
  def load(path: String): Calibrator = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    def exists(p: String) = fs.exists(new org.apache.hadoop.fs.Path(p))
    if (exists(s"$path/cv")) {
      val folds = Iterator.from(0).takeWhile(i => exists(s"$path/cv/$i"))
        .map(i => load(s"$path/cv/$i")).toSeq
      CvCalibrator(folds)
    } else if (exists(s"$path/isotonic"))
      IsotonicCalibrator(IsotonicRegressionModel.load(s"$path/isotonic"))
    else
      SigmoidCalibrator(LogisticRegressionModel.load(s"$path/sigmoid"))
  }

  /** Tune the decision threshold by F-beta on a validation frame and
    * return (bestThreshold, sweep) — delegates to Evaluator.
    */
  def tuneThreshold(valid: DataFrame, labelCol: String, scoreCol: String,
      beta: Double = 0.5, grid: Seq[Double] = (1 to 99).map(_ * 0.01)): (Double, DataFrame) = {
    val sweep = Evaluator.thresholdSweep(valid, labelCol, scoreCol, grid, beta)
    val best = sweep.orderBy(col("fbeta").desc, col("threshold").asc)
      .head().getAs[Double]("threshold")
    (best, sweep)
  }
}
