package graft.ml

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.regression.{IsotonicRegression, IsotonicRegressionModel}
import org.apache.spark.sql.{DataFrame}
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
