package graft.split

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset splitting strategies, Spark-first re-expression of the
  * reference's SplitStrategy family
  * (reference: src/feature/utils/prep.py:33-305, src/training/split_data.py).
  *
  * At 100 TB a split must be (a) a pure filter — so it composes with
  * pushdown and never materializes both halves, and (b) deterministic —
  * so train/test assignment is reproducible without storing row ids.
  */
object Splits {

  /** Time-based split: rows strictly before `cutoff` are train
    * (reference: src/feature/utils/prep.py:227-305 TimeBasedSplitStrategy).
    */
  def timeSplit(df: DataFrame, tsCol: String, cutoff: String): (DataFrame, DataFrame) = {
    val c = to_timestamp(lit(cutoff))
    (df.filter(col(tsCol) < c), df.filter(col(tsCol) >= c))
  }

  /** Deterministic key-mod split assignment column: buckets 0..buckets-1.
    * The scale-safe analog of a seeded random split — assignment is a
    * pure function of the key, so it is stable across reruns, engines
    * and cluster sizes (no sampling state to coordinate).
    */
  def keyBucket(keyCol: Column, buckets: Int): Column =
    pmod(keyCol, lit(buckets))

  /** Train/test split by key-mod hash: train gets `trainBuckets` of
    * `buckets` (reference analog: RandomSplitStrategy with
    * train_set_size = trainBuckets/buckets,
    * src/feature/utils/prep.py:148-224).
    */
  def hashSplit(df: DataFrame, keyColName: String, buckets: Int, trainBuckets: Int): (DataFrame, DataFrame) = {
    val b = keyBucket(col(keyColName), buckets)
    (df.filter(b < trainBuckets), df.filter(b >= trainBuckets))
  }

  /** Seeded stratified random split preserving class distribution
    * (reference: src/feature/utils/prep.py:148-224 RandomSplitStrategy,
    * stratify=class). Uses sampleBy per-stratum Bernoulli sampling —
    * one pass, no shuffle; test = anti-join on the primary key.
    */
  def stratifiedRandomSplit(
      df: DataFrame,
      classCol: String,
      pkCol: String,
      trainFraction: Double,
      seed: Long
  ): (DataFrame, DataFrame) = {
    require(trainFraction > 0 && trainFraction < 1, "train fraction must be in (0,1)")
    val classes = df.select(classCol).distinct().collect().map(_.get(0))
    require(classes.length >= 2, s"$classCol must have at least two classes")
    val fractions = classes.map(c => c -> trainFraction).toMap
    val train = df.stat.sampleBy(classCol, fractions, seed)
    val test = df.join(train.select(pkCol), Seq(pkCol), "left_anti")
    (train, test)
  }

  /** Carve a validation (or calibration) set out of train
    * (reference: src/feature/utils/data.py:388-507
    * create_validation_set / create_calibration_set).
    */
  def carveOut(
      train: DataFrame,
      classCol: String,
      pkCol: String,
      keepFraction: Double,
      seed: Long
  ): (DataFrame, DataFrame) =
    stratifiedRandomSplit(train, classCol, pkCol, keepFraction, seed)

  /** Split-disjointness audit by primary key
    * (reference: src/feature/utils/prep.py:112-133 _check_datasets_overlap).
    * Inner join on distinct keys; count>0 means leakage.
    */
  def overlapCount(a: DataFrame, b: DataFrame, pkCol: String): Long =
    a.select(pkCol).distinct().join(b.select(pkCol).distinct(), Seq(pkCol), "inner").count()
}
