package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label encoding + class weighting, the Spark analog of sklearn's
  * LabelEncoder / class_weight="balanced"
  * (reference: src/feature/utils/data.py:564-616 encode_class_labels;
  * class_weight="balanced" in src/config/training-config.yml).
  */
object LabelOps {

  /** Fit a LabelEncoder: sorted distinct labels → dense codes 0..k-1.
    * Collects O(k) labels — safe for any real class column.
    */
  def fitLabelEncoder(df: DataFrame, labelCol: String): Seq[(String, Int)] =
    df.select(col(labelCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.zipWithIndex.toSeq

  /** Encoding expression from a fitted encoder (CASE chain — k is small). */
  def encodeExpr(c: Column, encoder: Seq[(String, Int)]): Column = {
    val init = when(c === encoder.head._1, lit(encoder.head._2.toLong))
    encoder.tail.foldLeft(init)((acc, kv) => acc.when(c === kv._1, lit(kv._2.toLong)))
  }

  /** Inverse transform (code → original label). */
  def decodeExpr(c: Column, encoder: Seq[(String, Int)]): Column = {
    val init = when(c === encoder.head._2, lit(encoder.head._1))
    encoder.tail.foldLeft(init)((acc, kv) => acc.when(c === kv._2, lit(kv._1)))
  }

  /** "Balanced" class weights: n_samples / (n_classes * count_c), as a
    * (label, n, weight) DataFrame. Single groupBy; the window runs over
    * the k-row aggregate, not the data.
    */
  def balancedClassWeights(df: DataFrame, labelCol: String): DataFrame = {
    val counts = df.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy()
    counts
      .withColumn("weight",
        round(sum(col("n")).over(w) / (count(lit(1)).over(w) * col("n")), 4))
      .select(col(labelCol), col("n"), col("weight"))
  }
}
