package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join — the semantic behind the reference's
  * Feast `get_historical_features` retrieval (reference:
  * src/feature/README.md feature-store workflow; training rows are
  * joined to the latest feature values at or before each row's event
  * timestamp to avoid leakage).
  *
  * Implementation is the union+window form: tag both sides, sort
  * within each key by (ts, side, tiebreak), and carry the last
  * non-null right-side values forward. ONE shuffle on the key and
  * linear per-key state — the scalable shape. The naive alternative
  * (theta-join on key + ts≤ts then rank) materializes O(|L|·|R|/keys)
  * intermediate pairs and dies at 100 TB.
  */
object AsofJoin {

  /** For each left row, attach the latest right row's `valueCols`
    * where right.tsCol <= left.tsCol within the same `keyCol`
    * (ties at equal ts: right sorts before left, so it is visible;
    * among equal right timestamps the largest `tieBreakCol` wins).
    *
    * Both inputs must share `keyCol`, `tsCol`, `tieBreakCol` names.
    * Left columns are preserved; right `valueCols` are appended
    * (null when no right row precedes).
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, tieBreakCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val taggedLeft = valueCols.foldLeft(left.withColumn("__side", lit(1))) {
      (d, v) => d.withColumn(s"__v_$v", lit(null))
    }
    val taggedRight = {
      val base = right.select(
        (Seq(col(keyCol), col(tsCol), col(tieBreakCol), lit(0).as("__side")) ++
          valueCols.map(v => col(v).as(s"__v_$v"))): _*)
      // align schemas: left-only columns become nulls on the right side
      leftCols.filterNot(Seq(keyCol, tsCol, tieBreakCol).contains)
        .foldLeft(base)((d, c) => d.withColumn(c, lit(null)))
    }
    val unioned = taggedLeft.select(
      (leftCols.map(col) :+ col("__side")) ++ valueCols.map(v => col(s"__v_$v")): _*)
      .unionByName(taggedRight.select(
        (leftCols.map(col) :+ col("__side")) ++ valueCols.map(v => col(s"__v_$v")): _*))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col(tieBreakCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (d, v) =>
      d.withColumn(s"asof_$v", last(col(s"__v_$v"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(v => col(s"asof_$v")): _*)
  }
}
