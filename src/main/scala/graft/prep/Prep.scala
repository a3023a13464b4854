package graft.prep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Preprocessing operators, Spark-first re-expression of the reference's
  * `DataPreprocessor` / `DataTransformer`
  * (reference: src/feature/utils/prep.py:308-705).
  *
  * Every op is a narrow/declarative `DataFrame => DataFrame` so Catalyst
  * keeps pushdown + whole-stage codegen; nothing here shuffles except
  * the explicitly keyed ops (dedup, audits), which are single-shuffle
  * hash aggregations / windows over the key — the shape that scales to
  * 1000 executors.
  */
object Prep {

  /** Missing-value tokens treated as NULL
    * (reference: src/feature/utils/prep.py:425-445 replace_common_missing_values).
    */
  val MissingTokens: Seq[String] = Seq("", "<NA>", "null", "?", "N/A", "NAN", "nan")

  /** Blank/whitespace-only strings and common missing tokens → NULL
    * (reference: src/feature/utils/prep.py:414-445). Pure projection:
    * stays inside whole-stage codegen, no shuffle.
    */
  def normalizeMissing(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, normalizeMissingCol(col(c)))
    }

  /** Column-level missing normalization (usable in any projection). */
  def normalizeMissingCol(c: Column): Column =
    when(trim(c) === "" || c.isin(MissingTokens: _*), lit(null)).otherwise(c)

  /** Dedupe by key keeping the "latest" row per key — the distributed,
    * deterministic analog of pandas `drop_duplicates(keep="last")`
    * (reference: src/feature/utils/prep.py:474-498). `orderCols` must
    * be a total order within a key (include a unique tiebreaker).
    * Single shuffle on the key; window + filter, no sort of the full
    * dataset.
    */
  def dedupByKeyKeepLatest(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Per-key duplicate audit: keys occurring more than once with their
    * multiplicity (reference: src/feature/utils/prep.py:447-472
    * check_duplicate_rows — we return the offending keys instead of
    * raising, which is the useful shape at scale).
    */
  def duplicateKeyAudit(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Per-column NULL-fraction profile with a drop flag at `threshold`
    * (reference: src/feature/utils/prep.py:558-608
    * identify_cols_with_high_nans). One aggregation pass over the data
    * (O(cols) output rows), then a tiny local explode to rows.
    */
  def nullFractionProfile(df: DataFrame, cols: Seq[String], threshold: Double): DataFrame = {
    val aggs = cols.map(c => round(avg(when(col(c).isNull, 1.0).otherwise(0.0)), 4).as(c))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map(c => s"'$c', `$c`").mkString(", ")
    wide
      .selectExpr(s"stack(${cols.size}, $stackExpr) as (column_name, null_frac)")
      .withColumn("drop_flag", (col("null_frac") >= threshold).cast("int"))
  }

  /** Cast columns to target types (reference: src/feature/utils/prep.py:500-556
    * specify_data_types). Pure projection.
    */
  def castColumns(df: DataFrame, casts: Map[String, DataType]): DataFrame =
    casts.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) }

  /** Map categorical values to expressive names, keeping unmapped values
    * (reference: src/feature/utils/prep.py:669-684 map_categorical_features).
    * Implemented as a CASE chain — codegen-friendly, no lookup join
    * needed for small mapping dictionaries.
    */
  def mapValues(c: Column, mapping: Seq[(String, String)]): Column = {
    require(mapping.nonEmpty, "mapping must be non-empty")
    val init = when(c === mapping.head._1, lit(mapping.head._2))
    mapping.tail
      .foldLeft(init)((acc, kv) => acc.when(c === kv._1, lit(kv._2)))
      .otherwise(c)
  }

  /** Class distribution: counts and percentage per label
    * (reference: src/feature/utils/prep.py:135-145 _log_class_distribution).
    * groupBy + single scalar subquery-free total via window over the
    * tiny aggregated result (k rows), not over the data.
    */
  def classDistribution(df: DataFrame, classCol: String): DataFrame = {
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy()
    counts
      .withColumn("pct", round(lit(100.0) * col("n") / sum(col("n")).over(w), 2))
      .select(col(classCol), col("n"), col("pct"))
  }
}
