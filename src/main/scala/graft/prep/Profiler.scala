package graft.prep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the distributed analog of the reference's EDA
  * surface (reference: notebooks/eda.ipynb + notebooks/utils.py:
  * per-column summaries, missingness, cardinality, distributions).
  *
  * One aggregation pass for all columns; approximate distinct counts
  * (HLL) so the profile runs at any scale.
  */
object Profiler {

  /** Per-column profile: type, nulls, null fraction, approx distinct,
    * min/max (as strings for heterogeneous columns). Output is
    * O(columns) rows.
    */
  def profile(df: DataFrame): DataFrame = {
    val total = count(lit(1))
    val aggs = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        approx_count_distinct(c, 0.02).as(s"${f.name}__distinct"),
        min(c).cast("string").as(s"${f.name}__min"),
        max(c).cast("string").as(s"${f.name}__max"))
    } :+ total.as("__total")
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
    val n = row.getAs[Long]("__total")
    val rows = df.schema.fields.map { f =>
      (f.name, f.dataType.simpleString,
        row.getAs[Long](s"${f.name}__nulls"),
        if (n == 0) 0.0 else row.getAs[Long](s"${f.name}__nulls").toDouble / n,
        row.getAs[Long](s"${f.name}__distinct"),
        row.getAs[String](s"${f.name}__min"),
        row.getAs[String](s"${f.name}__max"))
    }
    df.sparkSession.createDataFrame(rows.toSeq)
      .toDF("column", "dtype", "n_nulls", "null_frac", "approx_distinct", "min", "max")
  }

  /** Frequent items per column (Spark's stat sketch). */
  def frequentItems(df: DataFrame, cols: Seq[String], support: Double): DataFrame =
    df.stat.freqItems(cols.toArray, support)
}
