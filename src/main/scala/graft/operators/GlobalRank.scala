package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed global row numbering.
  *
  * `Window.orderBy(...)` with no partition key collapses the data to a
  * single partition (Spark even warns) — fine at test SF, fatal at
  * 100 TB. This is the scalable equivalent: range-repartition on the
  * order key, sort within partitions, then add each partition's global
  * offset (computed from per-partition counts — one tiny job) to the
  * local row index. Identical output to `row_number().over(orderBy)`
  * for a total order, with no single-machine bottleneck.
  */
object GlobalRank {

  /** A globally row-numbered frame plus its cache handle.
    *
    * @param df      input columns + the rank column (1-based long)
    * @param total   total row count (free — summed from the per-partition counts)
    * @param release unpersists the backing cache; call it once every
    *                downstream result of `df` is materialized. Using
    *                `df` after `release()` is incorrect (the ranks came
    *                from a sampled range partitioning that a recompute
    *                would not reproduce).
    */
  final case class Ranked(df: DataFrame, total: Long, release: () => Unit)

  /** Append `outCol` = 1-based global row number under the total order
    * `orderCols` (must be a total order — include a unique tiebreak).
    *
    * The returned [[Ranked.release]] MUST be invoked after the caller
    * materializes its result — the backing persist is required for
    * correctness (range bounds come from sampling, so an unpersisted
    * recompute could repartition differently than the run the offsets
    * were counted from), and without release it would live for the
    * whole session.
    */
  def withGlobalRowNumber(df: DataFrame, orderCols: Seq[Column], outCol: String): Ranked = {
    val ranged = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-partition counts → cumulative offsets (driver-side, O(partitions));
    // this collect also materializes the cache
    val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
      .init.map(_._2)
    val offsetByPid = counts.map(_._1).zip(offsets).toMap
    val offsetExpr = offsetByPid.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(col("__pid") === pid, lit(off)).otherwise(acc)
    }
    // local index within the (already sorted) partition
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(orderCols: _*)
    val out = ranged
      .withColumn(outCol, row_number().over(w).cast("long") + offsetExpr)
      .drop("__pid")
    Ranked(out, counts.map(_._2).sum, () => { ranged.unpersist(); () })
  }

  /** Distributed inclusive prefix sums over a total order — the same
    * range-partition + per-partition-offset trick as
    * [[withGlobalRowNumber]], generalized from counts to arbitrary sums.
    * For each `(outCol, valueExpr)` the result carries the running sum
    * of `valueExpr` (nulls count as 0) over `orderCols`, computed with
    * no single-partition window: one tiny job collects O(partitions ×
    * columns) partial sums, the rest is partition-local.
    *
    * This is the scalable backbone of CDF-shaped metrics (KS statistic,
    * PR/cumulative-gain curves): `Window.orderBy(...)` without a
    * partition key would serialize 100 TB through one task.
    *
    * Caller must invoke [[Ranked.release]] (same contract — the sampled
    * range partitioning must not be recomputed).
    */
  def withPrefixSums(df: DataFrame, orderCols: Seq[Column],
      sums: Seq[(String, Column)]): Ranked = {
    val valCols = sums.map { case (name, e) => coalesce(e.cast("double"), lit(0.0)).as(s"__v_$name") }
    val ranged = df.select((df.columns.map(col) ++ valCols): _*)
      .repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val aggs = count(lit(1)).as("__n") +: sums.map { case (name, _) =>
      sum(col(s"__v_$name")).as(s"__s_$name") }
    val partRows = ranged.groupBy(col("__pid")).agg(aggs.head, aggs.tail: _*)
      .collect().sortBy(_.getInt(0))
    val total = partRows.map(_.getAs[Long]("__n")).sum
    // exclusive scan per column → per-pid offset literals
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val withCums = sums.foldLeft(ranged) { case (acc, (name, _)) =>
      val partials = partRows.map(r => (r.getInt(0), r.getAs[Double](s"__s_$name")))
      val offsets = partials.scanLeft((0, 0.0)) { case ((_, a), (pid, s)) => (pid, a + s) }
        .init.map(_._2)
      val offsetExpr = partials.map(_._1).zip(offsets).foldLeft(lit(0.0)) {
        case (e, (pid, off)) => when(col("__pid") === pid, lit(off)).otherwise(e)
      }
      acc.withColumn(name, sum(col(s"__v_$name")).over(w) + offsetExpr)
    }
    val out = withCums.drop("__pid").drop(sums.map { case (n, _) => s"__v_$n" }: _*)
    Ranked(out, total, () => { ranged.unpersist(); () })
  }
}
