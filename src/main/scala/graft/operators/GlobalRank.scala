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

  /** Append `outCol` = 1-based global row number under the total order
    * `orderCols` (must be a total order — include a unique tiebreak).
    */
  def withGlobalRowNumber(df: DataFrame, orderCols: Seq[Column], outCol: String): DataFrame = {
    // persist is REQUIRED for correctness, not just speed: range bounds
    // come from sampling, so an unpersisted recompute could repartition
    // differently than the run the offsets were counted from
    val ranged = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-partition counts → cumulative offsets (driver-side, O(partitions))
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
    ranged
      .withColumn(outCol, row_number().over(w).cast("long") + offsetExpr)
      .drop("__pid")
  }
}
