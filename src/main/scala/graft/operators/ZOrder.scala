package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data clustering via Morton (Z-order) codes — the
  * standard 100 TB layout technique for making parquet min/max
  * statistics prune MULTI-column predicates: bucketize each clustering
  * column into rank space, interleave the bucket bits into one integer,
  * and range-partition + sort the write by it. Every output file then
  * covers a compact hyper-rectangle in (col1, col2, …) space, so a scan
  * filtering on ANY subset of the clustered columns skips most files —
  * unlike a plain `sortWithinPartitions(col1)`, which only prunes the
  * leading column.
  *
  * All of it is shift/and/or column algebra (whole-stage codegen, no
  * UDF); the only driver-side state is the O(2^bits) quantile edges per
  * column — never data-proportional.
  *
  * Reference context: the reference engine (Adeemy/end-to-end-ml,
  * src/feature/prep_data.py) writes flat parquet snapshots; at its
  * scale layout is irrelevant, but a 100 TB feature snapshot read by
  * time+entity-range queries needs exactly this.
  */
object ZOrder {

  /** Interleave the low `bits` bits of already-bucketized non-negative
    * integer columns into a Morton code: bit b of dimension i lands at
    * position b*dims + i. Bijective on [0, 2^bits)^dims, pure column
    * algebra.
    */
  def zvalue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.size <= 62,
      s"need 1+ cols and bits*dims <= 62, got ${cols.size} cols x $bits bits")
    val dims = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * dims + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Rank-space bucket of `c` against fitted quantile `edges`: the
    * count of edges <= c — a literal-array higher-order filter, O(2^bits)
    * per row with no UDF and no shuffle. NULLs land in bucket 0.
    */
  def bucketOf(c: Column, edges: Array[Double]): Column = {
    val cd = c.cast("double")
    size(filter(typedLit(edges.toSeq), e => e <= cd && cd.isNotNull)).cast("long")
  }

  /** Cluster `df` for writing: fit per-column quantile edges (rank-space
    * bucketing — skew in any column costs nothing because buckets are
    * equi-DEPTH, not equi-width), compute the Morton code, and
    * range-repartition into `numFiles` + sort within partitions by it.
    * The caller writes the result; each file's min/max stats for every
    * clustered column then span ~1/2^(bits/dims') of its range.
    *
    * Cost: one pass for the quantile sketch (approxQuantile, relErr
    * 0.001) + one range-exchange (itself one sample pass + shuffle) —
    * the accepted price of a layout op that every subsequent scan
    * amortizes.
    */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int = 6, numFiles: Int = 32): DataFrame = {
    val nb = 1 << bits
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    val edges = df.stat.approxQuantile(cols.toArray, probs, 0.001)
    val buckets = cols.zip(edges).map { case (c, e) => bucketOf(col(c), e) }
    df.withColumn("__z", zvalue(buckets, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
