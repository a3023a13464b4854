package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Distributed global row numbering.
  *
  * `Window.orderBy(...)` with no partition key collapses the data to a
  * single partition (Spark even warns) — fine at test SF, fatal at
  * 100 TB. This is the scalable equivalent: range-repartition on the
  * order key, sort within partitions, then add each partition's global
  * offset (computed from per-partition counts — one tiny job) to the
  * local row index. Identical output to `row_number().over(orderBy)`
  * for a total order, with no single-machine bottleneck.
  *
  * The per-partition offsets join in via a BROADCAST of a tiny
  * (partition, offset) frame — not a `when(pid === …)` CASE chain,
  * whose expression depth grows with the partition count and falls out
  * of codegen at the 10k-partition shuffles this file targets.
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

  // monotonically_increasing_id() encodes (partitionId << 33) + local
  // row index, assigned in partition iteration order — i.e. the sorted
  // order after sortWithinPartitions. Decoding it gives both the
  // partition id and a consecutive 0-based local index with NO window
  // (and so no extra hash shuffle) at all. Partitions must stay under
  // 2^33 rows — 8.5 billion, far above any sane partition size.
  private val MidShift = 33
  private val MidMask = (1L << MidShift) - 1L

  /** Explicit width for this file's range exchanges, sized from the
    * INPUT instead of inherited from the session's AQE start width.
    *
    * Why not just `repartitionByRange(cols…)` (= AQE's
    * `initialPartitionNum`)? That start width is tuned for ONE-SHOT
    * hash shuffles: start wide (1024), let AQE coalesce from runtime
    * sizes. A range exchange is different in two ways that made that
    * inheritance a measured 2× regression on the whole quantile/rank
    * family at sf0.1 (r10 driver bench; experiment-confirmed by
    * re-running six of the family at width 32 → 17.1 s → 10.0 s):
    * (1) range partitioning SAMPLES the child per exchange, paying a
    * job whose task count is the start width, and (2) every operator
    * here runs SEVERAL jobs over the same exchange (counts job, fetch
    * job), so a 1024-task barrier is paid per job on what is often a
    * few MB. AQE cannot help: it only coalesces the reducer side, not
    * the sampling pass, and the multi-job reuse means the cost repeats.
    *
    * So: size the exchange once, from Catalyst's size estimate of the
    * exact frame being exchanged —
    * `max(defaultParallelism, 4 × estBytes / advisoryPartitionSize)`,
    * capped at the AQE start width. The ×4 covers parquet-compressed
    * scan estimates expanding into uncompressed sort rows. Small
    * inputs get cluster-parallelism width (no 1024-task barriers);
    * big inputs grow linearly up to the same width a hash shuffle
    * would start at (this is what keeps the sf10 spill-cascade fix:
    * per-partition sort volume stays ≈ advisory/4 regardless of SF).
    */
  private[graft] def rangeWidth(df: DataFrame): Int = {
    val spark = df.sparkSession
    val advisory = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")).max(1L)
    val cap = spark.conf
      .get("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "1024").toInt
    val floor = spark.sparkContext.defaultParallelism
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    (est * 4 / advisory).max(BigInt(floor)).min(BigInt(cap.max(floor))).toInt
  }

  /** Append `outCol` = 1-based global row number under the total order
    * `orderCols` (must be a total order — include a unique tiebreak).
    *
    * The returned [[Ranked.release]] MUST be invoked after the caller
    * materializes its result — the backing persist is required for
    * correctness (range bounds come from sampling and the row ids are
    * assigned non-deterministically at materialization, so an
    * unpersisted recompute could disagree with the run the offsets were
    * counted from), and without release it would live for the whole
    * session.
    */
  def withGlobalRowNumber(df: DataFrame, orderCols: Seq[Column], outCol: String): Ranked = {
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(rangeWidth(df), orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-partition counts → cumulative offsets (driver-side, O(partitions));
    // this collect also materializes the cache
    val counts = ranged.groupBy(shiftright(col("__mid"), MidShift).as("__pid"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0L, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
      .init.map(_._2)
    val offRows: java.util.List[Row] =
      counts.map(_._1).zip(offsets).map { case (pid, off) => Row(pid, off) }.toList.asJava
    val offDf = spark.createDataFrame(offRows,
      StructType(Seq(StructField("__pid", LongType), StructField("__off", LongType))))
    val out = ranged
      .withColumn("__pid", shiftright(col("__mid"), MidShift))
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn(outCol, col("__mid").bitwiseAND(lit(MidMask)) + col("__off") + lit(1L))
      .drop("__pid", "__mid", "__off")
    Ranked(out, counts.map(_._2).sum, () => { ranged.unpersist(); () })
  }

  /** Exact linear-interpolation quantiles (pandas `quantile` / DuckDB
    * `quantile_cont` / Spark `percentile` semantics), computed
    * distributively. Spark's exact `percentile` is an
    * ImperativeAggregate that buffers EVERY value in one aggregation
    * buffer — a single-executor OOM at 100 TB. Here the column is
    * range-partitioned + sorted (the [[withGlobalRowNumber]] backbone),
    * and only the O(#probs) order statistics the interpolation needs
    * are fetched: a tiny per-partition-counts job plus one filtered
    * scan of the cached sorted frame. No single-node buffer anywhere.
    *
    * Null values are excluded (matching `percentile`/`quantile_cont`).
    * Returns NaN per prob on an empty column.
    */
  def exactQuantiles(df: DataFrame, valueCol: Column, probs: Seq[Double]): Array[Double] = {
    require(probs.forall(p => p >= 0.0 && p <= 1.0), s"probs out of [0,1]: $probs")
    val cleaned = df.select(valueCol.cast("double").as("__v")).filter(col("__v").isNotNull)
    val ranked = withGlobalRowNumber(cleaned, Seq(col("__v")), "__r")
    try {
      val n = ranked.total
      if (n == 0L) probs.map(_ => Double.NaN).toArray
      else {
        // 0-based fractional target rank per prob, in EXACT decimal
        // arithmetic: p * (n-1) as a Double loses integer precision
        // past 2^53 rows, silently shifting which order statistic an
        // "exact" quantile reads (same trap liftGains guards with
        // integer ceil-div)
        val targets = probs.map(p => (BigDecimal(p) * BigDecimal(n - 1), p))
        def floorRank(t: BigDecimal): Long = t.setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
        def ceilRank(t: BigDecimal): Long = t.setScale(0, BigDecimal.RoundingMode.CEILING).toLong
        val neededRanks = targets
          .flatMap { case (t, _) => Seq(floorRank(t) + 1L, ceilRank(t) + 1L) }
          .distinct
        val stats = ranked.df.filter(col("__r").isin(neededRanks: _*))
          .select(col("__r"), col("__v"))
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        targets.map { case (t, _) =>
          val lo = floorRank(t)
          val hi = ceilRank(t)
          val vLo = stats(lo + 1L)
          if (hi == lo) vLo else vLo + (t - lo).toDouble * (stats(hi + 1L) - vLo)
        }.toArray
      }
    } finally ranked.release()
  }

  /** Exact per-group linear-interpolation quantiles (pandas
    * `groupby().quantile()` / DuckDB `quantile_cont` semantics): one
    * hash shuffle on the group key, a per-group window sort, and a
    * per-row interpolation-weight expression — each row contributes to
    * a probe only if its 0-based in-group rank is the floor or ceil of
    * that probe's fractional target rank, so the final aggregate sums
    * at most 2 weighted values per (group, probe). No per-group value
    * buffer anywhere.
    *
    * SCALE BOUNDARY: the per-group window sort puts each group on ONE
    * reducer — right when groups are many and individually
    * reducer-sized (the common segment/tenant/key case). For a
    * LOW-cardinality group key over huge data (3 return flags × 100 TB)
    * that reducer sort is the bottleneck: loop [[exactQuantiles]] over
    * the group values instead (each run range-partitions WITHIN the
    * group), or fall back to approx_percentile per group.
    *
    * Nulls AND NaN values are excluded per group (pandas
    * `groupby().quantile()` skips NaN; under Spark ordering a NaN
    * sorts last and would poison any probe whose floor/ceil rank
    * touches it). A group with a single value returns that value for
    * every probe; a group with no valid values is dropped.
    */
  def groupQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      probs: Seq[(String, Double)]): DataFrame = {
    require(probs.nonEmpty && probs.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"probs must be named and in [0,1]: $probs")
    val gcols = groupCols.map(col)
    val base = df.select(gcols :+ valueCol.cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull && !isnan(col("__v")))
    val wOrd = Window.partitionBy(gcols: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(gcols: _*)
    val ranked = base
      .withColumn("__k", row_number().over(wOrd).cast("long") - 1L)
      .withColumn("__n", count(lit(1)).over(wAll))
    val aggs = probs.map { case (name, p) =>
      val t = (col("__n") - 1L).cast("double") * lit(p)
      val lo = floor(t)
      val hi = ceil(t)
      val frac = t - lo
      sum(
        when(col("__k") === lo && lo === hi, col("__v"))
          .when(col("__k") === lo, col("__v") * (lit(1.0) - frac))
          .when(col("__k") === hi, col("__v") * frac)
          .otherwise(lit(0.0))).as(name)
    }
    ranked.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The LOW-cardinality companion of [[groupQuantiles]]: ONE
    * distributed sort on the COMPOSITE key (group, value), then every
    * group's order statistics are read out of the same sorted frame.
    * Because the range partitioner keys on (group, value), a giant
    * group is split across as many partitions as its values span: no
    * group ever sits on one reducer (groupQuantiles' scale boundary),
    * and no per-group job loop is needed (an earlier revision ran one
    * quantile pass per group — maxGroups job chains; this is one).
    *
    * Job shape — TWO actions over the sorted cache (plus the range
    * partitioner's sampling pass): one stats job aggregating rows per
    * (partition, group) SEGMENT — segments are contiguous runs of a
    * group within a partition, ≤ partitions + groups of them in total —
    * from which the driver derives both the per-partition rank offsets
    * AND every group's (size, first-rank) in the same collect (an
    * earlier revision ran a second whole-frame pass for the group
    * stats); then one fetch job for the O(groups × probs) boundary
    * ranks, with ranks reconstructed per row from a broadcast of the
    * O(segments) offset frame.
    *
    * Same linear-interpolation semantics AND the same key set as
    * groupQuantiles on any input: groups are derived from the
    * null/NaN-filtered value rows, so a group with no valid value is
    * dropped on both paths (not emitted as NaN), and null group keys
    * are skipped. Value ties make the row numbering within a group
    * non-unique in order but not in value — the k-th smallest value of
    * a group is well-defined regardless of tie order, which is all the
    * interpolation reads.
    *
    * The result frame is built driver-side with 1 partition — by
    * contract it holds ≤ `maxGroups` (64) rows.
    */
  def exactQuantilesByGroup(df: DataFrame, groupCol: String, valueCol: Column,
      probs: Seq[(String, Double)], maxGroups: Int = 64): DataFrame = {
    require(probs.nonEmpty && probs.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"probs must be named and in [0,1]: $probs")
    val spark = df.sparkSession
    val vals = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"), valueCol.cast("double").as("__v"))
      .filter(col("__v").isNotNull && !isnan(col("__v")))
    val ranged = vals.repartitionByRange(rangeWidth(vals), col("__g"), col("__v"))
      .sortWithinPartitions(col("__g"), col("__v"))
      .withColumn("__mid", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE stats job: (partition, group) segment sizes + first row id.
      // Sorting segments by __minmid IS the global (partition, local
      // position) order, so a running sum of segment sizes in that
      // order yields each segment's global start rank.
      val segs = ranged.groupBy(shiftright(col("__mid"), MidShift).as("__pid"), col("__g"))
        .agg(count(lit(1)).as("__n"), min(col("__mid")).as("__minmid"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._4)
      var acc = 0L
      val segOffsets = segs.map { case (pid, g, n, minmid) =>
        val off = acc; acc += n; (pid, g, n, off, minmid)
      }
      // per-group totals + first global rank (1-based), in group order
      val gstats = segOffsets.groupBy(_._2).map { case (g, ss) =>
        (g, ss.map(_._3).sum, ss.map(_._4).min + 1L)
      }.toArray.sortBy(_._1)
      require(gstats.length <= maxGroups,
        s"${gstats.length} groups > maxGroups=$maxGroups — this path collects O(groups) " +
          "stats on the driver; use groupQuantiles for high-cardinality keys")
      // exact decimal target ranks (same >2^53 guard as exactQuantiles)
      def floorR(t: BigDecimal): Long = t.setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
      def ceilR(t: BigDecimal): Long = t.setScale(0, BigDecimal.RoundingMode.CEILING).toLong
      val needed = gstats.toSeq.flatMap { case (_, n, start) =>
        probs.flatMap { case (_, p) =>
          val t = BigDecimal(p) * BigDecimal(n - 1)
          Seq(start + floorR(t), start + ceilR(t))
        }
      }.distinct
      // rank per row = segment's global offset + (local id − segment's
      // first local id) + 1, via a broadcast of the O(segments) frame
      val offRows: java.util.List[Row] = segOffsets
        .map { case (pid, g, _, off, minmid) => Row(pid, g, off, minmid) }.toList.asJava
      val offDf = spark.createDataFrame(offRows, StructType(Seq(
        StructField("__pid", LongType), StructField("__g", org.apache.spark.sql.types.StringType),
        StructField("__off", LongType), StructField("__minmid", LongType))))
      val fetched = ranged
        .withColumn("__pid", shiftright(col("__mid"), MidShift))
        .join(broadcast(offDf), Seq("__pid", "__g"))
        .withColumn("__r",
          col("__off") + (col("__mid").bitwiseAND(lit(MidMask)) -
            col("__minmid").bitwiseAND(lit(MidMask))) + lit(1L))
        .filter(col("__r").isin(needed: _*))
        .select(col("__r"), col("__v"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val rows = gstats.map { case (g, n, start) =>
        val qs = probs.map { case (_, p) =>
          val t = BigDecimal(p) * BigDecimal(n - 1)
          val lo = floorR(t)
          val hi = ceilR(t)
          val vLo = fetched(start + lo)
          if (hi == lo) vLo else vLo + (t - lo).toDouble * (fetched(start + hi) - vLo)
        }
        Row.fromSeq(g +: qs)
      }
      val schema = StructType(
        StructField(groupCol, org.apache.spark.sql.types.StringType, nullable = false) +:
          probs.map { case (name, _) => StructField(name, DoubleType, nullable = false) })
      // a LocalRelation (not parallelize→LogicalRDD): an RDD-backed frame
      // carries defaultSizeInBytes = Long.MaxValue, and the bytes-PRODUCT
      // join estimator then inflates any join against this ≤64-row frame
      // to ~1e24 bytes — which pushed downstream [[rangeWidth]] calls to
      // the 1024 cap (measured: q_outlier_mad's MAD fit re-widened to
      // 1024 after the join with its median frame). Local data should
      // carry its real, tiny size.
      spark.createDataFrame(rows.toList.asJava, schema)
    } finally { ranged.unpersist(); () }
  }

  /** Exact linear-interpolation quantiles for SEVERAL columns in ONE
    * composite-key sort: the columns are melted to (column-name, value)
    * pairs — a codegen'd generate, no shuffle — and routed through
    * [[exactQuantilesByGroup]] with the column name as the group key.
    * Replaces one [[exactQuantiles]] job chain PER COLUMN (a fit over k
    * features = k range-sort passes) with a single pass whose sorted
    * volume is the same k × rows of narrow (name, double) pairs but
    * whose scheduling cost is one job chain; the melted pairs also
    * range-partition by (name, value), so each column's run of the sort
    * spreads over partitions exactly as its standalone sort would.
    *
    * NaN handling follows the grouped path (pandas / sklearn-fit
    * semantics): null AND NaN are excluded per column — for a fit, NaN
    * IS the missing value, so it must not poison the order statistics.
    * A column with no valid values maps to NaN per prob (same contract
    * as [[exactQuantiles]] on an empty column).
    */
  def exactQuantilesPerColumn(df: DataFrame, cols: Seq[String],
      probs: Seq[Double]): Map[String, Array[Double]] = {
    require(cols.nonEmpty, "cols must be non-empty")
    val pairs = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("__g"), col(c).cast("double").as("__v"))): _*)).as("__p"))
      .select(col("__p.__g").as("__g"), col("__p.__v").as("__v"))
    val named = probs.zipWithIndex.map { case (p, i) => s"__q$i" -> p }
    val byCol = exactQuantilesByGroup(pairs, "__g", col("__v"), named,
      maxGroups = cols.length)
      .collect()
      .map(r => r.getString(0) -> probs.indices.map(i => r.getDouble(i + 1)).toArray)
      .toMap
    cols.map(c => c -> byCol.getOrElse(c, probs.map(_ => Double.NaN).toArray)).toMap
  }

  /** ONE grouped-quantile entry point: probes the group-key cardinality
    * EXACTLY — `distinct().limit(lowCardMax + 1).count()` — and routes
    * to the shape that scales for it: ≤ lowCardMax groups →
    * [[exactQuantilesByGroup]] (one composite-key (group, value) sort —
    * few giant groups, each split across partitions), more →
    * [[groupQuantiles]] (one hash shuffle + per-group window — many
    * reducer-sized groups; the documented "SCALE BOUNDARY" above). The probe is one narrow job at any input
    * size: the partial (map-side) distinct collapses each task to at
    * most the true key count, and the global limit stops at
    * lowCardMax + 1 keys. An HLL estimate (approx_count_distinct)
    * would be cheaper by a constant but mis-routes near the boundary —
    * a ~5%-rsd underestimate of a just-over-cap cardinality routes to
    * exactQuantilesByGroup, whose `require` then throws on valid
    * input. The exact probe has no such window: the exact path's group
    * set (derived after null/NaN value filtering, string-cast) is a
    * subset of the probed key set, so probe ≤ lowCardMax guarantees
    * the cap holds.
    *
    * Output schema is identical on both routes (group key cast to
    * string, null group keys dropped, null/NaN values excluded per
    * group); spec-asserted equal on both sides of the boundary and at
    * the exact boundary cardinality (FeatureEvalSpec
    * "quantilesByGroup").
    */
  def quantilesByGroup(df: DataFrame, groupCol: String, valueCol: Column,
      probs: Seq[(String, Double)], lowCardMax: Int = 64): DataFrame = {
    val nGroups = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol)).distinct().limit(lowCardMax + 1).count()
    if (nGroups <= lowCardMax)
      exactQuantilesByGroup(df, groupCol, valueCol, probs, lowCardMax)
    else
      groupQuantiles(df.filter(col(groupCol).isNotNull), Seq(groupCol), valueCol, probs)
        .withColumn(groupCol, col(groupCol).cast("string"))
  }

  /** Distributed inclusive prefix sums over a total order — the same
    * range-partition + per-partition-offset trick as
    * [[withGlobalRowNumber]], generalized from counts to arbitrary sums.
    * For each `(outCol, valueExpr)` the result carries the running sum
    * of `valueExpr` (nulls count as 0) over `orderCols`, computed with
    * no single-partition window: one tiny job collects O(partitions ×
    * columns) partial sums, the rest is partition-local (the running
    * sum is a per-partition window — one key per partition, so every
    * reducer gets exactly one partition's rows).
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
    val spark = df.sparkSession
    val valCols = sums.map { case (name, e) => coalesce(e.cast("double"), lit(0.0)).as(s"__v_$name") }
    val selected = df.select((df.columns.map(col).toIndexedSeq ++ valCols): _*)
    val ranged = selected
      .repartitionByRange(rangeWidth(selected), orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val aggs = count(lit(1)).as("__n") +: sums.map { case (name, _) =>
      sum(col(s"__v_$name")).as(s"__s_$name") }
    val partRows = ranged.groupBy(col("__pid")).agg(aggs.head, aggs.tail: _*)
      .collect().sortBy(_.getInt(0))
    val total = partRows.map(_.getAs[Long]("__n")).sum
    // exclusive scan per column → ONE tiny (pid, offsets…) frame, broadcast
    val offsetsPerCol: Seq[(String, Array[Double])] = sums.map { case (name, _) =>
      name -> partRows.map(_.getAs[Double](s"__s_$name")).scanLeft(0.0)(_ + _).init
    }
    val offRows: java.util.List[Row] = partRows.map(_.getInt(0)).zipWithIndex.map { case (pid, i) =>
      Row.fromSeq(pid +: offsetsPerCol.map { case (_, offs) => offs(i) })
    }.toList.asJava
    val offSchema = StructType(
      StructField("__pid", org.apache.spark.sql.types.IntegerType) +:
        sums.map { case (name, _) => StructField(s"__off_$name", DoubleType) })
    val offDf = spark.createDataFrame(offRows, offSchema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val withCums = sums.foldLeft(ranged.join(broadcast(offDf), Seq("__pid"))) {
      case (acc, (name, _)) =>
        acc.withColumn(name, sum(col(s"__v_$name")).over(w) + col(s"__off_$name"))
    }
    val out = withCums.drop("__pid")
      .drop(sums.map { case (n, _) => s"__v_$n" }: _*)
      .drop(sums.map { case (n, _) => s"__off_$n" }: _*)
    Ranked(out, total, () => { ranged.unpersist(); () })
  }
}
