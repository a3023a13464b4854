package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.features._

/** Feature-engineering queries with DuckDB oracle twins (SURVEY.md §2.3).
  * Each exercises the fitted FeaturePipeline / LabelOps library and
  * reduces the transformed output to a small, deterministic summary.
  */
object FeatureQueries {
  import CoreQueries.Q

  /** round to 4dp and normalize -0.0 → 0.0 (both engines). */
  private def r4(c: Column): Column = round(c, 4) + lit(0.0)
  private def r2(c: Column): Column = round(c, 2) + lit(0.0)

  /** Imputation (median / mean / zero / mode) over deterministically
    * dirtied lineitem columns; single-row summary of the imputed data.
    */
  def qImputeMedian(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.lineitem(s, d)
      .withColumn("q_med", when($"l_quantity" < 5, lit(null)).otherwise($"l_quantity"))
      .withColumn("q_mean", $"q_med")
      .withColumn("q_zero", $"q_med")
      .withColumn("flag", when($"l_orderkey" % 5 === 0, lit(null)).otherwise($"l_returnflag"))
    val spec = FeaturePipelineSpec(imputers = Seq(
      ImputerSpec("q_med", Imputation.Median),
      ImputerSpec("q_mean", Imputation.Mean),
      ImputerSpec("q_zero", Imputation.Zero),
      ImputerSpec("flag", Imputation.Mode)))
    val fitted = FeaturePipeline.fit(base, spec)
    val out = fitted.transform(base)
    out.agg(
        count(lit(1)).as("n_rows"),
        sum(when($"l_quantity" < 5, 1L).otherwise(0L)).as("n_null_q"),
        r2(sum($"q_med")).as("sum_q_median"),
        r2(sum($"q_mean")).as("sum_q_mean"),
        r2(sum($"q_zero")).as("sum_q_zero"),
        sum(when($"flag" === fitted.modes("flag"), 1L).otherwise(0L)).as("n_mode_value"))
      .withColumn("median_used", r4(lit(fitted.numStats("q_med").median)))
      .withColumn("mean_used", r4(lit(fitted.numStats("q_mean").mean)))
      .withColumn("mode_used", lit(fitted.modes("flag")))
  }

  val qImputeMedianOracle: String =
    """WITH d AS (
      | SELECT CASE WHEN l_quantity < 5 THEN NULL ELSE l_quantity END AS q,
      |        CASE WHEN l_orderkey % 5 = 0 THEN NULL ELSE l_returnflag END AS f
      | FROM lineitem),
      |st AS (SELECT quantile_cont(q, 0.5) AS med, avg(q) AS mn FROM d),
      |md AS (SELECT f AS mode_v FROM d WHERE f IS NOT NULL
      |       GROUP BY f ORDER BY count(*) DESC, f LIMIT 1)
      |SELECT count(*) AS n_rows,
      | CAST(sum(CASE WHEN q IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_q,
      | round(max(st.med),4) + 0 AS median_used,
      | round(max(st.mn),4) + 0 AS mean_used,
      | max(md.mode_v) AS mode_used,
      | round(sum(coalesce(q, st.med)),2) + 0 AS sum_q_median,
      | round(sum(coalesce(q, st.mn)),2) + 0 AS sum_q_mean,
      | round(sum(coalesce(q, 0)),2) + 0 AS sum_q_zero,
      | CAST(sum(CASE WHEN coalesce(f, md.mode_v) = md.mode_v THEN 1 ELSE 0 END) AS BIGINT) AS n_mode_value
      |FROM d CROSS JOIN st CROSS JOIN md""".stripMargin

  private def scaleQuery(kind: ScalerKind.Value)(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.customer(s, d).withColumn("x", $"c_acctbal")
    val fitted = FeaturePipeline.fit(base, FeaturePipelineSpec(scalers = Seq(ScalerSpec("x", kind))))
    fitted.transform(base)
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n"), r4(avg($"x")).as("avg_scaled"),
        r4(min($"x")).as("min_scaled"), r4(max($"x")).as("max_scaled"))
      .orderBy($"c_nationkey")
  }

  def qScaleStandard(s: SparkSession, d: String): DataFrame = scaleQuery(ScalerKind.Standard)(s, d)
  def qScaleMinMax(s: SparkSession, d: String): DataFrame = scaleQuery(ScalerKind.MinMax)(s, d)
  def qScaleRobust(s: SparkSession, d: String): DataFrame = scaleQuery(ScalerKind.Robust)(s, d)

  private def scaleOracle(exprSql: String, statsSql: String): String =
    s"""WITH s AS ($statsSql)
       |SELECT c_nationkey, count(*) AS n,
       | round(avg($exprSql),4) + 0 AS avg_scaled,
       | round(min($exprSql),4) + 0 AS min_scaled,
       | round(max($exprSql),4) + 0 AS max_scaled
       |FROM customer CROSS JOIN s
       |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  val qScaleStandardOracle: String = scaleOracle(
    "(c_acctbal - s.m) / s.sd",
    "SELECT avg(c_acctbal) AS m, stddev_samp(c_acctbal) AS sd FROM customer")

  val qScaleMinMaxOracle: String = scaleOracle(
    "(c_acctbal - s.lo) / (s.hi - s.lo)",
    "SELECT min(c_acctbal) AS lo, max(c_acctbal) AS hi FROM customer")

  val qScaleRobustOracle: String = scaleOracle(
    "(c_acctbal - s.med) / (s.q3 - s.q1)",
    "SELECT quantile_cont(c_acctbal, 0.25) AS q1, quantile_cont(c_acctbal, 0.5) AS med, quantile_cont(c_acctbal, 0.75) AS q3 FROM customer")

  /** One-hot (sorted categories, drop-first): column-sum fingerprint. */
  def qOneHot(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
    val spec = FeaturePipelineSpec(oneHots = Seq(OneHotSpec("o_orderpriority", dropFirst = true)))
    val fitted = FeaturePipeline.fit(base, spec)
    val out = fitted.transform(base)
    val ohCols = fitted.oneHotColumns(spec.oneHots.head).map(_._1)
    out.agg(count(lit(1)).as("n_rows"),
      ohCols.map(c => sum(col(c)).as(c)): _*)
  }

  val qOneHotOracle: String =
    """SELECT count(*) AS n_rows,
      | CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS o_orderpriority_2_HIGH,
      | CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS o_orderpriority_3_MEDIUM,
      | CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS o_orderpriority_4_NOT_SPECIFIED,
      | CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS o_orderpriority_5_LOW
      |FROM orders""".stripMargin

  /** One-hot with min-frequency grouping: synthetic rare categories
    * (2% each, threshold 3%) land in the infrequent bucket.
    */
  def qOneHotMinFreq(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.events(s, d).withColumn("cat",
      when($"event_id" % 50 < 2, concat(lit("rare_"), ($"event_id" % 5).cast("string")))
        .otherwise($"event_type"))
    val spec = FeaturePipelineSpec(oneHots = Seq(OneHotSpec("cat", dropFirst = false, minFrequency = 0.03)))
    val fitted = FeaturePipeline.fit(base, spec)
    val out = fitted.transform(base)
    val ohCols = fitted.oneHotColumns(spec.oneHots.head).map(_._1)
    out.agg(count(lit(1)).as("n_rows"), ohCols.map(c => sum(col(c)).as(c)): _*)
  }

  val qOneHotMinFreqOracle: String =
    """WITH d AS (SELECT CASE WHEN event_id % 50 < 2
      |  THEN 'rare_' || CAST(event_id % 5 AS VARCHAR) ELSE event_type END AS cat FROM events)
      |SELECT count(*) AS n_rows,
      | CAST(sum(CASE WHEN cat = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cat_click,
      | CAST(sum(CASE WHEN cat = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS cat_error,
      | CAST(sum(CASE WHEN cat = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS cat_purchase,
      | CAST(sum(CASE WHEN cat = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS cat_signup,
      | CAST(sum(CASE WHEN cat = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cat_view,
      | CAST(sum(CASE WHEN cat IN ('rare_0','rare_1') THEN 1 ELSE 0 END) AS BIGINT) AS cat_infrequent
      |FROM d""".stripMargin

  /** Near-zero-variance audit (stddev reported — variance spans too many
    * orders of magnitude for stable fixed-dp rounding across engines).
    */
  def qVarianceThreshold(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.lineitem(s, d)
    val cols = Seq("l_quantity", "l_discount", "l_tax")
    val fitted = FeaturePipeline.fit(base,
      FeaturePipelineSpec(varianceThreshold = Some(0.05), varianceCols = cols))
    val rows = cols.sorted.map { c =>
      (c, fitted.variances(c))
    }
    s.createDataFrame(rows.map { case (c, v) =>
      (c, BigDecimal(math.sqrt(v)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        if (v >= 0.05) 1 else 0)
    }).toDF("feature", "stddev", "keep")
      .withColumn("keep", $"keep".cast("int"))
      .orderBy($"feature")
  }

  val qVarianceThresholdOracle: String =
    """SELECT feature, round(sd,4) AS stddev, CAST(sd*sd >= 0.05 AS INT) AS keep FROM (
      | SELECT 'l_quantity' AS feature, stddev_samp(l_quantity) AS sd FROM lineitem
      | UNION ALL SELECT 'l_discount', stddev_samp(l_discount) FROM lineitem
      | UNION ALL SELECT 'l_tax', stddev_samp(l_tax) FROM lineitem)
      |ORDER BY feature""".stripMargin

  /** LabelEncoder: sorted distinct labels → dense codes. */
  def qLabelEncode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val enc = LabelOps.fitLabelEncoder(docs, "lang")
    docs.withColumn("code", LabelOps.encodeExpr($"lang", enc))
      .groupBy($"lang", $"code").agg(count(lit(1)).as("n"))
      .orderBy($"lang")
  }

  val qLabelEncodeOracle: String =
    """SELECT lang, dense_rank() OVER (ORDER BY lang) - 1 AS code, count(*) AS n
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Balanced class weights n/(k*n_c). */
  def qClassWeights(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    LabelOps.balancedClassWeights(Tables.embeddings(s, d), "label").orderBy($"label")
  }

  val qClassWeightsOracle: String =
    """WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label)
      |SELECT label, n,
      | round(sum(n) OVER () / (count(*) OVER () * n), 4) AS weight
      |FROM c ORDER BY label""".stripMargin

  /** Smoothed target encoding fit on the train half of a hash split:
    * enc_c = (sum_target_c + m·global_mean) / (n_c + m), m = 10 —
    * the leakage-safe high-cardinality categorical encoder.
    */
  def qTargetEncode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val train = Tables.customer(s, d).filter($"c_custkey" % 10 < 8)
      .withColumn("t", when($"c_acctbal" > 0, 1.0).otherwise(0.0))
    val global = train.agg(avg($"t")).head().getDouble(0)
    train.groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), sum($"t").as("sum_t"))
      .withColumn("enc", round(($"sum_t" + lit(10.0) * lit(global)) / ($"n" + lit(10.0)), 6) + lit(0.0))
      .select($"c_mktsegment", $"n", $"enc")
      .orderBy($"c_mktsegment")
  }

  val qTargetEncodeOracle: String =
    """WITH tr AS (
      | SELECT c_mktsegment, CASE WHEN c_acctbal > 0 THEN 1.0 ELSE 0.0 END AS t
      | FROM customer WHERE c_custkey % 10 < 8),
      |g AS (SELECT avg(t) AS gm FROM tr)
      |SELECT c_mktsegment, count(*) AS n,
      | round((sum(t) + 10.0 * max(g.gm)) / (count(*) + 10.0), 6) + 0 AS enc
      |FROM tr CROSS JOIN g GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Pearson correlation matrix over lineitem numerics (EDA analog). */
  def qCorrelation(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val pairs = for (a <- cols; b <- cols if a < b) yield (a, b)
    val aggs = pairs.map { case (a, b) => r4(corr(col(a), col(b))).as(s"${a}__${b}") }
    val row = li.agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.map { case (a, b) => s"'$a', '$b', `${a}__${b}`" }.mkString(", ")
    row.selectExpr(s"stack(${pairs.size}, $stacked) as (col_a, col_b, corr)")
      .orderBy($"col_a", $"col_b")
  }

  val qCorrelationOracle: String =
    """SELECT col_a, col_b, round(c, 4) + 0 AS corr FROM (
      | SELECT 'l_discount' AS col_a, 'l_extendedprice' AS col_b, corr(l_discount, l_extendedprice) AS c FROM lineitem
      | UNION ALL SELECT 'l_discount', 'l_quantity', corr(l_discount, l_quantity) FROM lineitem
      | UNION ALL SELECT 'l_extendedprice', 'l_quantity', corr(l_extendedprice, l_quantity) FROM lineitem)
      |ORDER BY col_a, col_b""".stripMargin

  /** Quartile bucketing with exact interpolated edges (QuantileDiscretizer
    * semantics; edges fit via distributed exact quantiles — see
    * GlobalRank.exactQuantiles — so even a 100 TB fit has no
    * single-buffer percentile aggregate).
    */
  def qBucketize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val edges = graft.operators.GlobalRank.exactQuantiles(
      c, $"c_acctbal", Seq(0.25, 0.5, 0.75))
    val bucket = when($"c_acctbal" <= edges(0), 0)
      .when($"c_acctbal" <= edges(1), 1)
      .when($"c_acctbal" <= edges(2), 2).otherwise(3)
    c.withColumn("bucket", bucket)
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"), r4(min($"c_acctbal")).as("lo"), r4(max($"c_acctbal")).as("hi"))
      .orderBy($"bucket")
  }

  val qBucketizeOracle: String =
    """WITH e AS (SELECT quantile_cont(c_acctbal, 0.25) AS q1, quantile_cont(c_acctbal, 0.5) AS q2,
      |  quantile_cont(c_acctbal, 0.75) AS q3 FROM customer)
      |SELECT CASE WHEN c_acctbal <= e.q1 THEN 0 WHEN c_acctbal <= e.q2 THEN 1
      |       WHEN c_acctbal <= e.q3 THEN 2 ELSE 3 END AS bucket,
      | count(*) AS n, round(min(c_acctbal),4) + 0 AS lo, round(max(c_acctbal),4) + 0 AS hi
      |FROM customer CROSS JOIN e GROUP BY 1 ORDER BY 1""".stripMargin

  /** Deterministic majority-class downsampling: keep all minority rows
    * and a key-mod fraction of the majority (reproducible across runs
    * and engines, unlike seeded sampling) — the class-rebalancing
    * counterpart to "balanced" weights.
    */
  def qDownsample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .withColumn("label", when($"event_type" === "purchase", 1).otherwise(0))
    // majority = label 0 (4 of 5 event types): keep ~1 in 4 by key-mod
    val balanced = ev.filter($"label" === 1 || $"event_id" % 4 === 0)
    balanced.groupBy($"label")
      .agg(count(lit(1)).as("n"), (round(avg($"value"), 4) + lit(0.0)).as("avg_value"))
      .orderBy($"label")
  }

  val qDownsampleOracle: String =
    """SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
      | count(*) AS n, round(avg(value),4) + 0 AS avg_value
      |FROM events
      |WHERE event_type = 'purchase' OR event_id % 4 = 0
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** IQR outlier audit (Tukey fences fit on the full column — the
    * fit-once/apply-everywhere shape of the feature pipeline): per
    * returnflag, row count and rows outside [q1−1.5·IQR, q3+1.5·IQR].
    */
  def qOutlierIqr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    // distributed exact quantiles (no single percentile buffer — see
    // GlobalRank.exactQuantiles); fit once, apply in the agg below
    val qs = graft.operators.GlobalRank.exactQuantiles(
      li, $"l_extendedprice", Seq(0.25, 0.75))
    // Round the QUARTILES to 4 dp before the fence arithmetic (both
    // engines identically), making the fence inputs equal decimals.
    // The fences themselves are then EXACTLY 5-decimal values (2-dp
    // prices → 4-dp interpolated quartiles → ×1.5 adds one digit), so
    // they are DISPLAYED at 6 dp: at sf0.1 the true fence
    // −51094.37125 sits exactly on the 4-dp half-way boundary and the
    // engines' half-rules disagree; at 6 dp a 5-decimal-exact value
    // has no boundary to disagree on.
    def r4d(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (q1, q3) = (r4d(qs(0)), r4d(qs(1)))
    val lo = q1 - 1.5 * (q3 - q1)
    val hi = q3 + 1.5 * (q3 - q1)
    li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(when($"l_extendedprice" < lo || $"l_extendedprice" > hi, 1L).otherwise(0L)).as("n_outliers"))
      .withColumn("lo", round(lit(lo), 6) + lit(0.0))
      .withColumn("hi", round(lit(hi), 6) + lit(0.0))
      .orderBy($"l_returnflag")
  }

  val qOutlierIqrOracle: String =
    """WITH st AS (SELECT round(quantile_cont(l_extendedprice, 0.25), 4) + 0 AS q1,
      |                   round(quantile_cont(l_extendedprice, 0.75), 4) + 0 AS q3 FROM lineitem),
      |f AS (SELECT q1 - 1.5*(q3-q1) AS lo, q3 + 1.5*(q3-q1) AS hi FROM st)
      |SELECT l_returnflag, count(*) AS n,
      | CAST(sum(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      | round(max(lo),6) + 0 AS lo, round(max(hi),6) + 0 AS hi
      |FROM lineitem CROSS JOIN f
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Mutual information of each candidate feature with the purchase
    * label (feature-selection scoring beyond variance threshold;
    * sklearn mutual_info_classif for discrete features). event_type
    * determines the label, so its MI must equal H(label) — a built-in
    * sanity anchor the oracle verifies numerically.
    */
  def qMutualInfo(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    graft.features.FeatureSelect.mutualInfo(ev,
      Seq(
        "event_type" -> $"event_type",
        "user_mod" -> ($"user_id" % 7),
        "value_bin" -> floor($"value" / lit(20.0))),
      when($"event_type" === "purchase", 1).otherwise(0))
      .select($"feature", (round($"mi", 6) + lit(0.0)).as("mi"))
      .orderBy($"feature")
  }

  val qMutualInfoOracle: String =
    """WITH m AS (
      |  SELECT 'event_type' AS feature, event_type AS x,
      |         CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS y FROM events
      |  UNION ALL
      |  SELECT 'user_mod', CAST(user_id % 7 AS VARCHAR),
      |         CASE WHEN event_type='purchase' THEN 1 ELSE 0 END FROM events
      |  UNION ALL
      |  SELECT 'value_bin', CAST(floor(value / 20.0) AS VARCHAR),
      |         CASE WHEN event_type='purchase' THEN 1 ELSE 0 END FROM events),
      |j AS (SELECT feature, x, y, count(*) AS n FROM m GROUP BY 1, 2, 3),
      |t AS (SELECT feature, sum(n) AS tot FROM j GROUP BY 1),
      |mx AS (SELECT feature, x, sum(n) AS nx FROM j GROUP BY 1, 2),
      |my AS (SELECT feature, y, sum(n) AS ny FROM j GROUP BY 1, 2)
      |SELECT j.feature,
      | round(sum((n / tot) * ln((n / tot) / ((nx / tot) * (ny / tot)))), 6) + 0 AS mi
      |FROM j
      |JOIN t ON j.feature = t.feature
      |JOIN mx ON j.feature = mx.feature AND j.x = mx.x
      |JOIN my ON j.feature = my.feature AND j.y = my.y
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Chi-square feature-vs-label independence scores over the same
    * melted single-shuffle machinery as [[qMutualInfo]] (sklearn
    * SelectKBest(chi2) family; exact contingency statistic).
    */
  def qChi2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    graft.features.FeatureSelect.chiSquare(ev,
      Seq(
        "event_type" -> $"event_type",
        "user_mod" -> ($"user_id" % 7),
        "value_bin" -> floor($"value" / lit(20.0))),
      when($"event_type" === "purchase", 1).otherwise(0))
      .select($"feature", (round($"chi2", 4) + lit(0.0)).as("chi2"),
        $"dof", (round($"cramers_v", 6) + lit(0.0)).as("cramers_v"))
      .orderBy($"feature")
  }

  val qChi2Oracle: String =
    """WITH m AS (
      |  SELECT 'event_type' AS feature, event_type AS x,
      |         CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS y FROM events
      |  UNION ALL
      |  SELECT 'user_mod', CAST(user_id % 7 AS VARCHAR),
      |         CASE WHEN event_type='purchase' THEN 1 ELSE 0 END FROM events
      |  UNION ALL
      |  SELECT 'value_bin', CAST(floor(value / 20.0) AS VARCHAR),
      |         CASE WHEN event_type='purchase' THEN 1 ELSE 0 END FROM events),
      |j AS (SELECT feature, x, y, count(*) AS n FROM m GROUP BY 1, 2, 3),
      |t AS (SELECT feature, sum(n) AS tot FROM j GROUP BY 1),
      |mx AS (SELECT feature, x, sum(n) AS nx FROM j GROUP BY 1, 2),
      |my AS (SELECT feature, y, sum(n) AS ny FROM j GROUP BY 1, 2),
      |s AS (SELECT j.feature,
      |   greatest(max(tot) * sum(CAST(n AS DOUBLE) * n / (CAST(nx AS DOUBLE) * ny)) - max(tot), 0.0) AS chi2,
      |   count(DISTINCT j.x) AS kx, count(DISTINCT j.y) AS ky, max(tot) AS tot
      | FROM j
      | JOIN t ON j.feature = t.feature
      | JOIN mx ON j.feature = mx.feature AND j.x = mx.x
      | JOIN my ON j.feature = my.feature AND j.y = my.y
      | GROUP BY 1)
      |SELECT feature, round(chi2, 4) + 0 AS chi2,
      | CAST((kx - 1) * (ky - 1) AS BIGINT) AS dof,
      | round(CASE WHEN least(kx, ky) <= 1 THEN 0.0
      |   ELSE sqrt(chi2 / (CAST(tot AS DOUBLE) * least(kx - 1, ky - 1))) END, 6) + 0 AS cramers_v
      |FROM s ORDER BY feature""".stripMargin

  /** Online feature-view materialization over the events stream table:
    * latest (value, event_type) per user — [[FeatureStore.materializeOnline]]'s
    * single max_by hash aggregate, oracle-mirrored as a latest-row
    * window. The ts is surfaced as unix micros (both engines read the
    * same parquet; micros is the cross-engine-stable form).
    */
  def qFeatureOnline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    FeatureStore.materializeOnline(
        Tables.events(s, d), "user_id", "ts", "event_id", Seq("value", "event_type"))
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"value", $"event_type")
      .orderBy($"user_id")
  }

  val qFeatureOnlineOracle: String =
    """SELECT user_id, epoch_us(ts) AS ts_us, value, event_type FROM (
      | SELECT user_id, ts, value, event_type,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      | FROM events) t WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** Input-schema validation audit ([[FeatureSchema.validate]] — the
    * engine seat of the reference's pre-scoring record validation):
    * events checked against a declarative rule set (value in [0, 100],
    * event_type in an allowed domain), summarized as clean/quarantined
    * counts plus per-reason tallies from the quarantine's violations
    * column.
    */
  def qSchemaValidate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
    val ev = Tables.events(s, d)
    val rules = Seq(
      FeatureSchema.Rule("user_id", LongType),
      FeatureSchema.Rule("value", DoubleType, min = Some(0.0), max = Some(100.0)),
      FeatureSchema.Rule("event_type", StringType,
        domain = Some(Seq("click", "view", "purchase", "signup"))))
    val res = FeatureSchema.validate(ev, rules)
    val nIn = ev.agg(count(lit(1)).as("n_input"))
    val nOk = res.ok.agg(count(lit(1)).as("n_ok"))
    val nQ = res.quarantine.agg(
      count(lit(1)).as("n_quarantined"),
      sum(when(array_contains($"violations", "value: above max 100.0"), 1L)
        .otherwise(0L)).as("n_value_high"),
      sum(when(array_contains($"violations", "event_type: not in domain"), 1L)
        .otherwise(0L)).as("n_bad_domain"))
    nIn.crossJoin(nOk).crossJoin(nQ)
  }

  val qSchemaValidateOracle: String =
    """WITH f AS (SELECT
      |  CASE WHEN value > 100.0 THEN 1 ELSE 0 END AS vh,
      |  CASE WHEN value < 0.0 THEN 1 ELSE 0 END AS vl,
      |  CASE WHEN user_id IS NULL THEN 1 ELSE 0 END AS un,
      |  CASE WHEN value IS NULL THEN 1 ELSE 0 END AS vn,
      |  CASE WHEN event_type IS NOT NULL
      |       AND event_type NOT IN ('click','view','purchase','signup') THEN 1 ELSE 0 END AS bd
      | FROM events)
      |SELECT count(*) AS n_input,
      | CAST(sum(CASE WHEN vh=0 AND vl=0 AND un=0 AND vn=0 AND bd=0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
      | CAST(sum(CASE WHEN vh=1 OR vl=1 OR un=1 OR vn=1 OR bd=1 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
      | CAST(sum(vh) AS BIGINT) AS n_value_high,
      | CAST(sum(bd) AS BIGINT) AS n_bad_domain
      |FROM f""".stripMargin

  /** Winsorization (clip at exact per-group [p05, p95]) — the outlier
    * treatment q_outlier_iqr DETECTS, applied as a transform. Bounds
    * come from [[graft.operators.GlobalRank.quantilesByGroup]] (the
    * cardinality-routing entry point — 3 flags routes to the exact
    * per-group arm), are rounded to 4 dp BEFORE clipping so both
    * engines make identical clip decisions, and rejoin the fact side
    * by broadcast (a bounds frame is ≤ |groups| rows — never a
    * shuffle). Output: per group, how many rows each tail clipped and
    * the winsorized mean — one quantile pass + one broadcast join +
    * one hash agg.
    */
  def qWinsorize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // DELIBERATELY NOT the q_outlier_mad shared-checkpoint shape: r14
    // measured fusing fit+apply onto one localCheckpoint'd narrow
    // projection at 40.0 s vs 21.2 s at sf10 — materializing 60M
    // row-oriented checkpoint rows and re-reading them LOSES to two
    // vectorized 2-column parquet scans (the events projection
    // q_outlier_mad checkpoints is 6× smaller and feeds FIVE
    // consumers, not two). The second scan is the honest price here.
    val li = Tables.lineitem(s, d)
    val bounds = graft.operators.GlobalRank.quantilesByGroup(
        li, "l_returnflag", $"l_extendedprice", Seq("lo" -> 0.05, "hi" -> 0.95))
      .select($"l_returnflag", r4($"lo").as("lo"), r4($"hi").as("hi"))
    li.select($"l_returnflag", $"l_extendedprice".as("x"))
      .join(broadcast(bounds), Seq("l_returnflag"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(when($"x" < $"lo", 1L).otherwise(0L)).as("n_clipped_low"),
        sum(when($"x" > $"hi", 1L).otherwise(0L)).as("n_clipped_high"),
        r4(avg(when($"x" < $"lo", $"lo").when($"x" > $"hi", $"hi")
          .otherwise($"x"))).as("mean_winsorized"))
      .orderBy($"l_returnflag")
  }

  val qWinsorizeOracle: String =
    """WITH b AS (SELECT l_returnflag AS g,
      |  round(quantile_cont(l_extendedprice, 0.05), 4) + 0 AS lo,
      |  round(quantile_cont(l_extendedprice, 0.95), 4) + 0 AS hi
      | FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, count(*) AS n,
      | CAST(sum(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
      | CAST(sum(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
      | round(avg(CASE WHEN l_extendedprice < lo THEN lo
      |               WHEN l_extendedprice > hi THEN hi
      |               ELSE l_extendedprice END), 4) + 0 AS mean_winsorized
      |FROM lineitem JOIN b ON l_returnflag = b.g
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Weight-of-evidence encoding + information value — the credit-
    * scoring categorical transform (per category c: WOE_c =
    * ln((pos_c/pos)/(neg_c/neg)), IV = Σ (pos-share − neg-share)·WOE)
    * with the standard +0.5 Laplace smoothing so empty cells stay
    * finite. The fitted table is O(categories) and broadcasts back for
    * encoding at 100 TB — one hash agg over the data, one O(k) rollup,
    * exactly the target-encode shape (this file's qTargetEncode) with
    * a log-odds statistic. Label: order status 'F', feature: priority.
    */
  def qWoeEncode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d).select($"o_orderpriority".as("cat"),
      when($"o_orderstatus" === "F", 1L).otherwise(0L).as("y"))
    val per = o.groupBy($"cat").agg(count(lit(1)).as("n"), sum($"y").as("npos"))
    val tot = per.agg(sum($"npos").as("tpos"), sum($"n" - $"npos").as("tneg"))
    val posShare = ($"npos" + lit(0.5)) / ($"tpos" + lit(0.5))
    val negShare = ($"n" - $"npos" + lit(0.5)) / ($"tneg" + lit(0.5))
    per.crossJoin(broadcast(tot))
      .select($"cat", $"n",
        r4(log(posShare / negShare)).as("woe"),
        r4((posShare - negShare) * log(posShare / negShare)).as("iv_term"))
      .orderBy($"cat")
  }

  val qWoeEncodeOracle: String =
    """WITH o AS (SELECT o_orderpriority AS cat,
      |  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y FROM orders),
      |p AS (SELECT cat, count(*) AS n, CAST(sum(y) AS BIGINT) AS npos FROM o GROUP BY 1),
      |t AS (SELECT CAST(sum(npos) AS BIGINT) AS tpos,
      |  CAST(sum(n - npos) AS BIGINT) AS tneg FROM p)
      |SELECT cat, n,
      | round(ln(((npos + 0.5) / (tpos + 0.5)) / ((n - npos + 0.5) / (tneg + 0.5))), 4) + 0 AS woe,
      | round((((npos + 0.5) / (tpos + 0.5)) - ((n - npos + 0.5) / (tneg + 0.5)))
      |   * ln(((npos + 0.5) / (tpos + 0.5)) / ((n - npos + 0.5) / (tneg + 0.5))), 4) + 0 AS iv_term
      |FROM p CROSS JOIN t ORDER BY cat""".stripMargin

  val all: Map[String, Q] = Map(
    "q_woe_encode" -> qWoeEncode,
    "q_winsorize" -> qWinsorize,
    "q_feature_online" -> qFeatureOnline,
    "q_schema_validate" -> qSchemaValidate,
    "q_chi2" -> qChi2,
    "q_mutual_info" -> qMutualInfo,
    "q_outlier_iqr" -> qOutlierIqr,
    "q_downsample" -> qDownsample,
    "q_target_encode" -> qTargetEncode,
    "q_correlation" -> qCorrelation,
    "q_bucketize" -> qBucketize,
    "q_impute_median" -> qImputeMedian,
    "q_scale_standard" -> qScaleStandard,
    "q_scale_minmax" -> qScaleMinMax,
    "q_scale_robust" -> qScaleRobust,
    "q_onehot" -> qOneHot,
    "q_onehot_minfreq" -> qOneHotMinFreq,
    "q_variance_threshold" -> qVarianceThreshold,
    "q_label_encode" -> qLabelEncode,
    "q_class_weights" -> qClassWeights
  )

  val oracles: Map[String, String] = Map(
    "q_woe_encode" -> qWoeEncodeOracle,
    "q_winsorize" -> qWinsorizeOracle,
    "q_feature_online" -> qFeatureOnlineOracle,
    "q_schema_validate" -> qSchemaValidateOracle,
    "q_chi2" -> qChi2Oracle,
    "q_mutual_info" -> qMutualInfoOracle,
    "q_outlier_iqr" -> qOutlierIqrOracle,
    "q_downsample" -> qDownsampleOracle,
    "q_target_encode" -> qTargetEncodeOracle,
    "q_correlation" -> qCorrelationOracle,
    "q_bucketize" -> qBucketizeOracle,
    "q_impute_median" -> qImputeMedianOracle,
    "q_scale_standard" -> qScaleStandardOracle,
    "q_scale_minmax" -> qScaleMinMaxOracle,
    "q_scale_robust" -> qScaleRobustOracle,
    "q_onehot" -> qOneHotOracle,
    "q_onehot_minfreq" -> qOneHotMinFreqOracle,
    "q_variance_threshold" -> qVarianceThresholdOracle,
    "q_label_encode" -> qLabelEncodeOracle,
    "q_class_weights" -> qClassWeightsOracle
  )
}
