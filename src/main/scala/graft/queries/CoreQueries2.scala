package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{RangeJoin, ZOrder}
import graft.text.PiiScrub

/** Round-2 relational widening: multidimensional aggregates, window
  * navigation, range join, histograms, exact multi-quantiles
  * (SURVEY.md §2.1 additions).
  */
object CoreQueries2 {
  import CoreQueries.Q

  /** CUBE over (status, priority): all 4 grouping combinations in one
    * pass (Spark expands grouping sets before the single hash agg).
    */
  def qCube(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), (round(sum($"o_totalprice"), 2) + lit(0.0)).as("total"))
      .select(
        coalesce($"o_orderstatus", lit("<all>")).as("status"),
        coalesce($"o_orderpriority", lit("<all>")).as("priority"),
        $"n", $"total")
      .orderBy($"status", $"priority")
  }

  val qCubeOracle: String =
    """SELECT coalesce(o_orderstatus, '<all>') AS status,
      | coalesce(o_orderpriority, '<all>') AS priority,
      | count(*) AS n, round(sum(o_totalprice),2) + 0 AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** GROUPING SETS (one-dimensional marginals) through the SQL surface —
    * the DataFrame API covers rollup/cube; arbitrary sets go via SQL.
    */
  def qGroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT coalesce(o_orderstatus, '<all>') AS status,
        | coalesce(o_orderpriority, '<all>') AS priority,
        | count(*) AS n
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status, priority""".stripMargin)
  }

  val qGroupingSetsOracle: String =
    """SELECT coalesce(o_orderstatus, '<all>') AS status,
      | coalesce(o_orderpriority, '<all>') AS priority,
      | count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      |ORDER BY status, priority""".stripMargin

  /** Window navigation (lag/lead) per user over the event stream: the
    * pandas shift() analog. Partitioned window — shuffles once on
    * user_id, state per partition is a single row lookback/ahead.
    */
  def qLeadLag(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    Tables.events(s, d)
      .filter($"user_id" % 50 === 0)
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
        (round($"value", 4) + lit(0.0)).as("value"))
      .withColumn("prev_value", round(lag($"value", 1).over(w), 4) + lit(0.0))
      .withColumn("next_value", round(lead($"value", 1).over(w), 4) + lit(0.0))
      .withColumn("gap_us", $"ts_us" - lag($"ts_us", 1).over(w))
      .select($"user_id", $"event_id", $"value", $"prev_value", $"next_value", $"gap_us")
      .orderBy($"user_id", $"event_id")
  }

  val qLeadLagOracle: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |  round(value, 4) + 0 AS value
      | FROM events WHERE user_id % 50 = 0)
      |SELECT user_id, event_id, value,
      | round(lag(value) OVER w, 4) + 0 AS prev_value,
      | round(lead(value) OVER w, 4) + 0 AS next_value,
      | ts_us - lag(ts_us) OVER w AS gap_us
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      |ORDER BY user_id, event_id""".stripMargin

  /** Range join with NO equi-key: per anchor ('error' events, sampled),
    * all events in the 2 minutes starting at the anchor. Implemented as
    * a bucketed EQUI-join (graft.operators.RangeJoin) — a theta-join
    * would be a nested-loop at scale.
    */
  def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val twoMinUs = 120L * 1000000L
    val anchors = Tables.events(s, d)
      .filter($"event_type" === "error" && $"event_id" % 97 === 0)
      .select($"event_id".as("anchor_id"), unix_micros($"ts").as("a_us"))
    val probes = Tables.events(s, d)
      .select($"event_id".as("probe_id"), unix_micros($"ts").as("p_us"), $"value")
    RangeJoin.bandJoin(anchors, probes, $"a_us", $"p_us", twoMinUs)
      .groupBy($"anchor_id")
      .agg(count(lit(1)).as("n_within"),
        (round(sum($"value"), 2) + lit(0.0)).as("sum_value"))
      .orderBy($"anchor_id")
  }

  val qRangeJoinOracle: String =
    """SELECT a.event_id AS anchor_id, count(*) AS n_within,
      | round(sum(e.value), 2) + 0 AS sum_value
      |FROM events a JOIN events e
      |  ON epoch_us(e.ts) >= epoch_us(a.ts)
      | AND epoch_us(e.ts) < epoch_us(a.ts) + 120000000
      |WHERE a.event_type = 'error' AND a.event_id % 97 = 0
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Equi-width histogram of order totals: single agg pass, fixed bin
    * count — the EDA/profiling primitive at any scale.
    */
  def qHistogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val width = 25000.0
    Tables.orders(s, d)
      .groupBy(floor($"o_totalprice" / width).cast("int").as("bin"))
      .agg(count(lit(1)).as("n"),
        (round(min($"o_totalprice"), 2) + lit(0.0)).as("lo"),
        (round(max($"o_totalprice"), 2) + lit(0.0)).as("hi"))
      .orderBy($"bin")
  }

  val qHistogramOracle: String =
    """SELECT CAST(floor(o_totalprice / 25000.0) AS INT) AS bin, count(*) AS n,
      | round(min(o_totalprice), 2) + 0 AS lo,
      | round(max(o_totalprice), 2) + 0 AS hi
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Exact multi-quantiles (linear interpolation) of the price column —
    * one row, six quantiles. NOT Spark's `percentile` aggregate (which
    * buffers every value in one aggregation buffer — single-executor
    * OOM at 100 TB): [[graft.operators.GlobalRank.exactQuantiles]]
    * range-partitions + sorts and fetches only the order statistics the
    * interpolation needs, so the plan scales with partitions.
    */
  def qPercentiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val names = Seq("p10", "p25", "p50", "p75", "p90", "p99")
    val qs = graft.operators.GlobalRank.exactQuantiles(
      Tables.lineitem(s, d), $"l_extendedprice", probs)
    s.range(1).select(names.zip(qs).map { case (nm, v) =>
      (round(lit(v), 4) + lit(0.0)).as(nm)
    }: _*)
  }

  val qPercentilesOracle: String =
    """SELECT
      | round(quantile_cont(l_extendedprice, 0.1), 4) + 0 AS p10,
      | round(quantile_cont(l_extendedprice, 0.25), 4) + 0 AS p25,
      | round(quantile_cont(l_extendedprice, 0.5), 4) + 0 AS p50,
      | round(quantile_cont(l_extendedprice, 0.75), 4) + 0 AS p75,
      | round(quantile_cont(l_extendedprice, 0.9), 4) + 0 AS p90,
      | round(quantile_cont(l_extendedprice, 0.99), 4) + 0 AS p99
      |FROM lineitem""".stripMargin

  /** Exact PER-GROUP quantiles (pandas groupby().quantile shape) via
    * the [[graft.operators.GlobalRank.quantilesByGroup]] router: a
    * cheap exact cardinality probe picks the scale shape — here
    * l_returnflag has 3 values, so each (giant) group gets its own
    * range-partitioned [[graft.operators.GlobalRank.exactQuantiles]]
    * pass instead of sorting 1/3 of the table on one reducer.
    */
  def qGroupPercentiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.operators.GlobalRank.quantilesByGroup(
        Tables.lineitem(s, d), "l_returnflag", $"l_extendedprice",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p95" -> 0.95))
      .select($"l_returnflag",
        (round($"p25", 4) + lit(0.0)).as("p25"),
        (round($"p50", 4) + lit(0.0)).as("p50"),
        (round($"p75", 4) + lit(0.0)).as("p75"),
        (round($"p95", 4) + lit(0.0)).as("p95"))
      .orderBy($"l_returnflag")
  }

  val qGroupPercentilesOracle: String =
    """SELECT l_returnflag,
      | round(quantile_cont(l_extendedprice, 0.25), 4) + 0 AS p25,
      | round(quantile_cont(l_extendedprice, 0.5), 4) + 0 AS p50,
      | round(quantile_cont(l_extendedprice, 0.75), 4) + 0 AS p75,
      | round(quantile_cont(l_extendedprice, 0.95), 4) + 0 AS p95
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Robust (median/MAD) outlier audit per event_type — the
    * Iglewicz-Hoaglin modified z-score |0.6745·(x−med)/MAD| > 3.5,
    * immune to the outliers it hunts (unlike mean/stddev). Two
    * chained exact-quantile fits (median, then median absolute
    * deviation) via the GlobalRank.quantilesByGroup router — the
    * handful of event_type groups route to per-group range-partitioned
    * quantile passes; tiny per-group stats broadcast back, never a
    * per-group buffer.
    */
  def qOutlierMad(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // the narrow (type, value) projection feeds FIVE consumers (the
    // router probe, two quantile sorts' sampling + shuffle reads, the
    // final outlier count) — checkpoint it once instead of five
    // column-pruned re-scans of the parquet; blocks are reclaimed by
    // the ContextCleaner when the result is unreferenced
    val ev = Tables.events(s, d).select($"event_type", $"value").localCheckpoint()
    // (no checkpoint on med: exactQuantilesByGroup returns a DRIVER-built
    // 1-partition local relation — recompute is free, a checkpoint job
    // isn't. This RELIES on the router taking the eager exact arm,
    // i.e. |distinct event_type| ≤ lowCardMax = 64 — true for
    // events.event_type (single digits). If that cardinality ever
    // grew past the cap, quantilesByGroup would return the LAZY sort
    // arm and this frame would recompute in both the MAD fit and the
    // final pass — re-add a conditional checkpoint then.)
    val med = graft.operators.GlobalRank
      .quantilesByGroup(ev, "event_type", $"value", Seq("med" -> 0.5))
    val withMed = ev.join(broadcast(med), "event_type")
    // the MAD fit's group set == the median fit's (join on event_type
    // adds no keys): the first router call already proved it under the
    // cap, so the second fit goes straight to the exact arm — no
    // second probe scan
    val mad = graft.operators.GlobalRank.exactQuantilesByGroup(
      withMed.select($"event_type", abs($"value" - $"med").as("ad")),
      "event_type", $"ad", Seq("mad" -> 0.5))
    withMed.join(broadcast(mad), "event_type")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        (round(max($"med"), 4) + lit(0.0)).as("med"),
        (round(max($"mad"), 4) + lit(0.0)).as("mad"),
        // MAD = 0 (majority-constant group) guard: Spark's non-ANSI
        // divide yields NULL there while DuckDB's IEEE divide yields
        // ±Inf — without the guard the engines disagree on whether a
        // degenerate group's non-median rows are "outliers". The MAD
        // statistic is undefined at MAD=0, so neither answer is
        // meaningful: count 0 outliers, mirrored as CASE in the oracle.
        sum(when($"mad" > 0 && abs(lit(0.6745) * ($"value" - $"med") / $"mad") > 3.5, 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy($"event_type")
  }

  val qOutlierMadOracle: String =
    """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1),
      |a AS (SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS ad
      |      FROM events e JOIN m USING (event_type)),
      |d AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM a GROUP BY 1)
      |SELECT a.event_type, count(*) AS n,
      | round(max(a.med), 4) + 0 AS med,
      | round(max(d.mad), 4) + 0 AS mad,
      | CAST(sum(CASE WHEN d.mad > 0 AND abs(0.6745 * (a.value - a.med) / d.mad) > 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM a JOIN d USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Rolling z-score anomaly audit: per user, each event's value
    * against the mean/stddev of its previous 20 events (ROWS frame —
    * one shuffle on user_id, O(frame) state per row), rolled up per
    * event_type. The serving-drift cousin of q_moving_avg.
    */
  def qAnomalyZscore(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts_s", $"event_id").rowsBetween(-20, -1)
    val src = Tables.events(s, d)
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_timestamp($"ts").as("ts_s"))
    // explicit window width — the qScd2 AQE bytes-blind lesson
    // (4 tasks over 223 MB at sf10 otherwise)
    src.repartition(graft.operators.GlobalRank.rangeWidth(src), $"user_id")
      .withColumn("mu", avg($"value").over(w))
      .withColumn("sd", stddev_samp($"value").over(w))
      .withColumn("z", when($"sd" > 1e-9, ($"value" - $"mu") / $"sd"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(abs($"z") > 2, 1L).otherwise(0L)).as("n_anomalies"),
        (round(avg(abs($"z")), 4) + lit(0.0)).as("avg_abs_z"))
      .orderBy($"event_type")
  }

  val qAnomalyZscoreOracle: String =
    """WITH e AS (SELECT user_id, event_id, event_type, value,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
      |z AS (SELECT event_type, value,
      |  avg(value) OVER w AS mu,
      |  stddev_samp(value) OVER w AS sd
      | FROM e
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id
      |   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
      |s AS (SELECT event_type,
      |  CASE WHEN sd > 1e-9 THEN (value - mu) / sd END AS z FROM z)
      |SELECT event_type, count(*) AS n,
      | CAST(sum(CASE WHEN abs(z) > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
      | round(avg(abs(z)), 4) + 0 AS avg_abs_z
      |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Cohort reconciliation via FULL OUTER join — the join type the
    * rest of the surface doesn't exercise (inner/left/semi/anti/range/
    * as-of are covered elsewhere), in its natural data-engineering
    * role: reconcile two keyed aggregates (early vs late purchase
    * cohorts), classify keys present in one / other / both, and roll
    * up the value delta per status. Both inputs pre-aggregate to one
    * row per key BEFORE the join (map-side partials, key-partitioned
    * shuffle join of two deduplicated sides — never a row-level
    * full-outer blowup); AQE is free to pick the join strategy.
    */
  def qCohortReconcile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, d)
    val cut = lit("2000-01-01").cast("date")
    val early = orders.filter($"o_orderdate" < cut)
      .groupBy($"o_custkey").agg(sum($"o_totalprice").as("early"))
    val late = orders.filter($"o_orderdate" >= cut)
      .groupBy($"o_custkey").agg(sum($"o_totalprice").as("late"))
    early.join(late, Seq("o_custkey"), "full_outer")
      .select(
        when($"early".isNull, "late_only")
          .when($"late".isNull, "early_only")
          .otherwise("both").as("status"),
        (coalesce($"late", lit(0.0)) - coalesce($"early", lit(0.0))).as("delta"))
      .groupBy($"status")
      .agg(count(lit(1)).as("n_customers"),
        (round(sum($"delta"), 2) + lit(0.0)).as("total_delta"))
      .orderBy($"status")
  }

  val qCohortReconcileOracle: String =
    """WITH e AS (SELECT o_custkey, sum(o_totalprice) AS early FROM orders
      |  WHERE o_orderdate < DATE '2000-01-01' GROUP BY 1),
      |l AS (SELECT o_custkey, sum(o_totalprice) AS late FROM orders
      |  WHERE o_orderdate >= DATE '2000-01-01' GROUP BY 1),
      |j AS (SELECT early, late FROM e FULL OUTER JOIN l ON e.o_custkey = l.o_custkey),
      |s AS (SELECT CASE WHEN early IS NULL THEN 'late_only'
      |             WHEN late IS NULL THEN 'early_only'
      |             ELSE 'both' END AS status,
      |  coalesce(late, 0) - coalesce(early, 0) AS delta FROM j)
      |SELECT status, count(*) AS n_customers,
      | round(sum(delta), 2) + 0 AS total_delta
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  /** The full SQL window-rank function family in one per-group window
    * (rank / dense_rank / percent_rank / cume_dist / ntile), head rows
    * per priority — rounding out the §2.1 window-navigation coverage
    * next to row_number (q4) and lag/lead (q_lead_lag). The window
    * partitions by priority (reducer-sized groups, never a global
    * single-partition sort); ties are broken inside the ORDER BY so
    * percent_rank/cume_dist are engine-exact.
    */
  /** Window navigation functions, top-8 per priority. Scale shape:
    * percent_rank/cume_dist/ntile need the full group size, and
    * putting them in the window BLOCKS the InferWindowGroupLimit
    * rewrite — every row then shuffles into #priorities=5 partitions
    * and sorts single-threaded (measured 17 s at the sf10 decade). The
    * ordering here is TOTAL (orderkey tiebreak), so all three are
    * exact integer/double algebra over (rank, row_number, group
    * count): pct = (rnk−1)/(n−1), cume = rn/n (every row is its own
    * peer group), and ntile's first n%4 buckets hold ⌈n/4⌉ rows. The
    * window keeps only rank-like functions + the rn≤8 filter → map-
    * side partial top-k; the counts are one tiny broadcast agg.
    * rank/dense_rank computed on the kept prefix are exact (they
    * depend only on preceding rows, all kept). 17 → ~2 s at sf10.
    */
  def qRankFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val cnt = o.groupBy($"o_orderpriority").agg(count(lit(1)).as("n_grp"))
    val q = floor($"n_grp" / 4)
    val r = $"n_grp" % 4
    val big = q + lit(1)
    val cut = r * big
    val quartile = when($"rn" <= cut, floor(($"rn" + big - 1) / big))
      .otherwise(r + floor(($"rn" - cut + greatest(q, lit(1)) - 1) / greatest(q, lit(1))))
    o.select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 8) // → WindowGroupLimit (map-side top-k)
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .join(broadcast(cnt), Seq("o_orderpriority"))
      .select($"o_orderpriority", $"o_orderkey", $"rnk", $"drnk",
        // singleton-group guard: (rnk-1)/(n-1) is 0.0/0 → NaN for a
        // 1-row group (double division bypasses ANSI divide-by-zero),
        // where SQL percent_rank() defines 0.0 — same class of guard
        // as ntile's greatest(q, 1)
        (round(when($"n_grp" > 1, ($"rnk" - 1).cast("double") / ($"n_grp" - 1))
          .otherwise(lit(0.0)), 4) + lit(0.0)).as("pct_rank"),
        (round($"rn".cast("double") / $"n_grp", 4) + lit(0.0)).as("cume"),
        quartile.cast("int").as("quartile"))
      .orderBy($"o_orderpriority", $"rnk")
  }

  val qRankFuncsOracle: String =
    """WITH r AS (SELECT o_orderpriority, o_orderkey,
      |  rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  round(percent_rank() OVER w, 4) + 0 AS pct_rank,
      |  round(cume_dist() OVER w, 4) + 0 AS cume,
      |  ntile(4) OVER w AS quartile,
      |  row_number() OVER w AS rn
      | FROM orders
      | WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey))
      |SELECT o_orderpriority, o_orderkey, rnk, drnk, pct_rank, cume, quartile
      |FROM r WHERE rn <= 8 ORDER BY o_orderpriority, rnk""".stripMargin

  /** GDPR-style identifier pseudonymization audit — the privacy pass a
    * training-data pipeline runs before text ever reaches a model.
    * Identifier-shaped values are detected by pattern, mapped to a
    * deterministic surrogate ([[PiiScrub.surrogateKey]] — md5-derived,
    * so every table carrying the same identifier gets the same
    * surrogate and joins survive the scrub), and digit-redacted for
    * display. The audit proves the two invariants that matter:
    * n_surrogates == n_names (the mapping is injective at this scale —
    * no two customers collapse) and n_redacted_forms is tiny (the
    * redacted form leaks only the pattern, not the identity).
    * One projection + one hash agg — zero extra shuffles at 100 TB.
    */
  def qPseudonymize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d).select(
      $"c_mktsegment",
      $"c_name",
      $"c_name".rlike("^Customer#[0-9]+$").as("is_id"),
      PiiScrub.surrogateKey($"c_name").as("surrogate"),
      regexp_replace($"c_name", "[0-9]", "#").as("redacted"))
    c.groupBy($"c_mktsegment").agg(
        count(lit(1)).as("n_rows"),
        sum(when($"is_id", 1L).otherwise(0L)).as("n_matched"),
        countDistinct($"c_name").as("n_names"),
        countDistinct($"surrogate").as("n_surrogates"),
        countDistinct($"redacted").as("n_redacted_forms"))
      .orderBy($"c_mktsegment")
  }

  val qPseudonymizeOracle: String =
    """WITH c AS (SELECT c_mktsegment, c_name,
      |  regexp_matches(c_name, '^Customer#[0-9]+$') AS is_id,
      |  substr(md5(c_name), 1, 12) AS surrogate,
      |  regexp_replace(c_name, '[0-9]', '#', 'g') AS redacted
      | FROM customer)
      |SELECT c_mktsegment, count(*) AS n_rows,
      | CAST(sum(CASE WHEN is_id THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
      | count(DISTINCT c_name) AS n_names,
      | count(DISTINCT surrogate) AS n_surrogates,
      | count(DISTINCT redacted) AS n_redacted_forms
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** k-anonymity audit over quasi-identifiers — the privacy gate a
    * training-data release runs next to pseudonymization (this file's
    * [[qPseudonymize]]): group the table by its quasi-identifier tuple
    * (nation, market segment — the columns an adversary can link
    * externally), histogram the equivalence-class sizes into k-bands,
    * and report how many ROWS sit in classes below each band — rows in
    * classes of size < k are re-identifiable at that k. One hash agg
    * to class sizes (|classes| ≤ |nations|×|segments|, tiny), then an
    * O(classes) rollup: nothing data-proportional leaves the first
    * shuffle at 100 TB. Bands are integer cuts (1, 2-4, 5-9, 10+) —
    * no float boundary to disagree on.
    */
  def qKanon(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val classes = Tables.customer(s, d)
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("sz"))
    classes
      .select(
        when($"sz" === 1, "1").when($"sz" < 5, "2-4")
          .when($"sz" < 10, "5-9").otherwise("10+").as("k_band"),
        $"sz")
      .groupBy($"k_band")
      .agg(count(lit(1)).as("n_classes"), sum($"sz").as("n_rows"))
      .orderBy($"k_band")
  }

  val qKanonOracle: String =
    """WITH c AS (SELECT c_nationkey, c_mktsegment, count(*) AS sz
      | FROM customer GROUP BY 1, 2),
      |b AS (SELECT CASE WHEN sz = 1 THEN '1' WHEN sz < 5 THEN '2-4'
      |  WHEN sz < 10 THEN '5-9' ELSE '10+' END AS k_band, sz FROM c)
      |SELECT k_band, count(*) AS n_classes,
      | CAST(sum(sz) AS BIGINT) AS n_rows
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  /** SCD2 (slowly-changing-dimension type 2) build — reconstruct each
    * customer's order-priority history as validity intervals: collapse
    * the per-customer order stream (ordered by date, key as
    * tiebreak) into runs of constant priority, then open a version row
    * per run with valid_from = run's first order date and valid_to =
    * next run's valid_from (current rows get a far-future sentinel so
    * the column stays a non-null BIGINT — cross-engine NULL
    * stringification is not hash-stable). This is the warehouse-side
    * twin of the feature store's PIT retrieval (features/
    * FeatureStore.scala): an as-of join against this output at time t
    * returns exactly the version whose [valid_from, valid_to) contains
    * t. Both per-key window passes run TWO-LEVEL
    * ([[graft.operators.SaltedRuns]]): the run numbering as salted
    * sub-windows + an O(buckets)-per-key boundary repair, the
    * valid_to lead as chunked sub-windows + an O(chunks)-per-key
    * summary — because a zipf head key is otherwise ONE unsplittable
    * window partition (r14 sf10skew measured the single-level plan at
    * 39 s vs 6 s uniform: custkey 1 = 3M orders sorted + windowed on
    * one core; two-level runs the same corpus at head/buckets rows per
    * task).
    */
  def qScd2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    scd2Of(s, Tables.orders(s, d)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_orderpriority"))
      .orderBy($"o_custkey", $"version")
  }

  /** The qScd2 build pipeline over an arbitrary orders subset — shared
    * with [[qScd2Apply]], whose base dimension is the same build on
    * the pre-cutoff orders. Returns the final dimension schema
    * (o_custkey, version, priority, valid_from_s, valid_to_s,
    * n_orders), unsorted.
    */
  private[graft] def scd2Of(s: SparkSession, src: DataFrame,
      hotOverride: Option[Seq[Any]] = None): DataFrame = {
    import s.implicits._
    // ONE hot-key probe on the cheap source scan, shared by every
    // two-level decision below: sampling the collapsed-runs
    // intermediate would execute its whole upstream pipeline just for
    // the probe. `hotOverride` (r18, VERDICT r17 #6) lets a caller
    // that already probed a SUPERSET frame (qScd2Apply probes the full
    // orders scan once for dimension + changes + applyChanges) skip
    // even that job — per-key cardinality only shrinks under subsets,
    // so a superset list is a safe over-approximation (false positives
    // pay the small repair overhead on <= 64 keys; exactness holds on
    // both paths). History of the shape: r14 split per OPERATOR and
    // unioned between them (measured-rejected: mixed partitionings
    // forced a full-corpus agg re-exchange, +205 MB / ~4 s on cold
    // sf10skew rows); r14-r17 split the whole PIPELINE per branch
    // (cold kept the fused one-exchange plan, at the price of
    // executing the source scan once per branch); r18 runs one
    // pipeline over one scan — see the note inside `pipeline`.
    val hot = hotOverride.getOrElse(
      graft.operators.SaltedRuns.detectHotKeys(src, "o_custkey"))
    def pipeline(part: DataFrame, hotList: Seq[Any]): DataFrame = {
      // r18: SaltedRuns.numbered/chunkedLead are ONE-SCAN, ONE-EXCHANGE
      // internally now (cold keys ride the constant bucket 0 of the
      // same (key, bucket) exchange the hot keys split over), so the
      // pipeline runs ONCE over the full frame — the previous top-level
      // cold/hot split (which kept the cold branch's window+agg+lead
      // fused on one hash(key) exchange at the price of executing the
      // source scan twice) is gone. The trade moves the cold mass's
      // agg onto a (runs-grain, partial-agg'd) re-exchange and in
      // return deletes a full corpus scan — A/B'd at sf10skew, see
      // OPTIMIZATION_r18.md.
      val runs = graft.operators.SaltedRuns.numbered(
        part, "o_custkey", unix_timestamp($"o_orderdate"), Seq($"o_orderkey"),
        Seq($"o_orderpriority"),
        // null-safe (r18, ADVICE r17): =!= yields null for null values,
        // which falls to otherwise(0) — a null would silently CONTINUE
        // any run, diverging from applyChanges' <=> run-collapse and
        // breaking the rebuild-equality contract on a nullable value
        // column. No-op for the non-null o_orderpriority data.
        (p, c) => !(p.getField("o_orderpriority") <=> c.getField("o_orderpriority")),
        "version", buckets = 32, hotOverride = Some(hotList))
      // hot branch only: pinned exchange under the agg
      // (REPARTITION_BY_NUM) — the salted runs arrive hash(key, bucket)
      // partitioned, the agg must re-exchange anyway, and an unpinned
      // exchange's reads bytes-coalesce to 1 task (the qScd2 lesson)
      val gIn = if (hotList.nonEmpty)
        runs.repartition(graft.operators.GlobalRank.rangeWidth(part),
          $"o_custkey", $"version", $"o_orderpriority")
      else runs
      val g = gIn
        .groupBy($"o_custkey", $"version", $"o_orderpriority")
        .agg(min(unix_timestamp($"o_orderdate")).as("valid_from_s"),
          count(lit(1)).as("n_orders"))
      graft.operators.SaltedRuns.chunkedLead(g, "o_custkey", $"version",
        $"valid_from_s", "__vt", hotOverride = Some(hotList))
    }
    val led = pipeline(src, hot)
    led
      .withColumn("valid_to_s", coalesce($"__vt", lit(253402300800L)))
      .select($"o_custkey", $"version", $"o_orderpriority".as("priority"),
        $"valid_from_s", $"valid_to_s", $"n_orders")
  }

  /** INCREMENTAL SCD2 maintenance — the MERGE-shaped twin of
    * q_dedup_incremental for the warehouse side: the dimension built
    * from pre-1997 orders is the STORED table, the 1997+ orders are
    * the change batch, and [[graft.operators.Scd2.applyChanges]] folds
    * them in without rebuilding — untouched customers pass through a
    * map-side broadcast anti-join (the touched-keys-only shuffle
    * contract, plan-spec'd), touched customers close/extend their
    * current row and append the batch's collapsed runs. The date
    * cutoff gives the operator its contract for free: every change
    * event is strictly later than every base event. ORACLE: the full
    * REBUILD over all orders (qScd2's own SQL) — increment == rebuild,
    * row for row, on every key.
    */
  def qScd2Apply(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val all = Tables.orders(s, d)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val cutoff = "1997-01-01"
    // ONE hot-key probe for the whole scenario (r18, VERDICT r17 #6):
    // the full orders scan is a superset of the dimension build, the
    // change batch, AND the stored dimension, so its hot list serves
    // all of scd2Of's and applyChanges' gates — previously three
    // separate 1%-sample jobs that put a ~1.4 s floor under the sf0.1
    // seat. Same list at sf100skew (the zipf head dominates every
    // slice), so the scale plan is unchanged.
    val hot = graft.operators.SaltedRuns.detectHotKeys(all, "o_custkey")
    // MATERIALIZED: the scenario's dimension is a STORED table — as a
    // live pipeline it would re-execute once per applyChanges consumer
    // (untouched anti-join, history, current row) and once more per
    // output-sort pass (measured 22.3 s at sf10; checkpointed ~14 s).
    // Eager at construction, like the other fit-shaped queries.
    val dim = scd2Of(s, all.filter($"o_orderdate" < lit(cutoff)),
      hotOverride = Some(hot)).localCheckpoint()
    val changes = all.filter($"o_orderdate" >= lit(cutoff))
    // the seat's "change batch" is a DATE SLICE of the whole corpus —
    // it touches ~every key by construction (that is what makes the
    // rebuild-equality oracle total), so the touched-key cap that
    // guards PRODUCTION increments is explicitly waived; the r15 sf100
    // sweep is what caught the default cap firing here (14.98M keys)
    graft.operators.Scd2.applyChanges(dim, changes, "o_custkey",
        unix_timestamp($"o_orderdate"), $"o_orderkey", "o_orderpriority",
        maxTouchedKeys = Long.MaxValue, hotOverride = Some(hot))
      .orderBy($"o_custkey", $"version")
  }

  val qScd2ApplyOracle: String = // rebuild-vs-increment equality: the full-rebuild SQL
    """WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
      |  CASE WHEN lag(o_orderpriority) OVER w IS NULL
      |         OR lag(o_orderpriority) OVER w <> o_orderpriority THEN 1 ELSE 0 END AS chg
      | FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |r AS (SELECT o_custkey, o_orderpriority,  o_orderdate,
      |  CAST(sum(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS version
      | FROM o),
      |g AS (SELECT o_custkey, version, o_orderpriority AS priority,
      |  CAST(floor(epoch(min(o_orderdate))) AS BIGINT) AS valid_from_s,
      |  count(*) AS n_orders
      | FROM r GROUP BY 1, 2, 3)
      |SELECT o_custkey, version, priority, valid_from_s,
      | coalesce(lead(valid_from_s) OVER (PARTITION BY o_custkey ORDER BY version),
      |          253402300800) AS valid_to_s,
      | n_orders
      |FROM g ORDER BY o_custkey, version""".stripMargin

  val qScd2Oracle: String =
    """WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
      |  CASE WHEN lag(o_orderpriority) OVER w IS NULL
      |         OR lag(o_orderpriority) OVER w <> o_orderpriority THEN 1 ELSE 0 END AS chg
      | FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |r AS (SELECT o_custkey, o_orderpriority,  o_orderdate,
      |  CAST(sum(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS version
      | FROM o),
      |g AS (SELECT o_custkey, version, o_orderpriority AS priority,
      |  CAST(floor(epoch(min(o_orderdate))) AS BIGINT) AS valid_from_s,
      |  count(*) AS n_orders
      | FROM r GROUP BY 1, 2, 3)
      |SELECT o_custkey, version, priority, valid_from_s,
      | coalesce(lead(valid_from_s) OVER (PARTITION BY o_custkey ORDER BY version),
      |          253402300800) AS valid_to_s,
      | n_orders
      |FROM g ORDER BY o_custkey, version""".stripMargin

  /** Gaps-and-islands interval merge — each event opens a half-hour
    * activity interval [ts, ts+1800); overlapping/touching intervals
    * per user are merged into islands and the per-user coverage
    * summarized. The island boundary is the classic running-max test
    * (an interval starts a new island iff its start exceeds the max
    * end of ALL preceding intervals — lag alone is wrong when an early
    * long interval swallows later short ones). Equal-start ties are
    * ordered by event_id; the flag is tie-order-invariant (an
    * equal-start event can never open an island) so both engines
    * agree. Same two-shuffle shape as [[qScd2]]: one partition by
    * user_id serves the window and both aggregations.
    */
  def qIntervalsMerge(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", $"event_id", unix_timestamp($"ts").as("st"))
      .withColumn("en", $"st" + lit(1800L))
    val w = Window.partitionBy($"user_id").orderBy($"st", $"event_id")
    // explicit window width — same AQE bytes-blind-coalescing fix as
    // [[qScd2]] (4 tasks over 190 MB at sf10 otherwise)
    val islands = ev
      .repartition(graft.operators.GlobalRank.rangeWidth(ev), $"user_id")
      .withColumn("prev_max_en", max($"en").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when($"prev_max_en".isNull || $"st" > $"prev_max_en", 1L).otherwise(0L))
      .withColumn("island", sum($"new_island").over(w))
      .groupBy($"user_id", $"island")
      .agg(min($"st").as("ist"), max($"en").as("ien"), count(lit(1)).as("n_ev"))
    islands.groupBy($"user_id")
      .agg(count(lit(1)).as("n_islands"),
        sum($"ien" - $"ist").as("covered_s"),
        max($"n_ev").as("max_events_island"))
      .orderBy($"user_id")
  }

  val qIntervalsMergeOracle: String =
    """WITH e AS (SELECT user_id, event_id,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS st,
      |  CAST(floor(epoch(ts)) AS BIGINT) + 1800 AS en
      | FROM events),
      |f AS (SELECT user_id, event_id, st, en,
      |  max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_en
      | FROM e),
      |m AS (SELECT user_id, event_id, st, en,
      |  CASE WHEN prev_max_en IS NULL OR st > prev_max_en THEN 1 ELSE 0 END AS new_island
      | FROM f),
      |i AS (SELECT user_id, st, en,
      |  CAST(sum(new_island) OVER (PARTITION BY user_id ORDER BY st, event_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
      | FROM m),
      |g AS (SELECT user_id, island, min(st) AS ist, max(en) AS ien, count(*) AS n_ev
      | FROM i GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_islands,
      | CAST(sum(ien - ist) AS BIGINT) AS covered_s,
      | max(n_ev) AS max_events_island
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  /** Morton (Z-order) code algebra pinned by oracle — the interleave
    * step of operators/ZOrder.zorderBy on engine-exact fixed buckets
    * (floor arithmetic, not fitted quantiles, so DuckDB reproduces the
    * bits exactly): 6 bits of quantity x 6 bits of price-band
    * interleaved to a 12-bit code, grouped to the code histogram with
    * the decoded buckets (the code<->bucket bijection makes min ==
    * max == the decode, so the oracle certifies both directions).
    * One projection + one hash agg.
    */
  def qZvalue(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val b = Tables.lineitem(s, d).select(
      (floor($"l_quantity").cast("long") % 64).as("bq"),
      (floor($"l_extendedprice" / 1000.0).cast("long") % 64).as("bp"))
    b.withColumn("z", ZOrder.zvalue(Seq($"bq", $"bp"), 6))
      .groupBy($"z")
      .agg(min($"bq").as("bq"), min($"bp").as("bp"), count(lit(1)).as("n"))
      .orderBy($"z")
  }

  val qZvalueOracle: String =
    """WITH b AS (SELECT CAST(floor(l_quantity) AS BIGINT) % 64 AS bq,
      |  CAST(floor(l_extendedprice / 1000.0) AS BIGINT) % 64 AS bp FROM lineitem),
      |z AS (SELECT bq, bp,
      |  (((bq >> 0) & 1) << 0) | (((bp >> 0) & 1) << 1) |
      |  (((bq >> 1) & 1) << 2) | (((bp >> 1) & 1) << 3) |
      |  (((bq >> 2) & 1) << 4) | (((bp >> 2) & 1) << 5) |
      |  (((bq >> 3) & 1) << 6) | (((bp >> 3) & 1) << 7) |
      |  (((bq >> 4) & 1) << 8) | (((bp >> 4) & 1) << 9) |
      |  (((bq >> 5) & 1) << 10) | (((bp >> 5) & 1) << 11) AS z
      | FROM b)
      |SELECT z, min(bq) AS bq, min(bp) AS bp, count(*) AS n
      |FROM z GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Map[String, Q] = Map(
    "q_zvalue" -> qZvalue,
    "q_scd2" -> qScd2,
    "q_scd2_apply" -> qScd2Apply,
    "q_intervals_merge" -> qIntervalsMerge,
    "q_kanon" -> qKanon,
    "q_pseudonymize" -> qPseudonymize,
    "q_rank_funcs" -> qRankFuncs,
    "q_cohort_reconcile" -> qCohortReconcile,
    "q_outlier_mad" -> qOutlierMad,
    "q_group_percentiles" -> qGroupPercentiles,
    "q_anomaly_zscore" -> qAnomalyZscore,
    "q_cube" -> qCube,
    "q_grouping_sets" -> qGroupingSets,
    "q_lead_lag" -> qLeadLag,
    "q_range_join" -> qRangeJoin,
    "q_histogram" -> qHistogram,
    "q_percentiles" -> qPercentiles
  )

  val oracles: Map[String, String] = Map(
    "q_zvalue" -> qZvalueOracle,
    "q_scd2" -> qScd2Oracle,
    "q_scd2_apply" -> qScd2ApplyOracle,
    "q_intervals_merge" -> qIntervalsMergeOracle,
    "q_kanon" -> qKanonOracle,
    "q_pseudonymize" -> qPseudonymizeOracle,
    "q_rank_funcs" -> qRankFuncsOracle,
    "q_cohort_reconcile" -> qCohortReconcileOracle,
    "q_outlier_mad" -> qOutlierMadOracle,
    "q_group_percentiles" -> qGroupPercentilesOracle,
    "q_anomaly_zscore" -> qAnomalyZscoreOracle,
    "q_cube" -> qCubeOracle,
    "q_grouping_sets" -> qGroupingSetsOracle,
    "q_lead_lag" -> qLeadLagOracle,
    "q_range_join" -> qRangeJoinOracle,
    "q_histogram" -> qHistogramOracle,
    "q_percentiles" -> qPercentilesOracle
  )
}
