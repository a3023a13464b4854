package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.prep.Prep
import graft.split.Splits

/** Relational / preprocessing / split queries with DuckDB oracle twins.
  *
  * Oracle-parity rules (SURVEY.md §5): identical column names, floats
  * rounded in both engines, deterministic ORDER BY everywhere,
  * timestamps exported as epoch seconds or formatted strings.
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  // ---- 2.1 relational / preprocessing core -------------------------------

  /** TPC-H Q1 shape: single scan, map-side partial agg, tiny result. */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        // sum_qty stays double: integer-valued sums are exact at any
        // addition order below 2^53. The three MONEY sums are exact
        // and order-independent (the .xx5 half-boundary class killed
        // in r18 — see q2RevenueNation), with the per-row arithmetic
        // in exact LONG units (r19): prices/discounts/taxes are exact
        // 2-dp values, so round(x*100) recovers the exact integer and
        // the per-item product is an exact integer count of 10^-4 /
        // 10^-6 units — pure codegen primitives instead of per-row
        // BigDecimal multiply chains (measured: the r18 all-decimal
        // form cost q1 +0.35 s at sf0.1). ONE narrowing cast to
        // decimal feeds each sum; the sums stay decimal because the
        // (flag, status) grain overflows long at 100 TB row counts
        // (the r18 cents-as-long rejection). Dividing the unit count
        // back out happens once per GROUP, exactly (decimal scale 6 >
        // the 4/6-dp grid). sum_base_price joined the exact class in
        // r19 (ADVICE r18): a 2-dp-grid double sum is exact only
        // while accumulated FP error stays under the 0.005 rounding
        // margin, which thins at larger SFs; the exact sum is
        // identical on every currently-green corpus by construction.
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum(round($"l_extendedprice" * 100).cast("long")
          .cast("decimal(28,0)")) / 100, 2)
          .cast("double").as("sum_base_price"),
        round(sum((round($"l_extendedprice" * 100).cast("long") *
          (lit(100L) - round($"l_discount" * 100).cast("long")))
          .cast("decimal(30,0)")) / 10000, 2)
          .cast("double").as("sum_disc_price"),
        round(sum((round($"l_extendedprice" * 100).cast("long") *
          (lit(100L) - round($"l_discount" * 100).cast("long")) *
          (lit(100L) + round($"l_tax" * 100).cast("long")))
          .cast("decimal(32,0)")) / 1000000, 2)
          .cast("double").as("sum_charge"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity),2) AS sum_qty,
      | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))),2) AS DOUBLE) AS sum_base_price,
      | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))*(1-CAST(l_discount AS DECIMAL(8,2)))),2) AS DOUBLE) AS sum_disc_price,
      | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))*(1-CAST(l_discount AS DECIMAL(8,2)))*(1+CAST(l_tax AS DECIMAL(8,2)))),2) AS DOUBLE) AS sum_charge,
      | round(avg(l_quantity),4) AS avg_qty,
      | round(avg(l_extendedprice),4) AS avg_price,
      | round(avg(l_discount),4) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Star join: facts shuffle on keys, dims (nation/region) broadcast.
    *
    * Aggregation is pushed BELOW the joins (r16 sf100skew lesson: the
    * naive plan shuffled the full-width lineitem⋈orders intermediate on
    * the zipf-head o_custkey — 17.2 GB disk spill at sf100skew):
    *  1. lineitem collapses to (l_orderkey, rev, cnt) first; the join
    *     with orders reuses that hash partitioning, so this costs no
    *     extra shuffle and the orderkey join probe shrinks ~4×.
    *  2. revenue re-aggregates per o_custkey BEFORE meeting customer,
    *     so map-side partial aggregation collapses any hot custkey and
    *     the custkey shuffle carries ≤ one narrow row per key per
    *     partition instead of every lineitem row of the head customer.
    * Joins are key-preserving (o_orderkey / c_custkey unique), so the
    * two-level sum/count is exactly the flat aggregate.
    */
  def q2RevenueNation(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
      .filter($"o_orderdate" >= to_timestamp(lit("1996-01-01")) &&
        $"o_orderdate" < to_timestamp(lit("1998-01-01")))
      .select($"o_orderkey", $"o_custkey")
    // DECIMAL revenue arithmetic (r18): prices/discounts are exact
    // 2-dp values, so the per-item product is an exact 4-dp decimal
    // and decimal sums are order-independent — a double sum is 1-ulp
    // order-sensitive, and this query's pre-aggregation (r17) sums in
    // a different order than the streaming oracle, which split a true
    // .xx5 half-boundary at a regenerated sf0.001 (NATION_16 revenue
    // = exactly 5032261.5750: Spark's double sum rounded .58, DuckDB's
    // .57 — and .58 is the CORRECT half-up of the exact value). Both
    // engines now sum the exact decimal; the boundary class is dead at
    // any SF/regeneration, not dodged.
    // r19: the per-item product and the per-ORDER sum ride exact LONG
    // 4-dp units — an order's few items × < 10^10 units each can never
    // overflow, so the only aggregation that touches every lineitem
    // row is codegen'd primitive arithmetic (the r18 all-decimal form
    // cost q2 +0.64 s at sf0.1 / +2.9 s at sf10skew in per-row
    // BigDecimal multiplies). ONE cast to decimal per ORDER row feeds
    // the custkey/nation sums, which stay decimal: those grains
    // overflow long at 100 TB row counts (the r18 rejection). The
    // division back to money happens once per GROUP at decimal scale
    // 6 — exact on the 4-dp grid, so the result is bit-identical to
    // the all-decimal form and the oracle is unchanged.
    val perOrder = Tables.lineitem(s, d)
      .groupBy($"l_orderkey")
      .agg(
        sum(round($"l_extendedprice" * 100).cast("long") *
          (lit(100L) - round($"l_discount" * 100).cast("long"))).as("__rev4"),
        count(lit(1)).as("__cnt"))
      .select($"l_orderkey", $"__rev4".cast("decimal(38,0)").as("__rev"), $"__cnt")
    val perCust = perOrder.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(sum($"__rev").as("__rev"), sum($"__cnt").as("__cnt"))
    val c = Tables.customer(s, d).select($"c_custkey", $"c_nationkey")
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    perCust.join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        round(sum($"__rev") / 10000, 2).cast("double").as("revenue"),
        sum($"__cnt").as("n_items"))
      .orderBy($"r_name", $"n_name")
  }

  val q2Oracle: String =
    """SELECT r_name, n_name,
      | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))),2) AS DOUBLE) AS revenue,
      | count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** TPC-H Q3 shape: selective dim filter + agg + top-k (TakeOrdered). */
  def q3TopOrders(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
    val o = Tables.orders(s, d).filter($"o_orderdate" < to_timestamp(lit("1999-06-01")))
    val li = Tables.lineitem(s, d).filter($"l_shipdate" > to_timestamp(lit("1999-06-01")))
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .select($"l_orderkey", $"revenue", date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val q3Oracle: String =
    """SELECT l_orderkey,
      | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
      | strftime(o_orderdate, '%Y-%m-%d') AS orderdate
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1999-06-01'
      |  AND l_shipdate > TIMESTAMP '1999-06-01'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Window top-N per group (pandas groupby.head analog). */
  def q4WindowTopN(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    // NO explicit-width repartition here (unlike qScd2): it would sit
    // between the scan and the window and break the map-side
    // WindowGroupLimit pushdown — measured 50 -> 227 MB shuffled at
    // sf10 for a local-only width win. The pruned exchange coalescing
    // to 1 task is a small-SF artifact; at cluster scale the pruned
    // bytes alone keep it wide, and 4.5x fewer shuffle bytes is the
    // 100 TB-relevant term.
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  val q4Oracle: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders)
      |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin

  /** Missing-value normalization over a deterministically dirtied column;
    * result aggregated by cleaned value (NULLs surfaced as a sentinel so
    * ordering semantics match across engines).
    */
  def qMissingNorm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dirty = when($"event_id" % 7 === 0, lit("  "))
      .when($"event_id" % 11 === 0, lit("N/A"))
      .when($"event_id" % 13 === 0, lit("null"))
      .otherwise($"event_type")
    Tables.events(s, d)
      .withColumn("event_type_clean", Prep.normalizeMissingCol(dirty))
      .groupBy(coalesce($"event_type_clean", lit("<missing>")).as("event_type_clean"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"event_type_clean")
  }

  val qMissingNormOracle: String =
    """SELECT coalesce(cleaned, '<missing>') AS event_type_clean, count(*) AS n FROM (
      | SELECT CASE WHEN trim(dirty) = '' OR dirty IN ('', '<NA>', 'null', '?', 'N/A', 'NAN', 'nan')
      |             THEN NULL ELSE dirty END AS cleaned
      | FROM (SELECT CASE WHEN event_id % 7 = 0 THEN '  '
      |                   WHEN event_id % 11 = 0 THEN 'N/A'
      |                   WHEN event_id % 13 = 0 THEN 'null'
      |                   ELSE event_type END AS dirty FROM events))
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Dedupe by key keep-latest: one row per user (latest event). */
  def qDedupPk(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Prep.dedupByKeyKeepLatest(
        Tables.events(s, d), Seq("user_id"), Seq($"ts".desc, $"event_id".desc))
      .select($"user_id", $"event_id", unix_timestamp($"ts").as("ts_s"), $"event_type",
        round($"value", 2).as("value"))
      .orderBy($"user_id")
  }

  val qDedupPkOracle: String =
    """SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type,
      | round(value, 2) AS value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** Duplicate-key audit (keys with multiplicity > 1). */
  def qDupCheck(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Prep.duplicateKeyAudit(Tables.events(s, d), Seq("user_id"))
      .orderBy($"user_id")
  }

  val qDupCheckOracle: String =
    """SELECT user_id, count(*) AS n_rows FROM events
      |GROUP BY user_id HAVING count(*) > 1 ORDER BY user_id""".stripMargin

  /** Per-column NULL-fraction profile over deterministically dirtied cols. */
  def qHighNanCols(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val df = Tables.events(s, d)
      .withColumn("props_dirty",
        Prep.normalizeMissingCol(when($"event_id" % 3 === 0, lit("")).otherwise($"props")))
      .withColumn("value_dirty", when($"event_id" % 2 === 0, lit(null)).otherwise($"value"))
    Prep.nullFractionProfile(df, Seq("props_dirty", "value_dirty", "event_type"), 0.3)
      .orderBy($"column_name")
  }

  val qHighNanColsOracle: String =
    """WITH d AS (
      | SELECT CASE WHEN event_id % 3 = 0 THEN NULL ELSE props END AS props_dirty,
      |        CASE WHEN event_id % 2 = 0 THEN NULL ELSE value END AS value_dirty,
      |        event_type
      | FROM events)
      |SELECT column_name, null_frac, CAST(null_frac >= 0.3 AS INT) AS drop_flag FROM (
      | SELECT 'props_dirty' AS column_name, round(avg(CASE WHEN props_dirty IS NULL THEN 1.0 ELSE 0.0 END),4) AS null_frac FROM d
      | UNION ALL
      | SELECT 'value_dirty', round(avg(CASE WHEN value_dirty IS NULL THEN 1.0 ELSE 0.0 END),4) FROM d
      | UNION ALL
      | SELECT 'event_type', round(avg(CASE WHEN event_type IS NULL THEN 1.0 ELSE 0.0 END),4) FROM d)
      |ORDER BY column_name""".stripMargin

  /** Dtype enforcement: timestamp→date string, numeric rollup by cast. */
  def qTypeCast(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(
        date_format($"ts", "yyyy-MM-dd").as("event_date"),
        $"value".cast("int").as("value_int"))
      .groupBy($"event_date")
      .agg(count(lit(1)).as("n"), sum($"value_int").as("sum_value_int"))
      .orderBy($"event_date")
  }

  val qTypeCastOracle: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS event_date, count(*) AS n,
      | CAST(sum(CAST(trunc(value) AS INT)) AS BIGINT) AS sum_value_int
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Categorical value mapping (unmapped values pass through). */
  def qCatMap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val mapping = Seq("click" -> "Click", "purchase" -> "Purchase", "signup" -> "Signup")
    Tables.events(s, d)
      .withColumn("event_type_mapped", Prep.mapValues($"event_type", mapping))
      .groupBy($"event_type_mapped")
      .agg(count(lit(1)).as("n"))
      .orderBy($"event_type_mapped")
  }

  val qCatMapOracle: String =
    """SELECT CASE event_type WHEN 'click' THEN 'Click' WHEN 'purchase' THEN 'Purchase'
      |        WHEN 'signup' THEN 'Signup' ELSE event_type END AS event_type_mapped,
      | count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Class-label mapping to expressive names. */
  def qLabelMap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val mapping = Seq("O" -> "Open", "F" -> "Fulfilled", "P" -> "Pending")
    Tables.orders(s, d)
      .withColumn("status_label", Prep.mapValues($"o_orderstatus", mapping))
      .groupBy($"status_label")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"status_label")
  }

  val qLabelMapOracle: String =
    """SELECT CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Fulfilled'
      |        WHEN 'P' THEN 'Pending' ELSE o_orderstatus END AS status_label,
      | count(*) AS n, round(sum(o_totalprice),2) AS total
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Class distribution: counts + percentages. */
  def qClassDist(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Prep.classDistribution(Tables.embeddings(s, d), "label").orderBy($"label")
  }

  val qClassDistOracle: String =
    """SELECT label, count(*) AS n,
      | round(100.0 * count(*) / sum(count(*)) OVER (), 2) AS pct
      |FROM embeddings GROUP BY label ORDER BY label""".stripMargin

  // ---- 2.2 splits ---------------------------------------------------------

  /** Time-based split audit: per-split row counts and time bounds. */
  def qSplitTime(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (train, test) = Splits.timeSplit(Tables.events(s, d), "ts", "2024-01-16 00:00:00")
    def summary(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as("n"),
          min(unix_timestamp($"ts")).as("min_ts_s"),
          max(unix_timestamp($"ts")).as("max_ts_s"))
        .select(lit(name).as("split"), $"n", $"min_ts_s", $"max_ts_s")
    summary(train, "train").unionAll(summary(test, "test")).orderBy($"split")
  }

  val qSplitTimeOracle: String =
    """SELECT 'train' AS split, count(*) AS n,
      | CAST(floor(epoch(min(ts))) AS BIGINT) AS min_ts_s,
      | CAST(floor(epoch(max(ts))) AS BIGINT) AS max_ts_s
      |FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
      |UNION ALL
      |SELECT 'test', count(*),
      | CAST(floor(epoch(min(ts))) AS BIGINT),
      | CAST(floor(epoch(max(ts))) AS BIGINT)
      |FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
      |ORDER BY split""".stripMargin

  /** Deterministic hash split with per-class stratification audit. */
  def qSplitHash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (train, test) = Splits.hashSplit(Tables.events(s, d), "event_id", 10, 8)
    def byType(df: DataFrame, name: String) =
      df.groupBy($"event_type").agg(count(lit(1)).as("n"))
        .select(lit(name).as("split"), $"event_type", $"n")
    byType(train, "train").unionAll(byType(test, "test")).orderBy($"split", $"event_type")
  }

  val qSplitHashOracle: String =
    """SELECT 'train' AS split, event_type, count(*) AS n FROM events
      |WHERE event_id % 10 < 8 GROUP BY event_type
      |UNION ALL
      |SELECT 'test', event_type, count(*) FROM events
      |WHERE event_id % 10 >= 8 GROUP BY event_type
      |ORDER BY split, event_type""".stripMargin

  /** Split-disjointness audit: distinct-key overlap between halves. */
  def qSplitDisjoint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (train, test) = Splits.hashSplit(Tables.events(s, d), "user_id", 10, 8)
    val overlap = train.select($"user_id").distinct()
      .join(test.select($"user_id").distinct(), Seq("user_id"), "inner")
      .agg(count(lit(1)).as("n_overlap"))
    val nTrain = train.agg(countDistinct($"user_id").as("n_train_keys"))
    val nTest = test.agg(countDistinct($"user_id").as("n_test_keys"))
    overlap.crossJoin(nTrain).crossJoin(nTest)
  }

  val qSplitDisjointOracle: String =
    """SELECT
      | (SELECT count(*) FROM
      |   (SELECT DISTINCT user_id FROM events WHERE user_id % 10 < 8) a
      |   JOIN (SELECT DISTINCT user_id FROM events WHERE user_id % 10 >= 8) b USING (user_id)
      | ) AS n_overlap,
      | (SELECT count(DISTINCT user_id) FROM events WHERE user_id % 10 < 8) AS n_train_keys,
      | (SELECT count(DISTINCT user_id) FROM events WHERE user_id % 10 >= 8) AS n_test_keys""".stripMargin

  /** Semi/anti-join audit: customers with vs without orders, by segment
    * (EXISTS / NOT EXISTS re-expressed as left_semi / left_anti —
    * Spark's shuffle-free-on-broadcast exists-join forms).
    */
  def qSemiAnti(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select($"o_custkey")
    val withO = c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_with_orders"))
    val withoutO = c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_without_orders"))
    withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
      .select($"c_mktsegment",
        coalesce($"n_with_orders", lit(0L)).as("n_with_orders"),
        coalesce($"n_without_orders", lit(0L)).as("n_without_orders"))
      .orderBy($"c_mktsegment")
  }

  val qSemiAntiOracle: String =
    """SELECT c_mktsegment,
      | CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders,
      | CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS n_without_orders
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Pivot: order-status × order-priority count matrix (explicit pivot
    * values keep the schema deterministic).
    */
  def qPivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    Tables.orders(s, d)
      .groupBy($"o_orderstatus")
      .pivot("o_orderpriority", prios)
      .agg(count(lit(1)))
      .select($"o_orderstatus" +: prios.map(p =>
        coalesce(col(s"`$p`"), lit(0L)).as("prio_" + p.replaceAll("[^A-Za-z0-9]+", "_"))): _*)
      .orderBy($"o_orderstatus")
  }

  val qPivotOracle: String =
    """SELECT o_orderstatus,
      | CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS prio_1_URGENT,
      | CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS prio_2_HIGH,
      | CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS prio_3_MEDIUM,
      | CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS prio_4_NOT_SPECIFIED,
      | CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS prio_5_LOW
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Rolling window: 4-event moving average of value per user,
    * summarized per user (window over floored-second order for
    * cross-engine ordering parity).
    */
  def qMovingAvg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val src = Tables.events(s, d)
    // skew-adaptive ROWS-frame window (SaltedRuns.chunkedRowsAgg): with
    // no hot keys this IS the r13 pinned single-level window (plus one
    // 1% sample probe); a zipf-head user's frame otherwise runs as ONE
    // unsplittable partition (r14 sf10skew measured 7.3 vs 3.1 s
    // uniform — 2M of 10M events on user 1, one core)
    graft.operators.SaltedRuns.chunkedRowsAgg(
        src, "user_id", unix_timestamp($"ts"), Seq($"event_id"), k = 3,
        w => avg($"value").over(w), "mavg")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        (round(avg($"mavg"), 4) + lit(0.0)).as("avg_mavg"),
        (round(max($"mavg"), 4) + lit(0.0)).as("max_mavg"))
      .orderBy($"user_id")
  }

  val qMovingAvgOracle: String =
    """WITH m AS (SELECT user_id, avg(value) OVER (
      |   PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id
      |   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mavg
      | FROM events)
      |SELECT user_id, count(*) AS n,
      | round(avg(mavg),4) + 0 AS avg_mavg,
      | round(max(mavg),4) + 0 AS max_mavg
      |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Rollup: subtotals + grand total over (status, priority) with
    * grouping flags (multi-level aggregation pushdown shape).
    */
  def qRollup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), (round(sum($"o_totalprice"), 2) + lit(0.0)).as("total"))
      .select(
        coalesce($"o_orderstatus", lit("<all>")).as("status"),
        coalesce($"o_orderpriority", lit("<all>")).as("priority"),
        $"n", $"total")
      .orderBy($"status", $"priority")
  }

  val qRollupOracle: String =
    """SELECT coalesce(o_orderstatus, '<all>') AS status,
      | coalesce(o_orderpriority, '<all>') AS priority,
      | count(*) AS n, round(sum(o_totalprice),2) + 0 AS total
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Set operations between the user populations of two time halves:
    * union / intersect / except cardinalities in one row.
    */
  def qSetOps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val cut = to_timestamp(lit("2024-01-16 00:00:00"))
    val a = ev.filter($"ts" < cut).select($"user_id").distinct()
    val b = ev.filter($"ts" >= cut).select($"user_id").distinct()
    a.union(b).distinct().agg(count(lit(1)).as("n_union"))
      .crossJoin(a.intersect(b).agg(count(lit(1)).as("n_intersect")))
      .crossJoin(a.except(b).agg(count(lit(1)).as("n_a_only")))
      .crossJoin(b.except(a).agg(count(lit(1)).as("n_b_only")))
  }

  val qSetOpsOracle: String =
    """WITH a AS (SELECT DISTINCT user_id FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
      |b AS (SELECT DISTINCT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00')
      |SELECT
      | (SELECT count(*) FROM (SELECT user_id FROM a UNION SELECT user_id FROM b)) AS n_union,
      | (SELECT count(*) FROM (SELECT user_id FROM a INTERSECT SELECT user_id FROM b)) AS n_intersect,
      | (SELECT count(*) FROM (SELECT user_id FROM a EXCEPT SELECT user_id FROM b)) AS n_a_only,
      | (SELECT count(*) FROM (SELECT user_id FROM b EXCEPT SELECT user_id FROM a)) AS n_b_only""".stripMargin

  /** Datetime-part extraction: per (day-of-week, hour-bucket) rollup. */
  def qDatetimeParts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(dayofweek($"ts").as("dow"), (hour($"ts") - hour($"ts") % 6).as("hour_bucket"), $"value")
      .groupBy($"dow", $"hour_bucket")
      .agg(count(lit(1)).as("n"), (round(sum($"value"), 2) + lit(0.0)).as("sum_value"))
      .orderBy($"dow", $"hour_bucket")
  }

  val qDatetimePartsOracle: String =
    """SELECT dayofweek(ts) + 1 AS dow,
      | CAST(hour(ts) - hour(ts) % 6 AS INT) AS hour_bucket,
      | count(*) AS n, round(sum(value),2) + 0 AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** JSON column extraction: parse props '{"k": N}' and aggregate. */
  def qJsonExtract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(get_json_object($"props", "$.k").cast("int").as("k"), $"value")
      .withColumn("k_bucket", ($"k" - $"k" % 20).cast("int"))
      .groupBy($"k_bucket")
      .agg(count(lit(1)).as("n"), (round(sum($"value"), 2) + lit(0.0)).as("sum_value"))
      .orderBy($"k_bucket")
  }

  val qJsonExtractOracle: String =
    """SELECT CAST(k - k % 20 AS INT) AS k_bucket, count(*) AS n,
      | round(sum(value),2) + 0 AS sum_value
      |FROM (SELECT CAST(json_extract(props, '$.k') AS INT) AS k, value FROM events)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Weekly cohort retention: users grouped by first-active week,
    * counted in each subsequent active week — the classic cohort
    * matrix (two aggregations + a window min, all key-partitioned).
    */
  def qRetention(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val weekly = Tables.events(s, d)
      .select($"user_id", floor(datediff($"ts", to_date(lit("2024-01-01"))) / 7).cast("int").as("week"))
      .distinct()
    val w = Window.partitionBy($"user_id")
    weekly
      .withColumn("cohort", min($"week").over(w))
      .groupBy($"cohort", $"week")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort", $"week")
  }

  val qRetentionOracle: String =
    """WITH weekly AS (
      | SELECT DISTINCT user_id,
      |  CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7.0) AS INT) AS week
      | FROM events),
      |c AS (SELECT user_id, week, min(week) OVER (PARTITION BY user_id) AS cohort FROM weekly)
      |SELECT cohort, week, count(DISTINCT user_id) AS n_users
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val all: Map[String, Q] = Map(
    "q_json_extract" -> qJsonExtract,
    "q_retention" -> qRetention,
    "q_setops" -> qSetOps,
    "q_datetime_parts" -> qDatetimeParts,
    "q_moving_avg" -> qMovingAvg,
    "q_rollup" -> qRollup,
    "q_semi_anti" -> qSemiAnti,
    "q_pivot" -> qPivot,
    "q1_pricing_summary" -> q1PricingSummary,
    "q2_revenue_nation" -> q2RevenueNation,
    "q3_top_orders" -> q3TopOrders,
    "q4_window_topn" -> q4WindowTopN,
    "q_missing_norm" -> qMissingNorm,
    "q_dedup_pk" -> qDedupPk,
    "q_dup_check" -> qDupCheck,
    "q_high_nan_cols" -> qHighNanCols,
    "q_type_cast" -> qTypeCast,
    "q_cat_map" -> qCatMap,
    "q_label_map" -> qLabelMap,
    "q_class_dist" -> qClassDist,
    "q_split_time" -> qSplitTime,
    "q_split_hash" -> qSplitHash,
    "q_split_disjoint" -> qSplitDisjoint
  )

  val oracles: Map[String, String] = Map(
    "q_json_extract" -> qJsonExtractOracle,
    "q_retention" -> qRetentionOracle,
    "q_setops" -> qSetOpsOracle,
    "q_datetime_parts" -> qDatetimePartsOracle,
    "q_moving_avg" -> qMovingAvgOracle,
    "q_rollup" -> qRollupOracle,
    "q_semi_anti" -> qSemiAntiOracle,
    "q_pivot" -> qPivotOracle,
    "q1_pricing_summary" -> q1Oracle,
    "q2_revenue_nation" -> q2Oracle,
    "q3_top_orders" -> q3Oracle,
    "q4_window_topn" -> q4Oracle,
    "q_missing_norm" -> qMissingNormOracle,
    "q_dedup_pk" -> qDedupPkOracle,
    "q_dup_check" -> qDupCheckOracle,
    "q_high_nan_cols" -> qHighNanColsOracle,
    "q_type_cast" -> qTypeCastOracle,
    "q_cat_map" -> qCatMapOracle,
    "q_label_map" -> qLabelMapOracle,
    "q_class_dist" -> qClassDistOracle,
    "q_split_time" -> qSplitTimeOracle,
    "q_split_hash" -> qSplitHashOracle,
    "q_split_disjoint" -> qSplitDisjointOracle
  )
}
