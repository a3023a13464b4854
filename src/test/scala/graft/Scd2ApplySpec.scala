package graft

import org.apache.spark.sql.functions._

import graft.operators.Scd2

/** Incremental SCD2 maintenance (Scd2.applyChanges): increment must
  * equal rebuild row-for-row, untouched keys must ride a map-side
  * broadcast anti-join (the touched-keys-only shuffle contract).
  */
class Scd2ApplySpec extends SparkSpec {
  import spark.implicits._

  // (key, tiebreak, dateSec, value) change events
  private def dimOf(events: Seq[(Long, Long, Long, String)]): org.apache.spark.sql.DataFrame =
    dimOfDf(events.toDF("k", "tie", "ds", "v"))

  private def dimOfDf(df: org.apache.spark.sql.DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"ds", $"tie")
    val runs = df
      // null-safe run collapse, mirroring the operator's contract: a
      // null value continues a null run and breaks a non-null one
      .withColumn("chg", when(row_number().over(w) === 1 ||
        !(lag($"v", 1).over(w) <=> $"v"), 1L).otherwise(0L))
      .withColumn("version", sum($"chg").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"version")
    runs.groupBy($"k", $"version", $"v")
      .agg(min($"ds").as("valid_from_s"), count(lit(1)).as("n_orders"))
      .withColumn("valid_to_s",
        coalesce(lead($"valid_from_s", 1).over(wl), lit(Scd2.Sentinel)))
      .select($"k", $"version", $"v".as("priority"),
        $"valid_from_s", $"valid_to_s", $"n_orders")
  }

  // base: key 1 two runs (a then b), key 2 one run, key 3 untouched
  private val base = Seq(
    (1L, 1L, 100L, "a"), (1L, 2L, 200L, "a"), (1L, 3L, 300L, "b"),
    (2L, 4L, 100L, "x"),
    (3L, 5L, 100L, "z"), (3L, 6L, 400L, "w"))
  // changes, all strictly later: key 1 CONTINUES run b then flips to c
  // (merge + append), key 2 flips immediately (close + append), key 9
  // is NEW (no dim rows)
  private val changes = Seq(
    (1L, 7L, 500L, "b"), (1L, 8L, 600L, "c"),
    (2L, 9L, 500L, "y"), (2L, 10L, 700L, "y"),
    (9L, 11L, 500L, "n"), (9L, 12L, 600L, "m"))

  private def applied = Scd2.applyChanges(
    dimOf(base), changes.toDF("k", "tie", "ds", "v"),
    "k", $"ds", $"tie", "v")

  test("increment equals rebuild row-for-row (merge, close, new key, untouched)") {
    val rebuilt = dimOf(base ++ changes)
    val inc = applied.select(rebuilt.columns.map(col): _*)
    assert(inc.except(rebuilt).isEmpty && rebuilt.except(inc).isEmpty,
      s"increment diverges from rebuild:\ninc=${inc.orderBy($"k", $"version").collect().mkString("\n")}" +
        s"\nrebuilt=${rebuilt.orderBy($"k", $"version").collect().mkString("\n")}")
    // spot-pin the merge: key 1's run b absorbed the change event
    val k1v2 = applied.filter($"k" === 1 && $"version" === 2).collect().head
    assert(k1v2.getAs[Long]("n_orders") === 2L, "merged run must count both events")
    assert(k1v2.getAs[Long]("valid_to_s") === 600L, "merged run closes at the next run")
    // untouched key 3 is bit-identical to its dim rows
    val dim3 = dimOf(base).filter($"k" === 3).collect().toSet
    assert(applied.filter($"k" === 3).collect().toSet == dim3)
  }

  test("strictly-later contract violation fails the job loudly, naming the key") {
    // key 1's folded history reaches ds=300; a change at ds=250 is a
    // late arrival — silently applying it would corrupt the dimension.
    // The guard rides the output's valid_to_s column (zero extra
    // scans), so it fires when the result executes, before any commit
    def allMsgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + "\n" + allMsgs(t.getCause)
    val late = Seq((1L, 20L, 250L, "c"), (2L, 21L, 500L, "y"))
      .toDF("k", "tie", "ds", "v")
    // collect(), not count(): count prunes every select-list column
    // including the guard (the Bench noop-write lesson at the action
    // level) — any consumer that READS the output fires it
    val e = intercept[Exception] {
      Scd2.applyChanges(dimOf(base), late, "k", $"ds", $"tie", "v").collect()
    }
    assert(allMsgs(e).contains("strictly-later") && allMsgs(e).contains("key 1"),
      s"must name the violating key: ${allMsgs(e).take(600)}")
    // boundary: a change at EXACTLY the folded max is also a violation
    val tied = Seq((1L, 22L, 300L, "c")).toDF("k", "tie", "ds", "v")
    val e2 = intercept[Exception] {
      Scd2.applyChanges(dimOf(base), tied, "k", $"ds", $"tie", "v").collect()
    }
    assert(allMsgs(e2).contains("strictly-later"), allMsgs(e2).take(600))
    // validate=false trusts the caller (the documented escape hatch)
    assert(Scd2.applyChanges(dimOf(base), tied, "k", $"ds", $"tie", "v",
      validate = false).count() > 0)
  }

  test("null-valued runs survive merge, close, and append (null-safe <=>)") {
    // valueCol is nullable: key 1's CURRENT run is null and the first
    // change continues it (null-merge), then flips to "c"; key 2's
    // current null run closes against "y". Before r17 the =!= / ===
    // predicates returned null here — mainPass closed the row while
    // the appended filter dropped the __lv==1 run, losing an interval.
    val baseN = Seq(
      (1L, 1L, 100L, Option("a")), (1L, 2L, 300L, Option.empty[String]),
      (2L, 3L, 100L, Option.empty[String]))
    val changesN = Seq(
      (1L, 4L, 500L, Option.empty[String]), (1L, 5L, 600L, Option("c")),
      (2L, 6L, 500L, Option("y")))
    val inc = Scd2.applyChanges(
      dimOfDf(baseN.toDF("k", "tie", "ds", "v")),
      changesN.toDF("k", "tie", "ds", "v"), "k", $"ds", $"tie", "v")
    val rebuilt = dimOfDf((baseN ++ changesN).toDF("k", "tie", "ds", "v"))
    val proj = inc.select(rebuilt.columns.map(col): _*)
    assert(proj.except(rebuilt).isEmpty && rebuilt.except(proj).isEmpty,
      s"null-run increment diverges:\ninc=${proj.orderBy($"k", $"version").collect().mkString("\n")}" +
        s"\nrebuilt=${rebuilt.orderBy($"k", $"version").collect().mkString("\n")}")
    // pin the null-merge: key 1's null run absorbed the null change
    val k1v2 = inc.filter($"k" === 1 && $"version" === 2).collect().head
    assert(k1v2.getAs[Long]("n_orders") === 2L, "null run must absorb the null change")
    assert(k1v2.getAs[Long]("valid_to_s") === 600L)
  }

  test("waived cap (Long.MaxValue) equals the capped path") {
    // the r16 sf100skew OOM lived on exactly this branch: with the cap
    // waived the broadcast hint must NOT apply (identity — AQE picks),
    // and the output must still match the capped path row-for-row.
    val capped = applied
    val waived = Scd2.applyChanges(
      dimOf(base), changes.toDF("k", "tie", "ds", "v"),
      "k", $"ds", $"tie", "v", maxTouchedKeys = Long.MaxValue)
    assert(waived.except(capped).isEmpty && capped.except(waived).isEmpty,
      s"waived-cap path diverges from capped:\n${waived.orderBy($"k", $"version").collect().mkString("\n")}")
  }

  test("touched-key cap guards the broadcast") {
    val e = intercept[IllegalArgumentException] {
      Scd2.applyChanges(dimOf(base), changes.toDF("k", "tie", "ds", "v"),
        "k", $"ds", $"tie", "v", maxTouchedKeys = 2L)
    }
    assert(e.getMessage.contains("maxTouchedKeys"), e.getMessage)
    // the cap is independent of the contract flag: validate=false skips
    // only the strictly-later guard, never the driver-protecting bound
    val e2 = intercept[IllegalArgumentException] {
      Scd2.applyChanges(dimOf(base), changes.toDF("k", "tie", "ds", "v"),
        "k", $"ds", $"tie", "v", validate = false, maxTouchedKeys = 2L)
    }
    assert(e2.getMessage.contains("maxTouchedKeys"), e2.getMessage)
  }

  test("waived-path hot-key split: hot arm broadcasts with thresholds off (r16 stall pin)") {
    // The r16 sf100skew stall was the waived path's shuffled left join
    // putting every hot key's rows into ONE SMJ reducer sort. The r17
    // fix splits hot keys onto an explicit-broadcast arm; this pins the
    // PLAN (VERDICT r17 #8): with both broadcast thresholds disabled —
    // so nothing broadcasts unless hinted — the waived+hot plan must
    // still carry a BroadcastHashJoin (the hot arm's hint) alongside
    // the cold arm's shuffled join, and equal the capped output.
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try {
      val waivedHot = Scd2.applyChanges(
        dimOf(base), changes.toDF("k", "tie", "ds", "v"),
        "k", $"ds", $"tie", "v", maxTouchedKeys = Long.MaxValue,
        hotOverride = Some(Seq(1L)))
      val plan = waivedHot.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        "hot arm must ride the explicit broadcast:\n" + plan.take(1500))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        "cold arm must stay shuffled (split present):\n" + plan.take(1500))
      val capped = applied
      assert(waivedHot.except(capped).isEmpty && capped.except(waivedHot).isEmpty,
        s"hot-split output diverges:\n${waivedHot.orderBy($"k", $"version").collect().mkString("\n")}")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("the dimension rides broadcast joins only — no dimension shuffle") {
    // r16 shape: ONE broadcast LEFT join tags + rewrites touched
    // current rows in the main dimension pass (untouched/history rows
    // pass through map-side), and the appended-runs version lookup is
    // another broadcast build. The dimension must never be the probe
    // of a shuffled join — that would re-exchange the stored table.
    val plan = applied.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftOuter"),
      plan.take(1200))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "the stored dimension must not shuffle:\n" + plan.take(1200))
  }
}
