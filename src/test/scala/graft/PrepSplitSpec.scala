package graft

import org.apache.spark.sql.functions._
import graft.prep.Prep
import graft.split.Splits

class PrepSplitSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeMissing maps blank + tokens to null, keeps values") {
    val df = Seq("ok", "  ", "N/A", "null", "?", "fine").toDF("v")
    val out = Prep.normalizeMissing(df, Seq("v")).collect().map(_.isNullAt(0))
    assert(out.toSeq == Seq(false, true, true, true, true, false))
  }

  test("dedupByKeyKeepLatest keeps the max-order row per key") {
    val df = Seq((1, 10, "old"), (1, 20, "new"), (2, 5, "only")).toDF("k", "ord", "v")
    val out = Prep.dedupByKeyKeepLatest(df, Seq("k"), Seq($"ord".desc))
      .orderBy($"k").collect().map(r => (r.getInt(0), r.getString(2))).toSeq
    assert(out == Seq((1, "new"), (2, "only")))
  }

  test("duplicateKeyAudit reports only keys with multiplicity > 1") {
    val df = Seq(1, 1, 2, 3, 3, 3).toDF("k")
    val out = Prep.duplicateKeyAudit(df, Seq("k")).orderBy($"k")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(out == Seq((1, 2L), (3, 3L)))
  }

  test("nullFractionProfile flags high-NaN columns at threshold") {
    val df = Seq((Some(1), Some("a")), (None, Some("b")), (None, Some("c")), (None, None))
      .toDF("num", "str")
    val out = Prep.nullFractionProfile(df, Seq("num", "str"), 0.5)
      .orderBy($"column_name").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2))).toSeq
    assert(out == Seq(("num", 0.75, 1), ("str", 0.25, 0)))
  }

  test("profiler reports per-column stats in one pass") {
    val df = Seq((Some(1), Some("a")), (None, Some("b")), (Some(3), Some("b")))
      .toDF("num", "cat")
    val p = graft.prep.Profiler.profile(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    assert(p("num") == ((1L, 2L)) && p("cat") == ((0L, 2L)))
    val full = graft.prep.Profiler.profile(Tables.customer(spark, sf))
    assert(full.count() == 5) // one row per column
    val byCol = full.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byCol.values.forall(_ == 0L)) // customer has no nulls
  }

  test("timeSplit halves are a partition of the data") {
    val ev = Tables.events(spark, sf)
    val (train, test) = Splits.timeSplit(ev, "ts", "2024-01-16 00:00:00")
    assert(train.count() + test.count() == ev.count())
    assert(train.agg(max($"ts")).head().getTimestamp(0)
      .before(test.agg(min($"ts")).head().getTimestamp(0)))
  }

  test("stratifiedRandomSplit preserves class ratio and is disjoint") {
    val ev = Tables.events(spark, sf).select($"event_id", $"event_type")
    val (train, test) = Splits.stratifiedRandomSplit(ev, "event_type", "event_id", 0.8, 42L)
    assert(Splits.overlapCount(train, test, "event_id") == 0)
    val n = ev.count().toDouble
    val frac = train.count() / n
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
    // per-class fraction close to global fraction (stratification)
    val byClass = train.groupBy("event_type").count()
      .join(ev.groupBy("event_type").count().withColumnRenamed("count", "total"), "event_type")
      .withColumn("f", $"count" / $"total").select("f").collect().map(_.getDouble(0))
    assert(byClass.forall(f => f > 0.7 && f < 0.9), byClass.mkString(","))
  }

  test("validation + calibration carve-outs are pairwise disjoint") {
    val ev = Tables.events(spark, sf).select($"event_id", $"event_type")
    val (train0, _) = Splits.stratifiedRandomSplit(ev, "event_type", "event_id", 0.8, 42L)
    val (train1, valid) = Splits.carveOut(train0, "event_type", "event_id", 0.8, 43L)
    val (train2, calib) = Splits.carveOut(train1, "event_type", "event_id", 0.8, 44L)
    assert(Splits.overlapCount(train2, valid, "event_id") == 0)
    assert(Splits.overlapCount(train2, calib, "event_id") == 0)
    assert(Splits.overlapCount(valid, calib, "event_id") == 0)
    assert(train2.count() + valid.count() + calib.count() == train0.count())
  }

  test("hashSplit is deterministic and disjoint") {
    val ev = Tables.events(spark, sf)
    val (t1, _) = Splits.hashSplit(ev, "event_id", 10, 8)
    val (t2, te2) = Splits.hashSplit(ev, "event_id", 10, 8)
    assert(t1.count() == t2.count())
    assert(Splits.overlapCount(t1, te2, "event_id") == 0)
  }

  test("bucketed band join equals the theta-join reference") {
    import graft.operators.RangeJoin
    val rnd = new scala.util.Random(7)
    val anchors = (1 to 40).map(i => (i, rnd.nextLong().abs % 1000)).toDF("aid", "a_pt")
    val probes = (1 to 400).map(i => (i, rnd.nextLong().abs % 1000)).toDF("pid", "p_pt")
    val got = RangeJoin.bandJoin(anchors, probes, $"a_pt", $"p_pt", 50L)
      .select($"aid", $"pid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val want = anchors.join(probes, $"p_pt" >= $"a_pt" && $"p_pt" < $"a_pt" + 50)
      .select($"aid", $"pid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got == want && want.nonEmpty)
    // negative domain: floor-division bucketing must stay correct
    val an = Seq((1, -120L), (2, -49L)).toDF("aid", "a_pt")
    val pn = Seq((1, -100L), (2, -120L), (3, -1L), (4, 0L)).toDF("pid", "p_pt")
    val gotN = RangeJoin.bandJoin(an, pn, $"a_pt", $"p_pt", 50L)
      .select($"aid", $"pid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val wantN = an.join(pn, $"p_pt" >= $"a_pt" && $"p_pt" < $"a_pt" + 50)
      .select($"aid", $"pid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(gotN == wantN)
  }
}
