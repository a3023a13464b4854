package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental SCD2 (type-2 slowly-changing-dimension) maintenance —
  * the MERGE-shaped warehouse operation users run constantly: apply a
  * change batch to an EXISTING dimension without rebuilding it. The
  * dimension schema is the [[graft.queries.CoreQueries2.qScd2]] output
  * contract: (key, version, priority, valid_from_s, valid_to_s,
  * n_orders) with exactly one CURRENT row per key (valid_to_s =
  * [[Sentinel]]).
  *
  * Scale shape: untouched keys NEVER shuffle — the stored dimension is
  * scanned exactly TWICE (r16; was four times), map-side both times: a
  * broadcast left join on the (bounded, change-batch-sized) first-run
  * frame tags each row and the close/absorb arithmetic rides
  * conditionally on touched current rows, everything else passing
  * through unchanged; the second scan builds the (touched keys only)
  * version lookup the appended runs broadcast. Only the change batch
  * itself is windowed (run collapse). At 100 TB the dimension is the
  * big side and the nightly change batch the small one; the rebuild
  * alternative re-windows every key's full history.
  *
  * Reference semantics: the reference's pandas stack rebuilds
  * per-entity orderings wholesale (feature_engineering.py) — the
  * incremental contract is the warehouse-native extension.
  */
object Scd2 {

  /** qScd2's far-future valid_to for current rows (9999-01-01 UTC). */
  val Sentinel = 253402300800L

  /** Apply `changes` (raw change events: `keyCol`, a date-seconds
    * expression, a unique tiebreak, `valueCol`) to `dim`.
    *
    * CONTRACT: every change event of a key is STRICTLY LATER (by
    * `dateSec`) than all events already folded into that key's
    * dimension rows — the append-in-time-order shape of warehouse
    * loads. Late-arriving events need the rebuild path; interleaving
    * them incrementally would require reopening closed intervals.
    * With `validate = true` (default) the contract is CHECKED, not
    * trusted — at ZERO extra scans: the output's valid_to_s column
    * carries a per-row `raise_error` comparing each touched key's
    * `min(change dateSec)` (the first run's start, already computed)
    * against its folded `max(valid_from_s)` (the current row's
    * valid_from_s — intervals start in increasing order), so a
    * violating batch fails the job loudly, naming the key, before any
    * output commits (r15: the first, eager two-scan guard cost
    * +11.5 s at sf10 and was replaced by this in-pass form). The
    * guard fires on every consumer that EVALUATES the output (all
    * writes, collect, downstream transforms); a bare count() prunes
    * the select list and skips it — count a projected column instead.
    * `maxTouchedKeys` — the documented bound behind the touched-key
    * broadcast (a change batch touching tens of millions of keys
    * belongs on the rebuild path, not in a driver-melting broadcast) —
    * stays an EAGER one-aggregate check over the change batch alone,
    * because it must fire before the broadcast materializes; pass
    * Long.MaxValue to waive it (declared rebuild-equality seats).
    * `validate = false` skips the contract check only — the broadcast
    * cap holds regardless, since it protects the driver, not the data.
    *
    * Per touched key: collapse the change batch into runs; if the
    * first run continues the current row's value, the current row
    * absorbs it (n_orders grows, valid_to moves to the second run's
    * start or stays current); otherwise the current row closes at the
    * first run's start. Later runs append with versions continuing the
    * key's numbering. Keys new to the dimension build from scratch.
    * The result equals a full rebuild over base ∪ changes row-for-row
    * (spec'd, and oracle-checked by q_scd2_apply).
    */
  def applyChanges(dim: DataFrame, changes: DataFrame, keyCol: String,
      dateSec: Column, tieCol: Column, valueCol: String,
      validate: Boolean = true, maxTouchedKeys: Long = 10000000L,
      hotOverride: Option[Seq[Any]] = None): DataFrame = {
    val k = col(keyCol)
    // the cap is INDEPENDENT of `validate` (r16): validate governs only
    // the strictly-later contract guard; the broadcast bound protects
    // the driver and must hold even for trusted batches. Waive it
    // explicitly with Long.MaxValue (declared rebuild-equality seats).
    if (maxTouchedKeys < Long.MaxValue) {
      // the CAP must run eagerly — it protects the broadcasts below,
      // which would have materialized before any lazy check fires.
      // One aggregate job over the change batch alone; no dim scan.
      val nTouched = changes.select(k).distinct().count()
      require(nTouched <= maxTouchedKeys,
        s"Scd2.applyChanges: change batch touches $nTouched keys > " +
          s"maxTouchedKeys=$maxTouchedKeys — the touched-key broadcast would " +
          "not be batch-bounded; use the full rebuild path (or raise the cap)")
    }
    // run-collapse the change batch. SKEW-ADAPTIVE since r17: the
    // window and the valid_to lead ride SaltedRuns (probe-and-gate — a
    // 1% sample detects hot keys; with none, the plan is EXACTLY the
    // old single-level window). The key-count cap bounds KEYS, not
    // rows: a contract-respecting batch can still carry one zipf-head
    // key whose stream is an unsplittable window partition (the r16
    // sf100skew waived seat jstack'd a 548 s single-task sort).
    // Null-safety rides SaltedRuns' struct-wrapped lag (a lagged
    // struct is null iff there IS no previous row) + the null-safe
    // <=> predicate — consistent with `merged` below.
    // `hotOverride` (r18, VERDICT r17 #6): a caller that already
    // probed a SUPERSET of both frames (qScd2Apply probes the full
    // orders scan once) skips BOTH sample jobs here — the change-batch
    // probe and, on the waived path, the dimension probe. The list
    // must cover the DIMENSION's heads too, not just the batch's: it
    // feeds the waived-path hot-key-split joins below. Superset lists
    // are safe over-approximations (per-key cardinality only shrinks
    // under subsets; false positives pay small bounded overhead).
    val changesDs = changes.withColumn("__ds", dateSec)
    val hot = hotOverride.getOrElse(SaltedRuns.detectHotKeys(changesDs, keyCol))
    val runs = SaltedRuns.numbered(changesDs, keyCol, col("__ds"),
      Seq(tieCol), Seq(col(valueCol)),
      (p, c) => !(p.getField(valueCol) <=> c.getField(valueCol)),
      "__lv", buckets = 32, hotOverride = Some(hot))
    // hot branch only: pinned exchange under the agg (the scd2Of
    // lesson — salted runs arrive hash(key, bucket) partitioned and
    // the agg re-exchanges anyway; unpinned reads bytes-coalesce)
    val gIn = if (hot.nonEmpty)
      runs.repartition(GlobalRank.rangeWidth(changesDs), k, col("__lv"), col(valueCol))
    else runs
    // CACHED (r18): the collapsed-runs frame has THREE consumers below
    // (`first` → mainPass, `curInfo`'s join build, and `appended`'s
    // left side), and exchange reuse does NOT collapse them — an r18
    // sf100skew stage profile showed the change-batch scan + window
    // pipeline executing FOUR times inside the one action (four ~48-task
    // scan stages writing 1.4-1.8 GB of shuffle each, plus duplicated
    // window stages), the dominant wall term of the waived seat and a
    // 3× amplifier of any disk-throughput dip. persist (columnar,
    // MEMORY_AND_DISK) turns the three plan copies into one
    // InMemoryRelation computed once — still lazy (no eager barrier),
    // and bounded: O(runs in the change batch) rows, the operator's
    // own contract size (a batch too big to cache belongs on the
    // rebuild path). The ContextCleaner reclaims the blocks once the
    // returned frame is unreferenced.
    val newRuns = SaltedRuns.chunkedLead(
      gIn.groupBy(k, col("__lv"), col(valueCol))
        .agg(min(col("__ds")).as("__from"), count(lit(1)).as("__n")),
      keyCol, col("__lv"), col("__from"), "__toN", hotOverride = Some(hot))
      .withColumn("__to", coalesce(col("__toN"), lit(Sentinel)))
      .drop("__toN")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per touched key: its first change run, plus a non-null touch
    // marker (valueCol may be nullable — __fv can't flag the match)
    val first = newRuns.filter(col("__lv") === 1)
      .select(k, col(valueCol).as("__fv"), col("__from").as("__ffrom"),
        col("__to").as("__fto"), col("__n").as("__fn"))
      .withColumn("__tch", lit(true))
    // ONE pass over the stored dimension (r16; the previous shape
    // scanned it FOUR times — untouched anti-join, history, current,
    // and the appended join's broadcast build each re-scanned dim,
    // measured 13.5 s vs 63.4 s rebuild at sf100): a broadcast left
    // join against the (bounded, change-batch-sized) first-run frame
    // tags each row, and the close/absorb arithmetic rides
    // conditionally on the touched CURRENT rows only — untouched and
    // historical rows pass through bit-unchanged, map-side, never
    // shuffled. The strictly-later contract guard is unchanged in
    // form (r15): the current row's valid_from_s IS the key's max
    // folded valid_from_s (intervals start in increasing order), and
    // __ffrom is the key's min change date, so the violation
    // predicate needs no extra data. It rides an OUTPUT column
    // (raise_error inside valid_to_s) so column pruning cannot drop
    // it, and fails the job per violating row, naming the key, before
    // any output commits.
    // broadcast is the CONTRACT shape only under the cap: a waived cap
    // (Long.MaxValue — the declared rebuild-equality seats) means the
    // touched set is corpus-scale, and hinting it into a broadcast
    // melts the driver (caught live: the r16 sf100skew sweep OOMed
    // q_scd2_apply's 15M-key first-run broadcast). Unhinted, AQE
    // broadcasts small batches anyway and shuffles the huge ones —
    // the right plan for a batch that is really a rebuild.
    val waived = maxTouchedKeys == Long.MaxValue
    val bc: DataFrame => DataFrame = if (!waived) broadcast else identity
    // The waived path's shuffled left joins put every hot key's
    // dimension/run rows into ONE SMJ reducer (the r16 sf100skew
    // stall). The right side of both joins is ≤1 row per key, so its
    // HOT slice is ≤64 rows (detectHotKeys caps the list): broadcast
    // that slice and shuffle only cold keys. Exact: keys live wholly
    // in one branch. Hot keys are probed on BOTH frames — the change
    // batch (appended join's left) and the dimension (mainPass's
    // left), whose heads need not coincide.
    val hotJoin =
      if (!waived) Nil
      else hotOverride.getOrElse(
        (hot ++ SaltedRuns.detectHotKeys(dim, keyCol)).distinct)
    def leftJoin(l: DataFrame, r: DataFrame): DataFrame =
      if (!waived) l.join(broadcast(r), Seq(keyCol), "left")
      else if (hotJoin.isEmpty) l.join(r, Seq(keyCol), "left")
      else {
        val isHot = coalesce(k.isInCollection(hotJoin), lit(false))
        l.filter(!isHot).join(r.filter(!isHot), Seq(keyCol), "left")
          .unionByName(
            l.filter(isHot).join(broadcast(r.filter(isHot)), Seq(keyCol), "left"))
      }
    val isCur = col("__tch").isNotNull && col("valid_to_s") === Sentinel
    // null-safe (r17): with a nullable valueCol, null===null yields
    // null — mainPass would close the current row (otherwise branch)
    // while the appended filter `!__merged` evaluates null and drops
    // the __lv==1 run, losing the interval. <=> makes null continue a
    // null run, consistent with __chg's run-collapse above.
    val merged = col("priority") <=> col("__fv")
    val closedOrAbsorbed = when(merged, col("__fto")).otherwise(col("__ffrom"))
    val vtoTouched =
      if (!validate) closedOrAbsorbed
      else when(col("__ffrom") <= col("valid_from_s"),
        raise_error(concat(
          lit("Scd2.applyChanges: strictly-later contract violated for key "),
          k.cast("string"),
          lit(" (min change date <= the key's folded max valid_from_s); " +
            "late-arriving events need the rebuild path"))))
        .otherwise(closedOrAbsorbed)
    val mainPass = leftJoin(dim, first)
      .select(k, col("version"), col("priority"), col("valid_from_s"),
        when(isCur, vtoTouched).otherwise(col("valid_to_s")).as("valid_to_s"),
        when(isCur && merged, col("n_orders") + col("__fn"))
          .otherwise(col("n_orders")).as("n_orders"))
    // appended runs: versions continue the key's numbering; a merged
    // first run is already absorbed into the current row, so it is
    // skipped. The version/merged lookup needs the touched keys'
    // current rows — the SECOND (and last) dim scan; its broadcast
    // build reuses mainPass's first-frame exchange (ReuseExchange).
    val curInfo = dim.filter(col("valid_to_s") === Sentinel)
      .join(bc(first), Seq(keyCol))
      .select(k, col("version").as("__cv"), merged.as("__merged"))
    val appended = leftJoin(newRuns, curInfo)
      .filter(col("__cv").isNull || !col("__merged") || col("__lv") >= 2)
      .select(k,
        (coalesce(col("__cv"), lit(0L)) +
          when(coalesce(col("__merged"), lit(false)), col("__lv") - 1)
            .otherwise(col("__lv"))).as("version"),
        col(valueCol).as("priority"), col("__from").as("valid_from_s"),
        col("__to").as("valid_to_s"), col("__n").as("n_orders"))
    mainPass.unionByName(appended)
  }
}
