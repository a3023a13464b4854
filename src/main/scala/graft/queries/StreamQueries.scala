package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal
import graft.streaming.Streams

/** Streaming-semantics and multimodal queries (SURVEY.md §2.8-2.9).
  * The batch results here are definitionally what the streaming
  * variants converge to — StreamsSpec asserts that equivalence on
  * MemoryStream input; these queries gate the shared transforms
  * against DuckDB.
  */
object StreamQueries {
  import CoreQueries.Q

  private def r2(c: Column): Column = round(c, 2) + lit(0.0)
  private def r4(c: Column): Column = round(c, 4) + lit(0.0)

  def qStreamWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Streams.windowedAgg(Tables.events(s, d), "1 hour")
      .select(unix_timestamp($"window_start").as("window_start_s"), $"event_type",
        $"n", r2($"sum_value").as("sum_value"))
      .orderBy($"window_start_s", $"event_type")
  }

  val qStreamWindowOracle: String =
    """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start_s,
      | event_type, count(*) AS n, round(sum(value),2) + 0 AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Hopping-window aggregation (1 h window, 30 min slide): each event
    * lands in exactly 2 overlapping windows. Batch twin of the
    * streaming hoppingAgg — the oracle derives both window starts from
    * the slide-aligned epoch grid (an integer-second grid start s
    * contains ts iff it contains floor(ts), so flooring is exact).
    */
  def qStreamHopping(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Streams.hoppingAgg(Tables.events(s, d), "1 hour", "30 minutes")
      .select(unix_timestamp($"window_start").as("window_start_s"), $"event_type",
        $"n", r2($"sum_value").as("sum_value"))
      .orderBy($"window_start_s", $"event_type")
  }

  val qStreamHoppingOracle: String =
    """WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type, value FROM events),
      |w AS (SELECT unnest([CAST(floor(ts_s / 1800) * 1800 - 1800 AS BIGINT),
      |                     CAST(floor(ts_s / 1800) * 1800 AS BIGINT)]) AS window_start_s,
      |  event_type, value FROM e)
      |SELECT window_start_s, event_type, count(*) AS n,
      | round(sum(value), 2) + 0 AS sum_value
      |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def qSessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Streams.sessionSummary(Tables.events(s, d), 86400L).orderBy($"user_id")
  }

  val qSessionizeOracle: String =
    """WITH x AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
      |l AS (SELECT user_id, ts_s,
      |  lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS prev FROM x)
      |SELECT user_id,
      | CAST(sum(CASE WHEN prev IS NULL OR ts_s - prev > 86400 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
      | count(*) AS n_events
      |FROM l GROUP BY user_id ORDER BY user_id""".stripMargin

  def qMmMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.mediaFromDocuments(Tables.documents(s, d))
      .groupBy($"meta.format".as("format"))
      .agg(count(lit(1)).as("n"), sum(length($"payload")).as("sum_bytes"),
        r4(avg($"meta.width")).as("avg_width"))
      .orderBy($"format")
  }

  val qMmMetaOracle: String =
    """SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'jpg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
      | count(*) AS n,
      | CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
      | round(avg(100 + doc_id % 400),4) + 0 AS avg_width
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** Binary-payload exact dedup — the image-corpus dedup step pinned
    * by oracle: per-format asset counts, distinct payload digests
    * (sha-256 over the raw bytes — the 32-byte key the dedup shuffle
    * rides at 100 TB regardless of asset size), duplicate-asset count
    * and byte totals. One projection + one hash agg; the binary column
    * itself never leaves the map side.
    */
  def qMmDigest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.mediaFromDocuments(Tables.documents(s, d))
      .select($"meta.format".as("format"), sha2($"payload", 256).as("dg"),
        length($"payload").as("nb"))
      .groupBy($"format")
      .agg(count(lit(1)).as("n_assets"),
        countDistinct($"dg").as("n_distinct_payloads"),
        (count(lit(1)) - countDistinct($"dg")).as("n_dup_assets"),
        sum($"nb").as("sum_bytes"))
      .orderBy($"format")
  }

  val qMmDigestOracle: String =
    """SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'jpg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
      | count(*) AS n_assets,
      | count(DISTINCT sha256(text)) AS n_distinct_payloads,
      | count(*) - count(DISTINCT sha256(text)) AS n_dup_assets,
      | CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_bytes
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-user session summary via Spark's NATIVE session_window
    * (dynamic gap-merged groupBy windows) — the declarative sibling of
    * q_sessionize's lag+cumsum (same boundary rule: a new session
    * starts only when the gap EXCEEDS 24 h — session_window merges at
    * exactly prev + gap). Timestamps are floored to seconds FIRST so
    * the merge decisions are integer-exact in both engines; sum of
    * session starts pins every boundary in the oracle hash.
    */
  def qSessionWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, d)
      .select($"user_id", date_trunc("second", $"ts").as("ts"), $"value")
    Streams.sessionWindowAgg(e, "24 hours")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum(unix_timestamp($"session_start")).as("sum_start_s"),
        sum($"n_events").as("n_events"),
        r2(sum($"sum_value")).as("sum_value"))
      .orderBy($"user_id")
  }

  val qSessionWindowOracle: String =
    """WITH x AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, value FROM events),
      |l AS (SELECT user_id, ts_s, value,
      |  lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) AS prev FROM x),
      |m AS (SELECT user_id, ts_s, value,
      |  CASE WHEN prev IS NULL OR ts_s - prev > 86400 THEN 1 ELSE 0 END AS new_s FROM l),
      |c AS (SELECT user_id, ts_s, value,
      |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_s ROWS UNBOUNDED PRECEDING) AS sid FROM m),
      |g AS (SELECT user_id, sid, min(ts_s) AS start_s, count(*) AS ne, sum(value) AS sv
      |      FROM c GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_sessions,
      | CAST(sum(start_s) AS BIGINT) AS sum_start_s,
      | CAST(sum(ne) AS BIGINT) AS n_events,
      | round(sum(sv), 2) + 0 AS sum_value
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Ordered funnel conversion (view → click → purchase): per user,
    * the earliest view, the earliest click AT OR AFTER it, and the
    * earliest purchase at or after that click. Output: stage reach
    * counts + conversion rates.
    *
    * Shape (r16): chained GROUP-BY mins with per-stage joins, not
    * whole-partition window-mins. The previous three stacked
    * `min().over(partitionBy(user))` windows computed per-row values
    * that the very next groupBy collapsed per user — pure waste — and
    * put every hot user's full event set in ONE window task: at
    * sf100skew (20% of 100M events on one user) that straggler read
    * 43.7 s vs 7.1 s uniform (6.2×, the decade's skew finding). The
    * agg form partial-aggregates map-side, so the hot key collapses
    * to one row per input partition before any exchange; each stage's
    * threshold (t1, t2) arrives by join, and the per-stage joins +
    * final assembly all reuse the same hash(user_id) partitioning.
    */
  def qFunnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", $"event_type", unix_timestamp($"ts").as("ts_s"))
    // ALL users (t1 null for view-less ones): n_users = count(*)
    val v = ev.groupBy($"user_id")
      .agg(min(when($"event_type" === "view", $"ts_s")).as("t1"))
    val c = ev.filter($"event_type" === "click")
      .join(v.filter($"t1".isNotNull), Seq("user_id"))
      .filter($"ts_s" >= $"t1")
      .groupBy($"user_id").agg(min($"ts_s").as("t2"))
    val p = ev.filter($"event_type" === "purchase")
      .join(c, Seq("user_id"))
      .filter($"ts_s" >= $"t2")
      .groupBy($"user_id").agg(min($"ts_s").as("t3"))
    val staged = v
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
    staged.agg(
      count(lit(1)).as("n_users"),
      count($"t1").as("n_view"),
      count($"t2").as("n_view_click"),
      count($"t3").as("n_view_click_purchase"),
      r4(count($"t2").cast("double") / count($"t1")).as("click_rate"),
      r4(count($"t3").cast("double") / count($"t2")).as("purchase_rate"))
  }

  val qFunnelOracle: String =
    """WITH e AS (SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
      |v AS (SELECT user_id, min(ts_s) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(ts_s) AS t2 FROM e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND ts_s >= t1 GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(ts_s) AS t3 FROM e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND ts_s >= t2 GROUP BY e.user_id)
      |SELECT
      | (SELECT count(DISTINCT user_id) FROM e) AS n_users,
      | (SELECT count(*) FROM v) AS n_view,
      | (SELECT count(*) FROM c) AS n_view_click,
      | (SELECT count(*) FROM p) AS n_view_click_purchase,
      | round((SELECT count(*) FROM c) * 1.0 / (SELECT count(*) FROM v), 4) + 0 AS click_rate,
      | round((SELECT count(*) FROM p) * 1.0 / (SELECT count(*) FROM c), 4) + 0 AS purchase_rate""".stripMargin

  /** Point-in-time attribution: for each purchase, the latest prior
    * click by the same user (as-of join), summarized per user.
    */
  def qAsofAttribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, d)
      .select($"user_id", $"event_id", $"event_type", unix_timestamp($"ts").as("ts_s"))
    val purchases = e.filter($"event_type" === "purchase").drop("event_type")
    val clicks = e.filter($"event_type" === "click").drop("event_type")
      .withColumn("click_ts", $"ts_s")
    graft.operators.AsofJoin
      .asofBackward(purchases, clicks, "user_id", "ts_s", "event_id", Seq("click_ts"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_purchases"),
        sum(when($"asof_click_ts".isNotNull, 1L).otherwise(0L)).as("n_attributed"),
        sum(coalesce($"ts_s" - $"asof_click_ts", lit(0L))).as("sum_gap_s"))
      .orderBy($"user_id")
  }

  val qAsofAttributionOracle: String =
    """WITH e AS (SELECT user_id, event_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
      |u AS (
      |  SELECT user_id, ts_s, event_id, 0 AS side, ts_s AS click_ts FROM e WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, ts_s, event_id, 1 AS side, NULL FROM e WHERE event_type = 'purchase'),
      |w AS (
      |  SELECT *, last_value(click_ts IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts_s, side, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS attr_ts
      |  FROM u)
      |SELECT user_id, count(*) AS n_purchases,
      | CAST(sum(CASE WHEN attr_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
      | CAST(sum(coalesce(ts_s - attr_ts, 0)) AS BIGINT) AS sum_gap_s
      |FROM w WHERE side = 1 GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Frame sampling over the synthesized media table: every 4th frame,
    * 100 bytes/frame — summarized per format.
    */
  def qMmFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
    Multimodal.sampleFrameIndices(media, bytesPerFrame = 100, step = 4)
      .groupBy($"format")
      .agg(countDistinct($"media_id").as("n_media"), count(lit(1)).as("n_frames_sampled"),
        sum($"frame_idx").as("sum_frame_idx"))
      .orderBy($"format")
  }

  val qMmFramesOracle: String =
    """WITH m AS (
      | SELECT doc_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'jpg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
      |  greatest(1, CAST(trunc(octet_length(encode(text)) / 100.0) AS INT)) AS n_frames
      | FROM documents),
      |f AS (SELECT doc_id, format, n_frames, unnest(range(0, n_frames, 4)) AS frame_idx FROM m)
      |SELECT format, count(DISTINCT doc_id) AS n_media, count(*) AS n_frames_sampled,
      | CAST(sum(frame_idx) AS BIGINT) AS sum_frame_idx
      |FROM f GROUP BY format ORDER BY format""".stripMargin

  /** END-TO-END streaming dedup drain — the one query whose result is
    * produced by an actual [[Streams.minhashDedupSink]] StreamingQuery
    * rather than a batch twin: odd-id documents stream through the
    * sink in 3 doc_id-ordered microbatches (file source,
    * maxFilesPerTrigger=1) against the even-id kept corpus, and the
    * SURVIVOR SET read back from the sink's parquet output is the
    * result. The DuckDB oracle replays the sink's exact drop rule with
    * the 3 levels unrolled (no recursion needed: level-k docs test
    * against corpus ∪ level-<k SURVIVORS, and the in-batch rule drops
    * any doc with a smaller-id J≥t batchmate REGARDLESS of that
    * batchmate's own fate — Streams.minhashDedupBatch's
    * hits ∪ inBatch union), with exact 7-gram Jaccard where the sink
    * uses banded MinHash: at b=32 r=2 a true J ≥ 0.62 pair escapes
    * banding with prob (1−0.62²)³² ≈ 2·10⁻⁷, and the seeded signatures
    * make the outcome deterministic — parity holds at every gated SF.
    */
  def qStreamDedupDrain(s: SparkSession, d: String): DataFrame =
    drainSurvivors(s, d, "q_stream_dedup_drain") { (in, corpus, tmp) =>
      Streams.minhashDedupSink(in, corpus, "doc_id", "text",
        n = 7, b = 32, r = 2, seed = 7L, threshold = 0.62,
        s"$tmp/out", s"$tmp/ckpt")
    }

  /** END-TO-END streaming SIMHASH dedup drain — the
    * [[Streams.simhashDedupSink]] twin of [[qStreamDedupDrain]]: the
    * same 3-microbatch odd-ids-vs-even-corpus harness, but the drop
    * rule is Hamming distance ≤ 3 on the 60-bit SimHash. At bands=4 >
    * maxDist=3 the pigeonhole guarantee makes banding EXACT (a ≤3-bit
    * pair always shares one 15-bit band), so the oracle replays the
    * rule as plain `bit_count(xor(sh_x, sh_y)) <= 3` over the same
    * unrolled 3 levels — the engine-independent polyhash SimHash
    * (q_simhash's oracle formula) makes the two sides bit-identical.
    */
  def qStreamSimhashDrain(s: SparkSession, d: String): DataFrame =
    drainSurvivors(s, d, "q_stream_simhash_drain") { (in, corpus, tmp) =>
      Streams.simhashDedupSink(in, corpus, "doc_id", "text",
        maxDist = 3, bands = 4, s"$tmp/out", s"$tmp/ckpt")
    }

  /** END-TO-END transformWithState drain — puts the Spark 4
    * arbitrary-state API under the DuckDB oracle via
    * [[Streams.ttlDedupTws]]'s first-seen-per-TTL rule: the 3,000
    * smallest events stream through the TTL dedup in 3 staged
    * microbatches (file source, maxFilesPerTrigger=1) keyed by
    * (user_id, first event_type char), with a 1-HOUR TTL so no marker
    * expires inside the seconds-long drain — which makes the
    * wall-clock-coupled operator DETERMINISTIC: each key emits exactly
    * once, in the first staged batch that contains it. Two
    * ProcessingTime-mode realities shape the harness (see
    * TransformWithStateSpec): processAllAvailable never returns (every
    * trigger is pending work), so the drain POLLS consumed input rows
    * via a listener and stops the query itself; and no-data triggers
    * still advance batch ids, so the result maps raw batch ids to
    * DENSE ORDINALS over the batches that actually emitted — which the
    * oracle reproduces as a dense_rank over each key's min staged
    * batch. Result: one row per key (key, first_batch ordinal,
    * n_emissions) — n_emissions > 1 would mean the TTL marker failed
    * to suppress a repeat, a key surfacing in a later ordinal would
    * mean cross-batch state was lost. The emitted VALUE is excluded by
    * design: the processor forwards an arbitrary first row per key per
    * batch (iterator order), so only the deterministic (key, batch)
    * identity is under oracle.
    */
  def qStreamTwsDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w0 = org.apache.spark.sql.expressions.Window.orderBy($"event_id")
    // composite key spreads first-appearances across the 3 staged
    // batches (bare user_id saturates in batch 0: 150 users per 1000
    // events at every SF); the cap bounds the oracle's window replay
    import graft.streaming.DrainPhases
    DrainPhases.reset("q_stream_tws_dedup")
    val ev = DrainPhases.timed("q_stream_tws_dedup", "prep")(Tables.events(s, d)
      .select($"event_id",
        ($"user_id" * 100 + ascii(substring($"event_type", 1, 1))).as("k"),
        $"value")
      .withColumn("__r", row_number().over(w0)).filter($"__r" <= 3000).drop("__r")
      .localCheckpoint())
    val tmp = java.nio.file.Files.createTempDirectory("graft-tws-drain").toString
    val nStaged = DrainPhases.timed("q_stream_tws_dedup", "stage")(
      stageBatches(ev.select($"event_id", $"k", $"value"), "event_id", tmp, 3))
    val confs = Seq(
      // transformWithState requires the RocksDB state store; checksum
      // writer + FileContext manager hazards per TransformWithStateSpec
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.checkpointFileManagerClass" ->
        "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager",
      "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false")
    val saved = confs.map { case (key, _) => key -> s.conf.getOption(key) }
    confs.foreach { case (key, v) => s.conf.set(key, v) }
    val rows =
      try {
        val consumed = new java.util.concurrent.atomic.AtomicLong(0L)
        val qId = new java.util.concurrent.atomic.AtomicReference[java.util.UUID]()
        val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
          override def onQueryStarted(
              e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
          override def onQueryTerminated(
              e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
          override def onQueryProgress(
              e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
            if (e.progress.id == qId.get) consumed.addAndGet(e.progress.numInputRows)
            ()
          }
        }
        s.streams.addListener(listener)
        try {
          val in = s.readStream.schema(s.read.parquet(s"$tmp/in/b000.parquet").schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
          val ds = in.select($"k".as("_1"), $"value".as("_2")).as[(Long, Double)]
          val q = Streams.ttlDedupTws(ds, java.time.Duration.ofHours(1))
            .toDF("k", "value")
            .writeStream
            .option("checkpointLocation", s"$tmp/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
            .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
              if (!b.isEmpty) {
                b.select($"k").withColumn("__batch_part", lit(id))
                  .write.mode("overwrite")
                  .option("partitionOverwriteMode", "dynamic")
                  .partitionBy("__batch_part")
                  .parquet(s"$tmp/out")
              }
            }
            .start()
          qId.set(q.id)
          try DrainPhases.timed("q_stream_tws_dedup", "drain") {
            val deadline = System.nanoTime() + 300L * 1000 * 1000 * 1000
            while (consumed.get < nStaged && System.nanoTime() < deadline)
              Thread.sleep(100)
            require(consumed.get >= nStaged,
              s"tws drain timed out: consumed ${consumed.get} of $nStaged staged rows")
          } finally q.stop()
        } finally s.streams.removeListener(listener)
        val wB = org.apache.spark.sql.expressions.Window.orderBy($"__batch_part")
        DrainPhases.timed("q_stream_tws_dedup", "readback")(
          s.read.parquet(s"$tmp/out")
            .withColumn("first_batch", (dense_rank().over(wB) - 1).cast("long"))
            .groupBy($"k")
            .agg(min($"first_batch").as("first_batch"), count(lit(1)).as("n_emissions"))
            .orderBy($"k")
            .collect().toList)
      } finally {
        saved.foreach {
          case (key, Some(v)) => s.conf.set(key, v)
          case (key, None) => s.conf.unset(key)
        }
        deleteRecursively(new java.io.File(tmp))
      }
    s.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("first_batch",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("n_emissions",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Second transformWithState oracle seat — [[Streams.runningStatsTws]]
    * (typed ValueState accumulation, TimeMode.None, RocksDB provider)
    * under the DuckDB oracle via a staged batch-REPLAY check: the
    * 3,000 smallest events stream through in 3 staged microbatches
    * keyed by user_id; each microbatch emits the UPDATED cumulative
    * (n, total, max) row for every key that received input, so the
    * result — one row per (key, batch-of-appearance) with the
    * cumulative stats AT THAT POINT — must equal the oracle's windowed
    * replay of the same staged prefixes. Values ride an integer cent
    * grid (floor(value*100)) so the running sums are exact integer
    * arithmetic in both engines — no float-summation-order drift under
    * the hash compare. Cross-batch state loss, a missed per-batch
    * emission, or wrong accumulation all surface as row/hash
    * mismatches. TimeMode.None has no wall-clock coupling, so unlike
    * [[qStreamTwsDedup]] the plain processAllAvailable drain applies.
    */
  def qStreamTwsStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w0 = org.apache.spark.sql.expressions.Window.orderBy($"event_id")
    import graft.streaming.DrainPhases
    DrainPhases.reset("q_stream_tws_stats")
    val ev = DrainPhases.timed("q_stream_tws_stats", "prep")(Tables.events(s, d)
      .select($"event_id", $"user_id".as("k"),
        floor($"value" * 100).cast("double").as("v"))
      .withColumn("__r", row_number().over(w0)).filter($"__r" <= 3000).drop("__r")
      .localCheckpoint())
    val tmp = java.nio.file.Files.createTempDirectory("graft-tws-stats").toString
    DrainPhases.timed("q_stream_tws_stats", "stage")(
      stageBatches(ev.select($"event_id", $"k", $"v"), "event_id", tmp, 3))
    val confs = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.checkpointFileManagerClass" ->
        "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager",
      "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false")
    val saved = confs.map { case (key, _) => key -> s.conf.getOption(key) }
    confs.foreach { case (key, v) => s.conf.set(key, v) }
    val rows =
      try {
        val in = s.readStream.schema(s.read.parquet(s"$tmp/in/b000.parquet").schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
        val ds = in.select($"k".as("_1"), $"v".as("_2")).as[(Long, Double)]
        val q = Streams.runningStatsTws(ds)
          .toDF("k", "n", "total", "vmax")
          .writeStream
          .outputMode("update")
          .option("checkpointLocation", s"$tmp/ckpt")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            if (!b.isEmpty) {
              b.withColumn("__batch_part", lit(id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("__batch_part")
                .parquet(s"$tmp/out")
            }
          }
          .start()
        try DrainPhases.timed("q_stream_tws_stats", "drain")(
          q.processAllAvailable()) finally {
          q.recentProgress.filter(_.numInputRows > 0).foreach(p =>
            DrainPhases.record("q_stream_tws_stats", s"b${p.batchId}",
              p.durationMs.getOrDefault("triggerExecution", 0L).toDouble / 1e3))
          q.stop()
        }
        val wB = org.apache.spark.sql.expressions.Window.orderBy($"__batch_part")
        DrainPhases.timed("q_stream_tws_stats", "readback")(
          s.read.parquet(s"$tmp/out")
            .withColumn("b", (dense_rank().over(wB) - 1).cast("long"))
            .select($"k", $"b", $"n", $"total".cast("long").as("total_cents"),
              $"vmax".cast("long").as("vmax_cents"))
            .orderBy($"k", $"b")
            .collect().toList)
      } finally {
        saved.foreach {
          case (key, Some(v)) => s.conf.set(key, v)
          case (key, None) => s.conf.unset(key)
        }
        deleteRecursively(new java.io.File(tmp))
      }
    s.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("total_cents",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("vmax_cents",
          org.apache.spark.sql.types.LongType, nullable = true))))
  }

  val qStreamTwsStatsOracle: String =
    """WITH ecap AS MATERIALIZED (
      | SELECT event_id, user_id AS k, CAST(floor(value * 100) AS BIGINT) AS v
      | FROM events QUALIFY row_number() OVER (ORDER BY event_id) <= 3000),
      |bb AS (SELECT k, v,
      |  (row_number() OVER (ORDER BY event_id) - 1) * 3 // (SELECT count(*) FROM ecap) AS b
      | FROM ecap),
      |g AS (SELECT k, b, count(*) AS dn,
      |  CAST(sum(v) AS BIGINT) AS dsum, max(v) AS dmax FROM bb GROUP BY k, b),
      |c AS (SELECT k, b,
      |  CAST(sum(dn) OVER (PARTITION BY k ORDER BY b) AS BIGINT) AS n,
      |  CAST(sum(dsum) OVER (PARTITION BY k ORDER BY b) AS BIGINT) AS total_cents,
      |  max(dmax) OVER (PARTITION BY k ORDER BY b) AS vmax_cents
      | FROM g)
      |SELECT k, b, n, total_cents, vmax_cents FROM c ORDER BY k, b""".stripMargin

  val qStreamTwsDedupOracle: String =
    """WITH ecap AS MATERIALIZED (
      | SELECT event_id, user_id * 100 + ascii(substring(event_type, 1, 1)) AS k
      | FROM events QUALIFY row_number() OVER (ORDER BY event_id) <= 3000),
      |b AS (SELECT k,
      |  (row_number() OVER (ORDER BY event_id) - 1) * 3 // (SELECT count(*) FROM ecap) AS b
      | FROM ecap),
      |f AS (SELECT k, min(b) AS fb FROM b GROUP BY k)
      |SELECT k, dense_rank() OVER (ORDER BY fb) - 1 AS first_batch,
      | CAST(1 AS BIGINT) AS n_emissions
      |FROM f ORDER BY k""".stripMargin

  /** Shared end-to-end drain harness: stage the odd-id documents as 3
    * doc_id-ordered single-file parquet microbatches (file source,
    * maxFilesPerTrigger=1), run `mkSink(in, evenCorpus, tmp)` to
    * completion, and return the survivor ids read back from the sink's
    * `$tmp/out` parquet. The `Window.orderBy` global window is harness
    * code over the BOUNDED stream half (it stages a test input, it is
    * not on any production path). Checkpoint confs are session-global:
    * saved and RESTORED so repeated invocations in a long-lived
    * Bench/Verify session don't silently change checkpoint behavior
    * for other streaming queries — and the survivor ids are collected
    * into a LocalRelation so the temp dir (staging + checkpoint + sink
    * output) is deleted before return instead of leaking disk per run.
    */
  /** Stage a bounded frame as `parts` single-file parquet microbatches
    * (`$tmp/in/bNNN.parquet`, ascending mod-times so the file source
    * triggers them in order under maxFilesPerTrigger=1). Returns the
    * staged row count. The `Window.orderBy` global window is harness
    * code over a BOUNDED capped frame, not on any production path.
    */
  private def stageBatches(frame: DataFrame, orderCol: String, tmp: String,
      parts: Int): Long = {
    val ns = frame.count()
    require(ns > 0, s"stageBatches: empty staged input — wrong data dir?")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(orderCol))
    val ranked = frame
      .withColumn("rn", row_number().over(w).cast("long") - 1).localCheckpoint()
    for (k <- 0 until parts) {
      ranked.filter(expr(s"rn * $parts div $ns") === k).drop("rn")
        .coalesce(1).write.parquet(s"$tmp/stage_$k")
      val part = new java.io.File(s"$tmp/stage_$k").listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .getOrElse(sys.error(s"no part file in $tmp/stage_$k"))
      val dir = new java.io.File(s"$tmp/in"); dir.mkdirs()
      val dst = new java.io.File(dir, f"b$k%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + k * 60000L)
    }
    ns
  }

  private def drainSurvivors(s: SparkSession, d: String, name: String)(
      mkSink: (DataFrame, DataFrame, String) => org.apache.spark.sql.streaming.StreamingQuery): DataFrame = {
    import s.implicits._
    import graft.streaming.DrainPhases
    // PHASE-TIMED (r18, VERDICT r17 #4): the drain seconds mix five
    // terms — cap+checkpoint prep, staging writes, sink construction
    // (the corpus index build for the dedup sinks), the microbatches,
    // and the read-back — and the 4x cross-session spread on unchanged
    // code was unattributable without the split. Bench emits these
    // next to the stream_e2e totals.
    DrainPhases.reset(name)
    // ORACLE-seat cap, 5,000 smallest doc_ids == the whole sf0.1
    // universe, so every gated-SF result is unchanged. Same
    // bounded-sample design as every exact-verify oracle seat
    // (SCALING.md "fixed-size caps"): the drain's exact-Jaccard DuckDB
    // replay is all-pairs NOT EXISTS — quadratic on BOTH engines — and
    // at b=32/r=2 this corpus's background J makes the sink side
    // candidate-quadratic too (uncapped sf1 drain measured 189 s;
    // sf10 would be pair-count x100 that). The UNCAPPED sinks at
    // 400k-doc indexes are measured by StreamBench (STREAMING.md).
    val w0 = org.apache.spark.sql.expressions.Window.orderBy($"doc_id")
    val docs = DrainPhases.timed(name, "prep")(
      Tables.documents(s, d).select($"doc_id", $"text")
        .withColumn("__r", row_number().over(w0)).filter($"__r" <= 5000).drop("__r")
        .localCheckpoint())
    val corpus = docs.filter($"doc_id" % 2 === 0)
    val stream = docs.filter($"doc_id" % 2 === 1)
    val tmp = java.nio.file.Files.createTempDirectory("graft-drain").toString
    DrainPhases.timed(name, "stage")(stageBatches(stream, "doc_id", tmp, 3))
    // local single-JVM safety: FileSystem-based checkpoint manager, no
    // checksum writer (see TransformWithStateSpec's rocksConf rationale)
    val ckptConfs = Seq(
      "spark.sql.streaming.checkpointFileManagerClass" ->
        "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager",
      "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false")
    val saved = ckptConfs.map { case (k, _) => k -> s.conf.getOption(k) }
    ckptConfs.foreach { case (k, v) => s.conf.set(k, v) }
    val survivors =
      try {
        val in = s.readStream.schema(s.read.parquet(s"$tmp/in/b000.parquet").schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
        val q = DrainPhases.timed(name, "sink_build")(mkSink(in, corpus, tmp))
        try DrainPhases.timed(name, "drain")(q.processAllAvailable()) finally {
          q.recentProgress.filter(_.numInputRows > 0).foreach(p =>
            DrainPhases.record(name, s"b${p.batchId}",
              p.durationMs.getOrDefault("triggerExecution", 0L).toDouble / 1e3))
          q.stop()
        }
        DrainPhases.timed(name, "readback")(
          s.read.parquet(s"$tmp/out").select($"doc_id").orderBy($"doc_id")
            .collect().toList)
      } finally {
        saved.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
        deleteRecursively(new java.io.File(tmp))
      }
    // survivor ids only (8 bytes/doc) — bounded collect, real tiny stats
    s.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(survivors).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }

  val qStreamDedupDrainOracle: String =
    """WITH dcap AS MATERIALIZED (
      | SELECT doc_id, text FROM documents
      | QUALIFY row_number() OVER (ORDER BY doc_id) <= 5000),
      |sh AS MATERIALIZED (
      | SELECT doc_id,
      |  list_distinct([substr(text, x, 7) FOR x IN range(1, greatest(len(text) - 5, 1))]) AS sh
      | FROM dcap),
      |c0 AS MATERIALIZED (SELECT doc_id, sh FROM sh WHERE doc_id % 2 = 0),
      |s0 AS MATERIALIZED (SELECT doc_id, sh,
      |        (row_number() OVER (ORDER BY doc_id) - 1) * 3 // (SELECT count(*) FROM sh WHERE doc_id % 2 = 1) AS b
      |       FROM sh WHERE doc_id % 2 = 1),
      |s1 AS MATERIALIZED (SELECT x.doc_id, x.sh FROM s0 x WHERE x.b = 0
      |  AND NOT EXISTS (SELECT 1 FROM c0 y WHERE
      |   CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.62)
      |  AND NOT EXISTS (SELECT 1 FROM s0 y WHERE y.b = 0 AND y.doc_id < x.doc_id AND
      |   CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.62)),
      |k1 AS MATERIALIZED (SELECT * FROM c0 UNION ALL SELECT * FROM s1),
      |s2 AS MATERIALIZED (SELECT x.doc_id, x.sh FROM s0 x WHERE x.b = 1
      |  AND NOT EXISTS (SELECT 1 FROM k1 y WHERE
      |   CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.62)
      |  AND NOT EXISTS (SELECT 1 FROM s0 y WHERE y.b = 1 AND y.doc_id < x.doc_id AND
      |   CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.62)),
      |k2 AS MATERIALIZED (SELECT * FROM k1 UNION ALL SELECT * FROM s2),
      |s3 AS MATERIALIZED (SELECT x.doc_id, x.sh FROM s0 x WHERE x.b = 2
      |  AND NOT EXISTS (SELECT 1 FROM k2 y WHERE
      |   CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.62)
      |  AND NOT EXISTS (SELECT 1 FROM s0 y WHERE y.b = 2 AND y.doc_id < x.doc_id AND
      |   CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.62))
      |SELECT doc_id FROM (
      | SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2 UNION ALL SELECT doc_id FROM s3)
      |ORDER BY doc_id""".stripMargin

  /** The polyhash SimHash formula shared with q_simhash's oracle
    * (DocQueries.qSimhashOracle) — engine-independent integer
    * arithmetic, bit-identical to [[graft.functions.SimHash60]].
    */
  private val simhashSql: String =
    """WITH dcap AS MATERIALIZED (
      | SELECT doc_id, text FROM documents
      | QUALIFY row_number() OVER (ORDER BY doc_id) <= 5000),
      |t AS (
      | SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM dcap),
      |h AS (
      | SELECT doc_id, list_transform(tk, s ->
      |   list_reduce(list_prepend(CAST(0 AS BIGINT),
      |     list_transform(range(1, length(s)+1), i -> CAST(ascii(substring(s,i,1)) AS BIGINT))),
      |     (acc, x) -> (acc*31 + x) % 1000000007)
      |   + 1073741824 * list_reduce(list_prepend(CAST(0 AS BIGINT),
      |     list_transform(range(1, length(s)+1), i -> CAST(ascii(substring(s,i,1)) AS BIGINT))),
      |     (acc, x) -> (acc*37 + x) % 1000000007)) AS hs
      | FROM t),
      |sh AS MATERIALIZED (
      | SELECT doc_id, CAST(list_sum(list_transform(range(0, 60), b ->
      |   CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h // CAST(pow(2,b) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END)) >= 0
      |        THEN CAST(pow(2,b) AS BIGINT) ELSE 0 END)) AS BIGINT) AS sh
      | FROM h)""".stripMargin

  val qStreamSimhashDrainOracle: String =
    simhashSql + """,
      |c0 AS MATERIALIZED (SELECT doc_id, sh FROM sh WHERE doc_id % 2 = 0),
      |s0 AS MATERIALIZED (SELECT doc_id, sh,
      |        (row_number() OVER (ORDER BY doc_id) - 1) * 3 // (SELECT count(*) FROM sh WHERE doc_id % 2 = 1) AS b
      |       FROM sh WHERE doc_id % 2 = 1),
      |s1 AS MATERIALIZED (SELECT x.doc_id, x.sh FROM s0 x WHERE x.b = 0
      |  AND NOT EXISTS (SELECT 1 FROM c0 y WHERE bit_count(xor(x.sh, y.sh)) <= 3)
      |  AND NOT EXISTS (SELECT 1 FROM s0 y WHERE y.b = 0 AND y.doc_id < x.doc_id AND bit_count(xor(x.sh, y.sh)) <= 3)),
      |k1 AS MATERIALIZED (SELECT * FROM c0 UNION ALL SELECT * FROM s1),
      |s2 AS MATERIALIZED (SELECT x.doc_id, x.sh FROM s0 x WHERE x.b = 1
      |  AND NOT EXISTS (SELECT 1 FROM k1 y WHERE bit_count(xor(x.sh, y.sh)) <= 3)
      |  AND NOT EXISTS (SELECT 1 FROM s0 y WHERE y.b = 1 AND y.doc_id < x.doc_id AND bit_count(xor(x.sh, y.sh)) <= 3)),
      |k2 AS MATERIALIZED (SELECT * FROM k1 UNION ALL SELECT * FROM s2),
      |s3 AS MATERIALIZED (SELECT x.doc_id, x.sh FROM s0 x WHERE x.b = 2
      |  AND NOT EXISTS (SELECT 1 FROM k2 y WHERE bit_count(xor(x.sh, y.sh)) <= 3)
      |  AND NOT EXISTS (SELECT 1 FROM s0 y WHERE y.b = 2 AND y.doc_id < x.doc_id AND bit_count(xor(x.sh, y.sh)) <= 3))
      |SELECT doc_id FROM (
      | SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2 UNION ALL SELECT doc_id FROM s3)
      |ORDER BY doc_id""".stripMargin

  val all: Map[String, Q] = Map(
    "q_stream_dedup_drain" -> qStreamDedupDrain,
    "q_stream_simhash_drain" -> qStreamSimhashDrain,
    "q_stream_tws_dedup" -> qStreamTwsDedup,
    "q_stream_tws_stats" -> qStreamTwsStats,
    "q_mm_frames" -> qMmFrames,
    "q_stream_window" -> qStreamWindow,
    "q_stream_hopping" -> qStreamHopping,
    "q_funnel" -> qFunnel,
    "q_session_window" -> qSessionWindow,
    "q_sessionize" -> qSessionize,
    "q_mm_meta" -> qMmMeta,
    "q_mm_digest" -> qMmDigest,
    "q_asof_attribution" -> qAsofAttribution
  )

  val oracles: Map[String, String] = Map(
    "q_stream_dedup_drain" -> qStreamDedupDrainOracle,
    "q_stream_simhash_drain" -> qStreamSimhashDrainOracle,
    "q_stream_tws_dedup" -> qStreamTwsDedupOracle,
    "q_stream_tws_stats" -> qStreamTwsStatsOracle,
    "q_mm_frames" -> qMmFramesOracle,
    "q_stream_window" -> qStreamWindowOracle,
    "q_stream_hopping" -> qStreamHoppingOracle,
    "q_funnel" -> qFunnelOracle,
    "q_session_window" -> qSessionWindowOracle,
    "q_sessionize" -> qSessionizeOracle,
    "q_mm_meta" -> qMmMetaOracle,
    "q_mm_digest" -> qMmDigestOracle,
    "q_asof_attribution" -> qAsofAttributionOracle
  )
}
