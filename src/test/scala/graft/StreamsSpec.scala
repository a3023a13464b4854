package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.streaming.Streams

case class Ev(ts: Timestamp, event_type: String, value: Double, user_id: Long, event_id: Long)
case class DocIn(ts: Timestamp, doc_id: Long, text: String)
case class ScoreIn(id: Long, arr: Seq[Double])
case class Imp(ts: Timestamp, user_id: Long, imp_id: Long)
case class Clk(ts: Timestamp, user_id: Long, click_id: Long)

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming windowed agg converges to the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      Ev(t("2024-01-01 00:10:00"), "click", 1.0, 1, 1),
      Ev(t("2024-01-01 00:50:00"), "click", 2.0, 1, 2),
      Ev(t("2024-01-01 01:10:00"), "view", 3.0, 2, 3),
      Ev(t("2024-01-01 01:20:00"), "click", 4.0, 2, 4))
    val ms = MemoryStream[Ev]
    val q = Streams.streamingWindowedAgg(ms.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_agg").outputMode("complete").start()
    ms.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("win_agg")
      .select($"window_start", $"event_type", $"n", $"sum_value")
      .orderBy($"window_start", $"event_type").collect().toSeq
    val batch = Streams.windowedAgg(rows.toDF(), "1 hour")
      .orderBy($"window_start", $"event_type").collect().toSeq
    q.stop()
    assert(streamed == batch)
    assert(streamed.map(r => (r.getString(1), r.getLong(2))) ==
      Seq(("click", 2L), ("click", 1L), ("view", 1L)))
  }

  test("streaming hopping-window agg converges to batch; events land in window/slide windows") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      Ev(t("2024-01-01 00:10:00"), "click", 1.0, 1, 1),
      Ev(t("2024-01-01 00:40:00"), "click", 2.0, 1, 2),
      Ev(t("2024-01-01 01:10:00"), "view", 3.0, 2, 3))
    val ms = MemoryStream[Ev]
    val q = Streams.hoppingAgg(ms.toDF().withWatermark("ts", "10 minutes"), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("hop_agg").outputMode("complete").start()
    ms.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("hop_agg")
      .orderBy($"window_start", $"event_type").collect().toSeq
    val batch = Streams.hoppingAgg(rows.toDF(), "1 hour", "30 minutes")
      .orderBy($"window_start", $"event_type").collect().toSeq
    q.stop()
    assert(streamed == batch)
    // 1h/30min -> each event in exactly 2 windows: 3 events, 6 assignments
    assert(batch.map(_.getLong(2)).sum == 6L)
    // the 00:10 event's windows start at 23:30 and 00:00
    assert(batch.count(r => r.getTimestamp(0) == t("2023-12-31 23:30:00")) == 1)
  }

  test("stream-stream join matches clicks to impressions within the bound") {
    implicit val sqlCtx = spark.sqlContext
    val msI = MemoryStream[Imp]
    val msC = MemoryStream[Clk]
    // selecting the key and both ts columns BY NAME proves the output
    // schema is unambiguous (right side's key dropped, ts renamed)
    val out = Streams.streamStreamJoin(msI.toDF(), msC.toDF(), "user_id",
        watermark = "1 minute", within = "10 minutes")
      .select($"user_id", $"ts", $"right_ts", $"imp_id", $"click_id")
      .select($"imp_id", $"click_id")
    val q = out.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    msI.addData(
      Imp(t("2024-01-01 00:00:00"), 1, 100),
      Imp(t("2024-01-01 00:30:00"), 1, 101),
      Imp(t("2024-01-01 00:00:00"), 2, 200))
    msC.addData(
      Clk(t("2024-01-01 00:05:00"), 1, 900), // within 10m of imp 100 only
      Clk(t("2024-01-01 00:45:00"), 1, 901), // > 10m after both imps → no match
      Clk(t("2024-01-01 00:09:00"), 2, 902)) // matches imp 200
    q.processAllAvailable()
    val got = spark.table("ss_join").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got == Set((100L, 900L), (200L, 902L)))
  }

  test("native session_window matches lag+cumsum sessions; exact-gap boundary splits") {
    val rows = Seq(
      Ev(t("2024-01-01 00:00:00"), "click", 1.0, 1, 1),
      Ev(t("2024-01-01 00:30:00"), "click", 2.0, 1, 2),
      Ev(t("2024-01-01 01:30:00"), "view", 3.0, 1, 3),  // exactly gap after #2 -> MERGES
      Ev(t("2024-01-01 01:30:01"), "view", 5.0, 1, 5),  // 1s inside #3's window -> merges
      Ev(t("2024-01-01 02:30:02"), "view", 6.0, 1, 6),  // 1s past #5's end -> NEW session
      Ev(t("2024-01-01 03:00:00"), "view", 4.0, 2, 4))
    val gapS = 3600L
    val native = Streams.sessionWindowAgg(rows.toDF(), "1 hour")
      .groupBy($"user_id").agg(count(lit(1)).as("ns"), sum($"n_events").as("ne"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // session_window merges when next.start <= prev.end — the same
    // boundary rule as sessionize's `diff > gap` (merge AT the boundary)
    assert(native(1L) == (2L, 5L) && native(2L) == (1L, 1L))
    val cumsum = Streams.sessionSummary(rows.toDF(), gapS)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cumsum(1L) == 2L && cumsum(2L) == 1L)
    // session starts are the first event of each merged chain
    val starts = Streams.sessionWindowAgg(rows.toDF(), "1 hour")
      .filter($"user_id" === 1).orderBy($"session_start")
      .collect().map(_.getTimestamp(1))
    assert(starts.toSeq == Seq(t("2024-01-01 00:00:00"), t("2024-01-01 02:30:02")))
  }

  test("streaming session_window closes sessions as the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val early = Seq(
      Ev(t("2024-01-01 00:00:00"), "click", 1.0, 1, 1),
      Ev(t("2024-01-01 00:20:00"), "click", 2.0, 1, 2),
      Ev(t("2024-01-01 02:00:00"), "view", 3.0, 1, 3))
    val ms = MemoryStream[Ev]
    val q = Streams.sessionWindowAgg(ms.toDF().withWatermark("ts", "0 seconds"), "1 hour")
      .writeStream.format("memory").queryName("sess_win").outputMode("append").start()
    ms.addData(early: _*)
    q.processAllAvailable()
    // a far-future event pushes the watermark past every early session end
    ms.addData(Ev(t("2024-02-01 00:00:00"), "click", 9.0, 7, 99))
    q.processAllAvailable()
    val streamed = spark.table("sess_win").filter($"user_id" === 1)
      .orderBy($"session_start").collect().toSeq
    val batch = Streams.sessionWindowAgg(early.toDF(), "1 hour")
      .orderBy($"session_start").collect().toSeq
    q.stop()
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(streamed.map(_.getLong(2)) == Seq(2L, 1L)) // sessions of 2 then 1 events
  }

  test("batch sessionization splits on gap") {
    val rows = Seq(
      Ev(t("2024-01-01 00:00:00"), "c", 0, 1, 1),
      Ev(t("2024-01-01 00:10:00"), "c", 0, 1, 2),
      Ev(t("2024-01-02 12:00:00"), "c", 0, 1, 3), // > 1 day gap → new session
      Ev(t("2024-01-01 00:00:00"), "c", 0, 2, 4))
    val out = Streams.sessionSummary(rows.toDF(), 86400L).orderBy($"user_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 3L), (2L, 1L, 1L)))
  }

  test("stateful streaming sessions close on gap across batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long)]
    val q = Streams.statefulSessions(ms.toDS(), gapSeconds = 100L)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    ms.addData((1L, 0L), (1L, 10L))
    q.processAllAvailable()
    ms.addData((1L, 100000L)) // gap ≫ 100s → closes first session
    q.processAllAvailable()
    val out = spark.table("sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    q.stop()
    assert(out.contains((1L, 2L, 10L)), s"sessions: $out")
  }

  test("streaming dedup within watermark drops duplicate keys") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Streams.streamDedup(ms.toDF(), "1 hour", Seq("event_id"))
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    ms.addData(
      Ev(t("2024-01-01 00:00:00"), "c", 1.0, 1, 1),
      Ev(t("2024-01-01 00:00:01"), "c", 1.0, 1, 1),
      Ev(t("2024-01-01 00:00:02"), "c", 1.0, 1, 2))
    q.processAllAvailable()
    val n = spark.table("dedup").count()
    q.stop()
    assert(n == 2)
  }

  test("streaming ingest dedup drops in-stream repeats and corpus hits") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq("kept one", "kept two").toDF("text")
    val ms = MemoryStream[DocIn]
    val q = Streams.streamDedupAgainstCorpus(ms.toDF(), corpus, "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("ingest").outputMode("append").start()
    ms.addData(
      DocIn(t("2024-01-01 00:00:00"), 1, "novel alpha"),
      DocIn(t("2024-01-01 00:00:01"), 2, "kept one"),    // already in corpus
      DocIn(t("2024-01-01 00:00:02"), 3, "novel alpha")) // in-stream repeat
    q.processAllAvailable()
    ms.addData(
      DocIn(t("2024-01-01 00:00:03"), 4, "novel alpha"), // repeat across batches
      DocIn(t("2024-01-01 00:00:04"), 5, "novel beta"),
      DocIn(t("2024-01-01 00:00:05"), 6, "kept two"))
    q.processAllAvailable()
    val out = spark.table("ingest").collect()
    q.stop()
    assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 5L),
      s"survivors: ${out.mkString(",")}")
    // digest column rides along for the downstream near-dup pass
    assert(out.forall(_.getAs[String]("digest").length == 32))
  }

  test("streaming simhash near-dup sink drops corpus-close docs (pigeonhole recall)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-shdedup").toString
    val corpus = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val ms = MemoryStream[DocIn]
    val q = Streams.simhashDedupSink(ms.toDF(), corpus, "doc_id", "text",
      maxDist = 12, bands = 15, s"$dir/out", s"$dir/ckpt")
    ms.addData(
      DocIn(t("2024-01-01 00:00:00"), 1, "alpha beta gamma delta epsilon zeta eta theta"), // identical
      DocIn(t("2024-01-01 00:00:01"), 2, "alpha beta gamma delta epsilon zeta eta iota"),  // 1 token off (≤12 bits, pinned by the simhash spec above)
      DocIn(t("2024-01-01 00:00:02"), 3, "one two three four five six seven eight"))       // unrelated
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/out").collect()
    assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(3L),
      s"survivors: ${out.mkString(",")}")
    // lossy geometry refused up front, not silently incomplete
    intercept[IllegalArgumentException] {
      Streams.simhashDedupSink(ms.toDF(), corpus, "doc_id", "text", 12, 12,
        s"$dir/out2", s"$dir/ckpt2")
    }
  }

  test("simhash dedup sink: index grows with survivors, in-batch pairs keep min, replay idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shgrow").toString
    val out = s"$dir/out"
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq((100L, corpusText)).toDF("doc_id", "text")
    val corpusIdx = Streams.bandedSimhash(corpus, "doc_id", "text", bands = 15, "c")
    val novel0 = "one two three four five six seven eight"
    // preconditions pinned by name so a simhash change fails HERE, not
    // as a mystery survivor-set diff below
    def hd(a: String, b: String): Int = Seq((a, b)).toDF("x", "y")
      .select(graft.dedup.Dedup.hammingDist(
        graft.dedup.Dedup.simhash60($"x"), graft.dedup.Dedup.simhash60($"y")).as("d"))
      .head().getAs[Int]("d")
    val near0 = "one two three four five six seven nine"
    val nearCorpus = "alpha beta gamma delta epsilon zeta eta iota"
    assert(hd(novel0, near0) <= 12 && hd(corpusText, nearCorpus) <= 12,
      s"test texts drifted out of Hamming budget: ${hd(novel0, near0)}, ${hd(corpusText, nearCorpus)}")

    val b0 = Seq((1L, novel0)).toDF("doc_id", "text")
    Streams.simhashDedupBatch(corpusIdx, b0, 0L, "doc_id", "text", 12, 15, out)
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().toSeq == Seq(1L))

    val b1 = Seq(
      (2L, near0),                          // near-dup of BATCH-0 SURVIVOR — the growing-index case
      (3L, nearCorpus),                     // near-dup of the static corpus
      (4L, "completely different words with nothing shared anywhere"),
      (5L, "pair text repeated verbatim in this batch"),
      (6L, "pair text repeated verbatim in this batch")) // in-batch dup of 5 → keep min
      .toDF("doc_id", "text")
    Streams.simhashDedupBatch(corpusIdx, b1, 1L, "doc_id", "text", 12, 15, out)
    def survivors() = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors() == Seq(1L, 4L, 5L), s"survivors: ${survivors()}")
    // the growing index is the survivors' own __sh column — one stored
    // 60-bit signature per survivor, matching a fresh simhash of its text
    val shRows = spark.read.parquet(out)
      .select($"doc_id", $"__sh", graft.dedup.Dedup.simhash60($"text").as("fresh"))
      .collect()
    assert(shRows.length == 3)
    assert(shRows.forall(r => r.getAs[Long]("__sh") == r.getAs[Long]("fresh")),
      "stored __sh must equal the simhash of the survivor's text")

    // replay batch 1: same survivors, no duplicated output rows
    Streams.simhashDedupBatch(corpusIdx, b1, 1L, "doc_id", "text", 12, 15, out)
    assert(survivors() == Seq(1L, 4L, 5L), s"post-replay survivors: ${survivors()}")
    assert(spark.read.parquet(out).count() == 3L, "replay duplicated output rows")
  }

  test("simhash dedup sink unpersists its corpus index when the query terminates") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-shrel").toString
    val corpus = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    // storageLevel resolves through the cache manager by PLAN equality,
    // so this probe (same plan as the sink's internal index) observes
    // the sink's cache without holding a reference to it
    val probe = Streams.bandedSimhash(Streams.ensureWidth(corpus), "doc_id", "text", bands = 15, "c")
    val ms = MemoryStream[DocIn]
    val q = Streams.simhashDedupSink(ms.toDF(), corpus, "doc_id", "text",
      maxDist = 4, bands = 15, s"$dir/out", s"$dir/ckpt")
    ms.addData(DocIn(t("2024-01-01 00:00:00"), 1, "some novel text"))
    q.processAllAvailable()
    assert(probe.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "corpus index not pinned while the query is live")
    q.stop()
    // listener delivery is async on the listener-bus thread
    val deadline = System.nanoTime() + 10_000_000_000L
    while (probe.storageLevel != org.apache.spark.storage.StorageLevel.NONE
        && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(probe.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "corpus index still persisted after query termination")
  }

  test("minhash dedup sink drops a token-replacement near-dup the simhash sink misses") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-mhdedup").toString
    val base = "the quick brown fox jumps over the lazy dog while the rain falls " +
      "gently on the quiet village roofs tonight as winter settles over the valley"
    // token REPLACEMENTS: shingle overlap stays high (local edits) but
    // every swapped token shifts all 60 simhash bit-sums
    val edited = base.replace("quick", "rapid").replace("lazy", "idle")
      .replace("gently", "softly").replace("winter", "autumn")
    val hamming = Seq((base, edited)).toDF("x", "y")
      .select(graft.dedup.Dedup.hammingDist(
        graft.dedup.Dedup.simhash60($"x"), graft.dedup.Dedup.simhash60($"y")).as("d"))
      .head().getAs[Int]("d")
    assert(hamming > 4, s"edited text no longer outside the Hamming budget: $hamming")
    val jac = graft.dedup.Dedup.jaccardJoinExact(
      graft.dedup.Dedup.shingled(
        Seq((1L, base), (2L, edited)).toDF("doc_id", "text"), "doc_id", "text", 3), 0.62)
    assert(jac.count() == 1, "edited text fell below the Jaccard threshold")

    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    val ms = MemoryStream[DocIn]
    // b=32 bands x r=2 rows: miss prob for a true pair at J=0.62 is
    // (1-0.62^2)^32 ~ 2e-7 — spec-deterministic — while background
    // pairs collide a band at J^2 instead of J (the S-curve geometry)
    val q = Streams.minhashDedupSink(ms.toDF(), corpus, "doc_id", "text",
      n = 3, b = 32, r = 2, seed = 7L, threshold = 0.62, s"$dir/out", s"$dir/ckpt")
    ms.addData(
      DocIn(t("2024-01-01 00:00:00"), 1, edited), // J ≥ 0.62 vs corpus, Hamming > 4
      DocIn(t("2024-01-01 00:00:01"), 2, "entirely unrelated sentence about spark physical " +
        "plans and adaptive query execution strategies in distributed engines"))
    q.processAllAvailable()
    ms.addData( // near-dup of the batch-0 SURVIVOR — growing-index case
      DocIn(t("2024-01-01 00:00:02"), 3, "entirely unrelated sentence about spark logical " +
        "plans and adaptive query execution strategies in distributed engines"))
    q.processAllAvailable()
    q.stop()
    val outDf = spark.read.parquet(s"$dir/out")
    val out = outDf.select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(2L), s"survivors: $out")
    // the growing index is the survivors' own __sig column: every
    // survivor row carries its b·r-slot banded signature, so the next
    // batch's index probe is a columnar (id, __sig) read — never text
    assert(outDf.schema.fieldNames.contains("__sig"),
      s"survivors must carry their signature column: ${outDf.schema.fieldNames.toSeq}")
    val sigLens = outDf.select(size($"__sig")).as[Int].collect().toSeq
    assert(sigLens.forall(_ == 64), s"__sig should hold b*r=64 slots per survivor: $sigLens")
  }

  test("minhash sink: candidate-id pushdown path drops exactly what the semi-join path drops") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog while the rain falls " +
      "gently on the quiet village roofs tonight as winter settles over the valley"
    val edited = base.replace("quick", "rapid").replace("lazy", "idle")
      .replace("gently", "softly").replace("winter", "autumn")
    val novel = "entirely unrelated sentence about spark physical " +
      "plans and adaptive query execution strategies in distributed engines"
    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    def run(pushdown: Boolean): Seq[Long] = {
      val dir = java.nio.file.Files.createTempDirectory("graft-mhpush").toString
      spark.conf.set("spark.graft.mh.idPushdown", if (pushdown) "1" else "0")
      try {
        val ms = MemoryStream[DocIn]
        val q = Streams.minhashDedupSink(ms.toDF(), corpus, "doc_id", "text",
          n = 3, b = 32, r = 2, seed = 7L, threshold = 0.62, s"$dir/out", s"$dir/ckpt")
        ms.addData(
          DocIn(t("2024-01-01 00:00:00"), 1, edited),
          DocIn(t("2024-01-01 00:00:01"), 2, novel))
        q.processAllAvailable()
        ms.addData( // near-dup of the batch-0 survivor: the read-back index path
          DocIn(t("2024-01-01 00:00:02"), 3, novel.replace("physical", "logical")))
        q.processAllAvailable()
        q.stop()
        spark.read.parquet(s"$dir/out").select("doc_id").as[Long].collect().sorted.toSeq
      } finally spark.conf.unset("spark.graft.mh.idPushdown")
    }
    val viaPush = run(pushdown = true)
    val viaSemi = run(pushdown = false)
    assert(viaPush == viaSemi && viaSemi == Seq(2L),
      s"pushdown=$viaPush semi=$viaSemi (both must keep only doc 2)")
  }

  test("foreachBatch sink lands stream microbatches as parquet") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val ms = MemoryStream[Ev]
    val q = ms.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.write.mode("append").parquet(s"$dir/out")
      }
      .start()
    ms.addData(Ev(t("2024-01-01 00:00:00"), "c", 1.0, 1, 1))
    q.processAllAvailable()
    ms.addData(Ev(t("2024-01-01 00:00:01"), "c", 2.0, 1, 2))
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(s"$dir/out").count() == 2)
  }

  test("scoring sink: deployed bundle scores stream microbatches identically to batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ml._
    val dir = java.nio.file.Files.createTempDirectory("graft-deploy").toString
    val rnd = new scala.util.Random(3)
    def blob(i: Int) = {
      val shift = if (i % 2 == 1) 1.2 else -1.2
      Seq.fill(3)(rnd.nextGaussian() + shift)
    }
    val data = (1 to 300).map(i => (i.toLong, i % 2, blob(i))).toDF("id", "y", "arr")
    val res = TrainPipeline.run(spark, data, TrainPipeline.Config(
      labelCol = "y", pkCol = "id", featureArrayCol = "arr",
      models = Seq((Trainer.LogReg, Seq(Trainer.ParamRange("regParam", 1e-3, 0.1, log = true)))),
      trialsPerModel = 1, deploymentThreshold = 0.0, calibrate = true),
      modelDir = Some(dir))
    assert(res.champion.nonEmpty)

    // reload the full bundle (model + calibrator + threshold) from disk
    val bundle = Deployment.load(spark, dir)
    assert(bundle.calibrator.map(_.method) == res.calibrationMethod)
    assert(bundle.threshold == res.tunedThreshold)

    val newRows = (1 to 20).map(i => ScoreIn(1000L + i, blob(i)))
    val ms = MemoryStream[ScoreIn]
    val q = Streams.scoringSink(ms.toDF(), bundle, "arr", s"$dir/scored", s"$dir/ckpt")
    ms.addData(newRows.take(10): _*)
    q.processAllAvailable()
    ms.addData(newRows.drop(10): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(s"$dir/scored")
    assert(streamed.count() == 20)
    assert(streamed.select("batch_id").distinct().count() == 2)
    // batch_id stays a LONG data column (partitioning is on an internal
    // copy — partition-type inference would read batch_id back as int)
    assert(streamed.schema("batch_id").dataType ==
      org.apache.spark.sql.types.LongType)
    // online == offline: same bundle, same rows, same scores/predictions
    val offline = bundle.score(newRows.toDF(), "arr").collect()
      .map(r => r.getAs[Long]("id") -> ((r.getAs[Double]("score"), r.getAs[Double]("prediction")))).toMap
    streamed.collect().foreach { r =>
      val (s, p) = offline(r.getAs[Long]("id"))
      assert(math.abs(r.getAs[Double]("score") - s) < 1e-12)
      assert(r.getAs[Double]("prediction") == p)
      assert((r.getAs[Double]("score") >= bundle.threshold) == (p == 1.0))
    }

    // foreachBatch is at-least-once: replaying a batch (same id, same
    // rows — what a post-failure restart from the checkpoint does) must
    // overwrite its own batch_id partition, not append duplicates
    Streams.writeScoredBatch(bundle, newRows.drop(10).toDF(), "arr", s"$dir/scored", 1L)
    val replayed = spark.read.parquet(s"$dir/scored")
    assert(replayed.count() == 20, "replayed batch must not duplicate rows")
    assert(replayed.filter($"batch_id" === 1L).count() == 10)
    assert(replayed.filter($"batch_id" === 0L).count() == 10, "other batches untouched")

    // ---- validated variants: the FeatureSchema gate in front of scoring ----
    import org.apache.spark.sql.types.LongType
    val rules = Seq(graft.features.FeatureSchema.Rule("id", LongType, min = Some(0.0)))
    // streaming: malformed rows (negative id) quarantine with reasons,
    // clean rows score identically to the ungated algebra
    val vIn = (1 to 3).map(i => ScoreIn(2000L + i, blob(i))) ++
      Seq(ScoreIn(-1L, blob(4)), ScoreIn(-2L, blob(5)))
    val ms2 = MemoryStream[ScoreIn]
    val q2 = Streams.scoringSinkValidated(ms2.toDF(), bundle, "arr", rules,
      s"$dir/vscored", s"$dir/vquarantine", s"$dir/vckpt")
    ms2.addData(vIn: _*)
    q2.processAllAvailable()
    q2.stop()
    val vScored = spark.read.parquet(s"$dir/vscored")
    assert(vScored.count() == 3)
    val offline2 = bundle.score(vIn.take(3).toDF(), "arr").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("score")).toMap
    vScored.collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("score") - offline2(r.getAs[Long]("id"))) < 1e-12)
    }
    val vQuar = spark.read.parquet(s"$dir/vquarantine")
    assert(vQuar.count() == 2)
    assert(vQuar.select(explode($"violations")).collect()
      .forall(_.getString(0) == "id: below min 0.0"))

    // batch twin: batchPredictValidated splits the same input the same way
    vIn.toDF().write.mode("overwrite").parquet(s"$dir/vin")
    Champion.batchPredictValidated(spark, res.champion.get.model, s"$dir/vin",
      s"$dir/vout", s"$dir/vq2", "arr", rules)
    assert(spark.read.parquet(s"$dir/vout").count() == 3)
    assert(spark.read.parquet(s"$dir/vq2").count() == 2)
  }

  test("stream-static join enriches a stream with a dimension table") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val ms = MemoryStream[Ev]
    val q = ms.toDF().join(broadcast(dim), Seq("user_id"), "left")
      .select($"event_id", $"user_id", $"tier")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    ms.addData(
      Ev(t("2024-01-01 00:00:00"), "c", 1.0, 1, 1),
      Ev(t("2024-01-01 00:00:01"), "c", 1.0, 3, 2))
    q.processAllAvailable()
    val out = spark.table("enriched").orderBy($"event_id").collect()
      .map(r => (r.getLong(0), Option(r.getString(2)).orNull)).toSeq
    q.stop()
    assert(out == Seq((1L, "gold"), (2L, null)))
  }

  test("asof backward join attaches latest prior value per key") {
    import graft.operators.AsofJoin
    val lefts = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 12L))
      .toDF("k", "ts", "id")
    val rights = Seq((1L, 90L, 1L, "a"), (1L, 150L, 2L, "b"), (1L, 150L, 3L, "c"), (2L, 60L, 4L, "d"))
      .toDF("k", "ts", "id", "v")
    val out = AsofJoin.asofBackward(lefts, rights, "k", "ts", "id", Seq("v"))
      .orderBy($"k", $"ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(3)).orNull)).toSeq
    // left(1,100)→"a"; left(1,200)→latest at 150 with max id → "c"; left(2,50)→none (60 > 50)
    assert(out == Seq((1L, 100L, "a"), (1L, 200L, "c"), (2L, 50L, null)))
  }

  test("AvailableNow trigger drains the backlog then stops on its own") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(
      Ev(t("2024-01-01 00:10:00"), "click", 1.0, 1, 1),
      Ev(t("2024-01-01 01:10:00"), "view", 3.0, 2, 2))
    val q = Streams.streamingWindowedAgg(ms.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("avail_now").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(!q.isActive) // batch-drain semantics: terminates unaided
    assert(spark.table("avail_now").count() == 2)
  }

  test("asof forward and nearest follow merge_asof semantics, tolerance nulls out") {
    import graft.operators.AsofJoin
    val lefts = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 12L))
      .toDF("k", "ts", "id")
    val rights = Seq((1L, 90L, 1L, "a"), (1L, 150L, 2L, "b"), (1L, 150L, 3L, "c"), (2L, 60L, 4L, "d"))
      .toDF("k", "ts", "id", "v")
    def m(df: org.apache.spark.sql.DataFrame) = df.orderBy($"k", $"ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(3)).orNull)).toSeq
    // forward: left(1,100)→next at 150, max id wins → "c"; left(1,200)→none; left(2,50)→"d"
    val fwd = m(AsofJoin.asofForward(lefts, rights, "k", "ts", "id", Seq("v")))
    assert(fwd == Seq((1L, 100L, "c"), (1L, 200L, null), (2L, 50L, "d")))
    // nearest: left(1,100): back=90 (d10) vs fwd=150 (d50) → "a";
    // left(1,200): back=150 → "c"; left(2,50): fwd=60 → "d"
    val near = m(AsofJoin.asofNearest(lefts, rights, "k", "ts", "id", Seq("v")))
    assert(near == Seq((1L, 100L, "a"), (1L, 200L, "c"), (2L, 50L, "d")))
    // equal distances prefer backward
    val l2 = Seq((9L, 100L, 1L)).toDF("k", "ts", "id")
    val r2 = Seq((9L, 90L, 1L, "back"), (9L, 110L, 2L, "fwd")).toDF("k", "ts", "id", "v")
    assert(m(AsofJoin.asofNearest(l2, r2, "k", "ts", "id", Seq("v"))) ==
      Seq((9L, 100L, "back")))
    // tolerance: 10s keeps only matches within 10
    val tolB = m(AsofJoin.asofBackward(lefts, rights, "k", "ts", "id", Seq("v"), Some(10.0)))
    assert(tolB == Seq((1L, 100L, "a"), (1L, 200L, null), (2L, 50L, null)))
    val tolN = m(AsofJoin.asofNearest(lefts, rights, "k", "ts", "id", Seq("v"), Some(10.0)))
    assert(tolN == Seq((1L, 100L, "a"), (1L, 200L, null), (2L, 50L, "d")))
  }

  test("asof salted path (hot key) equals the plain window, both directions") {
    import graft.operators.AsofJoin
    // key 1 is hot (500L+400R rows), keys 2-20 cold; colliding ts
    // within and across sides exercise the tie rules at bucket
    // boundaries, and null v values exercise the ignoreNulls carry
    // across a bucket edge.
    val lefts = ((1 to 500).map(i => (1L, (i * 7 % 211).toLong, 1000L + i)) ++
      (2 to 20).flatMap(k => (1 to 5).map(i =>
        (k.toLong, (i * 13 % 40).toLong, 2000L + k * 10 + i)))).toDF("k", "ts", "id")
    val rights = ((1 to 400).map(i => (1L, (i * 11 % 197).toLong, 3000L + i,
        if (i % 7 == 0) null else s"v$i")) ++
      (2 to 20).flatMap(k => (1 to 3).map(i =>
        (k.toLong, (i * 17 % 40).toLong, 4000L + k * 10 + i, s"w$k-$i"))))
      .toDF("k", "ts", "id", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"k", $"ts", $"id").collect().map(_.toSeq).toSeq
    // hotThreshold=3 → the 1% probe flags key 1 (≈9 sampled rows) and
    // routes it salted; default threshold keeps everything plain
    val saltedB = AsofJoin.asofBackward(lefts, rights, "k", "ts", "id", Seq("v"),
      hotThreshold = 3L)
    assert(canon(saltedB) ==
      canon(AsofJoin.asofBackward(lefts, rights, "k", "ts", "id", Seq("v"))))
    val saltedF = AsofJoin.asofForward(lefts, rights, "k", "ts", "id", Seq("v"),
      hotThreshold = 3L)
    assert(canon(saltedF) ==
      canon(AsofJoin.asofForward(lefts, rights, "k", "ts", "id", Seq("v"))))
  }

  test("asof salted path with NULL timestamps equals the plain window (ADVICE r17)") {
    import graft.operators.AsofJoin
    // hot key 1 with null-ts rows on BOTH sides: the plain window's
    // desc_nulls_last (forward) / asc_nulls_first (backward) placement
    // must survive the range bucketing — pre-fix, a bare null ordinal
    // bucketed FIRST, so forward leaked a null-ts right value into
    // every later bucket's carry-in.
    def lts(i: Int): java.lang.Long =
      if (i % 11 == 0) null else java.lang.Long.valueOf((i * 7 % 211).toLong)
    val lefts = ((1 to 400).map(i => (1L, lts(i), 1000L + i)) ++
      (2 to 10).map(k => (k.toLong, lts(k + 1), 2000L + k)))
      .toDF("k", "ts", "id")
    val rights = ((1 to 300).map(i => (1L, lts(i + 3), 3000L + i,
        if (i % 7 == 0) null else s"v$i")) ++
      (2 to 10).map(k => (k.toLong, lts(k + 2), 4000L + k, s"w$k")))
      .toDF("k", "ts", "id", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"k", $"ts", $"id").collect().map(_.toSeq).toSeq
    for (fwd <- Seq(false, true)) {
      val run = if (fwd) AsofJoin.asofForward _ else AsofJoin.asofBackward _
      val salted = run(lefts, rights, "k", "ts", "id", Seq("v"), None, 3L)
      val plain = run(lefts, rights, "k", "ts", "id", Seq("v"), None, 1000000L)
      assert(canon(salted) == canon(plain), s"forward=$fwd diverged")
    }
  }

  test("multimodal extract keeps schema and batch shape through mapPartitions") {
    val docs = Tables.documents(spark, sf).limit(50)
    val media = Multimodal.mediaFromDocuments(docs)
    assert(media.schema("payload").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == 50)
    val r = feats.orderBy($"media_id").head()
    assert(r.getAs[scala.collection.Seq[Float]]("features").size == 8)
    assert(Seq("jpg", "png", "webp").contains(r.getAs[String]("format")))
    // payload bytes = utf8 text bytes
    val expected = docs.select($"doc_id", length($"text")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = feats.select($"media_id", $"n_bytes").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected)
  }

  test("media near-dup: stub features compose with the similarity machinery") {
    // the real-world pattern (CLIP-embedding near-dup over decoded
    // media) with the decode stubbed: payloads 1 and 2 differ in one
    // byte → stripe features nearly identical; 3 is unrelated
    val texts = Seq(
      (1L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
      (2L, "aaaa bbbb cccc dddd eeee ffff gggg hhhi"),
      (3L, "zz y xxxxxxxxxx w vvvvv u ttttttttt s r"))
    val media = texts.toDF("doc_id", "text")
      .select($"doc_id".as("media_id"), encode($"text", "UTF-8").as("payload"),
        org.apache.spark.sql.functions.struct(
          lit("jpg").as("format"), lit(100).as("width"), lit(100).as("height")).as("meta"))
    val feats = Multimodal.extractFeatures(media)
    val pairs = graft.sim.Similarity.nearDupPairs(
        feats.select($"media_id", $"features"), "media_id", "features", 0.999)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"pairs: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)), s"pairs: $pairs")
  }

  test("drift monitor sink reads ~0 for an in-distribution batch and flags a shifted one") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val baseline = (1 to 400).map(i => Ev(t("2024-01-01 00:00:00"), "c",
      i % 40 / 8.0, i % 7, i)).toDF()
    val ms = MemoryStream[Ev]
    val q = Streams.driftMonitorSink(ms.toDF(), baseline, Seq("value"),
      s"$dir/out", s"$dir/ckpt")
    // batch 0: same distribution as the baseline
    ms.addData((1 to 400).map(i => Ev(t("2024-01-01 00:01:00"), "c", i % 40 / 8.0, i % 7, i)))
    q.processAllAvailable()
    // batch 1: shifted +3
    ms.addData((1 to 400).map(i => Ev(t("2024-01-01 00:02:00"), "c", i % 40 / 8.0 + 3.0, i % 7, i)))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/out")
      .select($"batch_id", $"feature", $"psi").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.keySet == Set(0L, 1L))
    assert(math.abs(out(0L)) < 1e-9, s"in-distribution psi ${out(0L)}")
    assert(out(1L) > 0.2, s"shifted psi ${out(1L)}")
  }

  test("dedup sink verify width is sized from the pair count, floored at parallelism") {
    // pins the r12 scale-killer: AQE size-coalesced the persisted
    // candidate frame to 2 partitions, blind to the quadratic per-pair
    // shingle-intersection cost — verifyWidth sizes from ROWS instead
    val floor = spark.sparkContext.defaultParallelism
    assert(Streams.verifyWidth(spark, 0L) == floor)
    assert(Streams.verifyWidth(spark, 2048L * floor) == floor)
    assert(Streams.verifyWidth(spark, 2048L * (floor + 5)) == floor + 5)
    val cap = spark.conf
      .get("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "1024").toInt
    assert(Streams.verifyWidth(spark, Long.MaxValue / 4096) == math.max(cap, floor))
    // ensureWidth: a single-split frame (one staged microbatch file)
    // is floored at cluster width; an already-wide frame is untouched
    val narrow = spark.range(100).toDF("doc_id").coalesce(1)
    assert(Streams.ensureWidth(narrow).rdd.getNumPartitions == floor)
    val wide = spark.range(100).toDF("doc_id").repartition(floor * 2)
    assert(Streams.ensureWidth(wide).rdd.getNumPartitions == floor * 2)
  }
}
