package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streams

/** The Spark 4 transformWithState operators (Streams.runningStatsTws /
  * ttlDedupTws) on the RocksDB state store — typed named state,
  * cross-batch accumulation, and native state TTL.
  */
class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._

  private val rocksConf = Seq(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    // the async checkpoint-checksum writer can deadlock snapshot upload
    // in single-JVM runs (observed: zipToDfsFile parked forever in
    // ChecksumCancellableFSDataOutputStream.close) — checksums guard
    // against DFS corruption, irrelevant for a local test checkpoint.
    "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false",
    // the default FileContext manager's local rename path shells out
    // (hadoop Shell readlink) and has been observed hanging forever in
    // this sandboxed JVM; the FileSystem-based manager renames via
    // java.io.File — no subprocess.
    "spark.sql.streaming.checkpointFileManagerClass" ->
      "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")

  test("runningStatsTws accumulates typed per-key state across microbatches") {
    withSQLConf(rocksConf: _*) {
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[(Long, Double)]
      val q = Streams.runningStatsTws(ms.toDS())
        .writeStream.format("memory").queryName("tws_stats").outputMode("update").start()
      try {
        ms.addData((1L, 1.0), (1L, 2.0), (2L, 5.0))
        q.processAllAvailable()
        ms.addData((1L, 3.0))
        q.processAllAvailable()
        val rows = spark.table("tws_stats").as[(Long, Long, Double, Double)]
          .collect().toSet
        // batch 1 emissions: cumulative rows after 2 and 1 events
        assert(rows.contains((1L, 2L, 3.0, 2.0)))
        assert(rows.contains((2L, 1L, 5.0, 5.0)))
        // batch 2: user 1's state SURVIVED the batch boundary
        assert(rows.contains((1L, 3L, 6.0, 3.0)))
        assert(rows.size === 3)
      } finally q.stop()
    }
  }

  test("ttlDedupTws: at most one emission per key per TTL window, then the marker expires") {
    withSQLConf(rocksConf: _*) {
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[(Long, Double)]
      // Two ProcessingTime-mode gotchas this test works around:
      // (1) the default trigger re-runs no-data batches back-to-back to
      //     advance the TTL clock (~25 stages/s churn that can wedge the
      //     single-JVM scheduler) — a real trigger interval is both the
      //     production shape and what keeps the run stable;
      // (2) processAllAvailable never returns (every trigger counts as
      //     pending work), so progress is observed by POLLING the sink
      //     and source offsets — the same reason statefulSessions' spec
      //     uses NoTimeout.
      val q = Streams.ttlDedupTws(ms.toDS(), java.time.Duration.ofSeconds(8))
        .writeStream.format("memory").queryName("tws_dedup").outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
        .start()
      def waitFor(what: String)(cond: => Boolean): Unit = {
        val end = System.currentTimeMillis + 60000
        while (!cond && System.currentTimeMillis < end) Thread.sleep(200)
        assert(cond, s"timed out waiting for: $what")
      }
      def rowsConsumed(n: Long): Boolean =
        q.recentProgress.map(_.numInputRows).sum >= n
      try {
        // batch 1: two in-batch repeats of key 7 → exactly one emission
        ms.addData((7L, 1.0), (7L, 2.0))
        waitFor("first emission")(spark.table("tws_dedup").count() === 1)
        val emittedAtMs = System.currentTimeMillis
        // batch 2, inside the TTL window: consumed but suppressed
        ms.addData((7L, 9.0))
        waitFor("3 input rows consumed")(rowsConsumed(3))
        assert(spark.table("tws_dedup").count() === 1)
        assert(System.currentTimeMillis - emittedAtMs < 8000,
          "suppression check overran the TTL window; raise the test TTL")
        // past the TTL: the marker expired, one more passes
        val sleepMs = emittedAtMs + 10000 - System.currentTimeMillis
        if (sleepMs > 0) Thread.sleep(sleepMs)
        ms.addData((7L, 4.0))
        waitFor("post-expiry emission")(spark.table("tws_dedup").count() === 2)
        val vals = spark.table("tws_dedup").as[(Long, Double)].collect().toSeq
        assert(vals.map(_._2).contains(4.0))
      } finally q.stop()
    }
  }
}
