package graft.streaming

/** Per-phase wall-clock of the end-to-end stream drain harnesses
  * (r18, VERDICT r17 #4): q_stream_dedup_drain read 20.6 / 47.1 /
  * 80.5 s across three sessions on unchanged code and nobody could
  * attribute the spread — the drain seconds mix staging writes, sink
  * construction (corpus index build), the microbatches themselves,
  * and the read-back. Each harness records its phases here and Bench
  * emits them alongside the stream_e2e totals, so a capture
  * self-explains which term moved. Keyed by query name; per-batch
  * trigger times ride as "b0".."bN" entries.
  */
object DrainPhases {
  private val phases =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[(String, Double)]]()

  def reset(q: String): Unit = { phases.remove(q); () }

  def record(q: String, phase: String, sec: Double): Unit = {
    phases.merge(q, Vector(phase -> sec), (a, b) => a ++ b)
    ()
  }

  /** Time `f` and record it under (q, phase) — exceptions still record
    * (a failed phase's duration is attribution evidence too).
    */
  def timed[A](q: String, phase: String)(f: => A): A = {
    val t0 = System.nanoTime()
    try f finally record(q, phase, (System.nanoTime() - t0) / 1e9)
  }

  def get(q: String): Seq[(String, Double)] =
    Option(phases.get(q)).getOrElse(Vector.empty)
}
