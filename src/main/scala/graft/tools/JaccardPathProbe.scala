package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** One-off measurement: exact inverted-index Jaccard join vs the
  * PPJoin-style prefix-filtered join on q_ngram_jaccard's actual
  * sub-corpus, at a given SF — decides which exhaustive path the
  * query ships (both are spec'd result-equal; this corpus's high
  * background similarity, median J≈0.46, is adversarial for pruning,
  * so the winner is an empirical question, not a theoretical one).
  */
object JaccardPathProbe {
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      // warm + min-of-2, matching Bench methodology
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f; (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"$label: ${ts.map(_._1).min}%.2f s (pairs=${ts.head._2})")
    }
    val sub = Tables.documents(spark, d).filter($"doc_id" % 10 === 0)
    time("exact ") { Dedup.jaccardJoinExact(Dedup.shingled(sub, "doc_id", "text", 3), 0.62).count() }
    time("prefix") { Dedup.jaccardJoinPrefix(Dedup.shingled(sub, "doc_id", "text", 3), 0.62).count() }
    val oldB = sub.filter($"doc_id" % 20 === 0)
    val newB = sub.filter($"doc_id" % 20 =!= 0)
    time("bipart") {
      Dedup.jaccardJoinBipartite(Dedup.shingled(newB, "doc_id", "text", 3),
        Dedup.shingled(oldB, "doc_id", "text", 3), 0.62).count()
    }
    time("incrq ") {
      graft.queries.DocQueries.qDedupIncremental(spark, d).collect().length.toLong
    }
    if (sys.env.contains("GRAFT_PROBE_EXPLAIN")) {
      val ePlan = Dedup.jaccardJoinExact(Dedup.shingled(sub, "doc_id", "text", 3), 0.62)
      val bPlan = Dedup.jaccardJoinBipartite(Dedup.shingled(newB, "doc_id", "text", 3),
        Dedup.shingled(oldB, "doc_id", "text", 3), 0.62)
      println("=== EXACT PLAN ===")
      println(ePlan.queryExecution.executedPlan.toString.take(4000))
      println("=== BIPARTITE PLAN ===")
      println(bPlan.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
