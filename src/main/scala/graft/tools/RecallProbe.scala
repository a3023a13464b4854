package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sim.Similarity

/** One-off measurement: recall@k of q_ann_lsh's shipped LSH config vs
  * the exact top-k on the same sub-corpus, across SFs — used to pick
  * the query's emitted recall floor honestly (measured, not guessed).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val d = s"/root/testdata/sf$sf"
      val sub = Tables.embeddings(spark, d).filter($"vec_id" % 5 === 0)
      val approx = Similarity.annLshMulti(sub, "vec_id", "embedding", dim = 64,
        nPlanes = 4, seeds = Seq(7L, 19L, 31L), k = 3)
      val exact = Similarity.topK(sub, sub, "vec_id", "embedding", 3)
      val nExact = exact.count()
      val nHits = approx.select($"query_id", $"neighbor_id")
        .join(exact.select($"query_id", $"neighbor_id"), Seq("query_id", "neighbor_id"), "left_semi")
        .count()
      println(f"sf$sf: |sub|=${sub.count()} recall@3 = ${nHits.toDouble / nExact}%.4f ($nHits/$nExact)")
    }
    spark.stop()
  }
}
