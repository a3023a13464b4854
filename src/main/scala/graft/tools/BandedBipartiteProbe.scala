package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** Measurement harness for the banded bipartite candidate path on the
  * UNCAPPED q_dedup_incremental split (doc_id %10 subset, %20 old/new)
  * — the configuration the r10 sweep proved floods with r=1 banding.
  * Prints, per (b, r) geometry given as args: candidate count, verified
  * pair count at J >= 0.62, and wall-clock for the full library path.
  *
  * Usage: runMain graft.tools.BandedBipartiteProbe <sfDir> b:r [b:r ...]
  *   e.g.  ... benchdata/sf1 32:1 32:2 16:4
  */
object BandedBipartiteProbe {
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = graft.GraftSession.builder("banded-probe", cpus.toInt)
      .master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val geoms = args.drop(1).map { g =>
      val Array(b, r) = g.split(":"); (b.toInt, r.toInt)
    }.toSeq match { case Nil => Seq((32, 1), (32, 2)); case gs => gs }

    val sub = Tables.documents(spark, d).filter($"doc_id" % 10 === 0)
    val oldB = sub.filter($"doc_id" % 20 === 0)
    val newB = sub.filter($"doc_id" % 20 =!= 0)
    println(s"dir=$d  new=${newB.count()}  old=${oldB.count()} (uncapped)")

    for ((b, r) <- geoms) {
      def sigs(df: org.apache.spark.sql.DataFrame) =
        Dedup.shingled(df, "doc_id", "text", 3)
          .withColumn("hs", Dedup.shingleHashes($"sh"))
          .select($"id", Dedup.minhashSignature($"hs", Dedup.permCoeffs(b * r, 42L)).as("sig"))
      val t0 = System.nanoTime()
      val nCands = Dedup.lshCandidatesBipartiteBanded(sigs(newB), sigs(oldB), b, r).count()
      val tc = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nPairs = Dedup.minhashNearDupBipartiteBanded(
        newB, oldB, "doc_id", "text", 3, b, r, 42L, 0.62).count()
      val tv = (System.nanoTime() - t1) / 1e9
      println(f"b=$b%3d r=$r  candidates=$nCands%10d (${tc}%6.1f s)  " +
        f"verified-pairs=$nPairs%8d  full-path=${tv}%6.1f s")
    }
    spark.stop()
  }
}
