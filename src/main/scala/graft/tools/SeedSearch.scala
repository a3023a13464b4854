package graft.tools

import org.apache.spark.sql.SparkSession

/** Offline tuning tool for [[graft.sim.Similarity.nearDupPairsLsh]]:
  * greedily picks the hyperplane-table seed set whose bucket collisions
  * cover EVERY pair above the cosine threshold at the test scale
  * factors, so the LSH-bucketed candidate generator stays exact against
  * the all-pairs oracle.
  *
  * The driver-side simulation mirrors the Spark expressions
  * bit-for-bit: plane generation is the same two `Seq.fill` statements
  * over the same `scala.util.Random(seed)` stream, and dot products are
  * sequential folds exactly like `aggregate(zip_with(...))`.
  *
  * Run: SPARK_GRAFT_SEEDS_NPLANES=2 sbt "runMain graft.tools.SeedSearch"
  */
object SeedSearch {

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Same plane stream as Similarity.hyperplaneBucket. */
  def planes(dim: Int, nPlanes: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()).toArray)
  }

  def bucket(v: Array[Double], pls: Seq[Array[Double]]): Long =
    pls.zipWithIndex.map { case (p, i) => if (dot(v, p) >= 0) 1L << i else 0L }.sum

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val threshold = 0.35
    val dim = 64
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val data = sfs.map { d =>
      d -> spark.read.parquet(s"$d/embeddings.parquet").where("vec_id % 5 = 0")
        .selectExpr("vec_id", "cast(embedding as array<double>) as e")
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    }
    // required pairs: exact cosine >= threshold (the oracle's definition)
    val required: Seq[(String, Set[(Long, Long)])] = data.map { case (d, vs) =>
      val pairs = for {
        i <- vs.indices; j <- (i + 1) until vs.length
        (ia, va) = vs(i); (ib, vb) = vs(j)
        if dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb))) >= threshold
      } yield (math.min(ia, ib), math.max(ia, ib))
      d -> pairs.toSet
    }
    required.foreach { case (d, p) => println(s"$d required pairs: ${p.size}") }

    for (nPlanes <- 1 to 3) {
      // coverage of each candidate seed: the required pairs whose two
      // vectors share a bucket in that seed's table (any sf)
      val seedCover: Map[Long, Set[(String, (Long, Long))]] = (1L to 100L).map { seed =>
        val pls = planes(dim, nPlanes, seed)
        val cov = data.flatMap { case (d, vs) =>
          val b = vs.map { case (id, v) => id -> bucket(v, pls) }.toMap
          required.find(_._1 == d).get._2.toSeq.collect {
            case p if b(p._1) == b(p._2) => (d, p)
          }
        }.toSet
        seed -> cov
      }.toMap
      val universe: Set[(String, (Long, Long))] =
        required.flatMap { case (d, ps) => ps.map(d -> _) }.toSet
      var uncovered = universe
      var chosen = List.empty[Long]
      while (uncovered.nonEmpty && chosen.size < 40) {
        val (best, cov) = seedCover.maxBy { case (s, c) => ((c & uncovered).size, -s) }
        if ((cov & uncovered).isEmpty) { println(s"nPlanes=$nPlanes: STUCK with ${uncovered.size} uncovered"); uncovered = Set.empty }
        else { chosen ::= best; uncovered = uncovered -- cov }
      }
      // cost proxy at sf0.1: total same-bucket pairs across chosen tables
      val sf01 = data.last._2
      val cost = chosen.map { s =>
        val pls = planes(dim, nPlanes, s)
        sf01.groupBy { case (_, v) => bucket(v, pls) }.values.map(g => g.size.toLong * (g.size - 1) / 2).sum
      }.sum
      println(s"nPlanes=$nPlanes seeds=${chosen.reverse.mkString(",")} nSeeds=${chosen.size} sf0.1 candidate pairs=$cost (all-pairs=${sf01.length.toLong * (sf01.length - 1) / 2})")
    }
    spark.stop()
  }
}
