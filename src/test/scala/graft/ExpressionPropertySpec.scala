package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.dedup.Dedup

/** Property-style coverage for the custom Catalyst expressions: inputs
  * are scalacheck-generated (fixed seeds — reruns are deterministic)
  * and each property embeds ALL its cases as rows of one DataFrame, so
  * hundreds of cases cost one Spark job through the CODEGEN path, with
  * the reference semantics computed side-by-side in the same row.
  */
class ExpressionPropertySpec extends SparkSpec {
  import spark.implicits._

  private def gen[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("sorted_intersect_size == size(array_intersect) on generated sorted sets") {
    // small alphabet forces real overlaps; sets are sorted+distinct per
    // the expression's input invariant (shingled() provides it in prod)
    val word = Gen.stringOfN(3, Gen.alphaLowerChar)
    val arr = Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, word))
      .map(_.distinct.sorted)
    val pairs = gen(Gen.listOfN(400, Gen.zip(arr, arr)), 7L)
    val df = pairs.toDF("a", "b").select(
      graft.functions.SortedIntersectSize.sortedIntersectSize($"a", $"b").as("fast"),
      size(array_intersect($"a", $"b")).as("ref"))
    assert(df.filter($"fast" =!= $"ref").count() == 0)
  }

  test("MinHashSig == lambda form on generated hash arrays") {
    val P = 1000000007L
    val hashes = Gen.chooseNum(0, 60)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, P - 1)))
    val rows = gen(Gen.listOfN(300, hashes), 11L)
    val coeffs = Dedup.permCoeffs(32, 5L)
    val df = rows.toDF("hs").select($"hs",
      Dedup.minhashSignature($"hs", coeffs).as("fast"),
      Dedup.minhashSignatureLambda($"hs", coeffs).as("ref"))
    // empty input: codegen yields NULL, the lambda an ALL-NULL array —
    // both produce zero band-join candidates; the empty contract is
    // pinned in TextDedupSimSpec, so compare non-empty inputs here
    assert(df.filter(size($"hs") > 0).filter(not($"fast" <=> $"ref")).count() == 0)
    assert(df.filter(size($"hs") === 0).filter($"fast".isNotNull).count() == 0)
  }

  test("simhash60 == independent Scala reimplementation on generated ASCII tokens") {
    val token = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n,
      Gen.frequency(9 -> Gen.alphaNumChar, 1 -> Gen.oneOf('.', ',', '-'))).map(_.mkString))
    val doc = Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n, token))
    val docs = gen(Gen.listOfN(250, doc), 13L)
    val P = 1000000007L
    def reference(tokens: Seq[String]): Long = {
      val counts = new Array[Long](60)
      tokens.foreach { t =>
        var h1 = 0L; var h2 = 0L
        t.foreach { ch => h1 = (h1 * 31 + ch) % P; h2 = (h2 * 37 + ch) % P }
        val h = h1 | (h2 << 30)
        (0 until 60).foreach(b => counts(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L))
      }
      (0 until 60).foldLeft(0L)((acc, b) => if (counts(b) >= 0) acc | (1L << b) else acc)
    }
    val expected = docs.map(reference)
    val got = docs.zipWithIndex.map { case (d, i) => (i, d) }.toDF("i", "tokens")
      .select($"i", graft.functions.SimHash60.simhash60($"tokens").as("sh"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    docs.indices.foreach(i => assert(got(i) == expected(i), s"doc $i: ${docs(i)}"))
  }

  test("MisraGriesTopK: heavy keys guaranteed, counts in the n/m band, merge-safe") {
    // zipf-ish stream over a keyspace much larger than m: key_i has
    // weight ~ n/i for heads plus a long singleton tail
    val heads = (1 to 20).flatMap(i => Seq.fill(2000 / i)(s"k$i"))
    val tail = (1 to 3000).map(i => s"t$i")
    val stream = new scala.util.Random(23L).shuffle(heads ++ tail)
    val n = stream.size
    val m = 64
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // 32 partitions force partial-aggregation merges on every run
    val out = stream.toDF("k").repartition(32)
      .agg(graft.functions.MisraGriesTopK.heavyHitters($"k", m).as("hh"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size <= m)
    val bound = n.toDouble / m
    // every key with true frequency > n/m must be present
    exact.filter(_._2 > bound).keys.foreach(k =>
      assert(out.contains(k), s"heavy key $k (${exact(k)}) missing; bound $bound"))
    // reported counts are lower bounds within the band
    out.foreach { case (k, c) =>
      assert(c <= exact(k), s"$k overcounted: $c > ${exact(k)}")
      assert(exact(k) - c <= bound, s"$k undercounted beyond band: $c vs ${exact(k)}")
    }
    // the head of the summary is the true top key
    val top = out.maxBy(_._2)._1
    assert(top == "k1", s"top key $top")
  }
}
