package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.{Packing, QualityClassifier}

/** End-to-end LLM-corpus curation: the README composition executed as
  * one spec over a corpus with PLANTED artifacts, so every stage's
  * effect is exactly countable — rule-gated quality filtering
  * (weak-label classifier), exact dedup, near-dup clustering, and
  * sequence packing, chained the way a real pipeline chains them.
  * Each stage only shrinks the corpus, each removal is attributable,
  * and the whole chain is deterministic (asserted by re-running it).
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("planted junk, exact dups, and near-dups fall out at the right stage; survivors pack") {
    val rnd = new scala.util.Random(31)
    val vocab = (1 to 40).map(i => s"tok$i")
    val spam = (1 to 8).map(i => s"junk$i")
    def prose(): String =
      Seq.fill(14)(vocab(rnd.nextInt(vocab.size))).distinct.padTo(7, "pad").mkString(" ")

    // 40 clean docs (ids 1-40)
    val clean = (1L to 40L).map(i => (i, prose()))
    // 8 junk docs: one spam token repeated (ids 101-108)
    val junk = (101L to 108L).map(i => (i, Seq.fill(14)(spam(((i - 101) % 8).toInt)).mkString(" ")))
    // 5 exact duplicates of clean docs 1-5 (ids 201-205)
    val exactDups = (201L to 205L).map(i => (i, clean((i - 201).toInt)._2))
    // 3 near-duplicates of clean docs 6-8: one token appended (ids 301-303)
    val nearDups = (301L to 303L).map(i => (i, clean((i - 301).toInt + 5)._2 + " extra"))
    val corpus = (clean ++ junk ++ exactDups ++ nearDups).toDF("doc_id", "text")

    def runPipeline(): (Long, Long, Long, Seq[Long], Map[Long, Long]) = {
      // stage 1 — learned quality gate bootstrapped from the rule
      val labeled = corpus.withColumn("wl", QualityClassifier.weakLabel($"text"))
      val model = QualityClassifier.train(labeled, "text", "wl", numFeatures = 1 << 10)
      val quality = QualityClassifier.score(model, corpus, "text")
        .filter($"quality_score" >= 0.5).select($"doc_id", $"text")
      // stage 2 — exact dedup (digest-keyed, keeps the smallest id; its
      // output is the keeper id list, so rejoin for the text)
      val deduped = quality.join(
        Dedup.exactDedup(quality, "doc_id", "text").select($"doc_id"), Seq("doc_id"))
      // stage 3 — near-dup pairs -> clusters -> keep min id per cluster
      val pairs = Dedup.minhashNearDup(deduped, "doc_id", "text", n = 3,
        numPerm = 64, seed = 42L, threshold = 0.8)
      val clusters = Dedup.dupClusters(deduped.select($"doc_id"), "doc_id", pairs)
        .withColumnRenamed("id", "doc_id")
      val kept = deduped.join(clusters, Seq("doc_id"))
        .filter($"cluster" === $"doc_id")
        .select($"doc_id", $"text")
      // stage 4 — pack survivors into token-budget training sequences
      val packed = Packing.packSequences(
        kept.withColumn("n_tokens", size(split(trim($"text"), "\\s+")).cast("long")),
        $"doc_id", $"n_tokens", budget = 64L)
      (quality.count(), deduped.count(), kept.count(),
        kept.select($"doc_id").collect().map(_.getLong(0)).toSeq.sorted,
        packed.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin")).toMap)
    }

    val (nQuality, nDeduped, nKept, keptIds, packed) = runPipeline()
    // quality gate drops exactly the 8 junk docs (clean, exact-dup and
    // near-dup texts are all diverse prose the classifier scores high)
    assert(nQuality == 48, s"quality survivors $nQuality")
    // exact dedup drops exactly the 5 verbatim copies
    assert(nDeduped == 43, s"post-exact $nDeduped")
    // near-dup clustering drops exactly the 3 appended variants
    assert(nKept == 40, s"post-near-dup $nKept")
    assert(keptIds == (1L to 40L), s"kept $keptIds")
    // packing covers every survivor exactly once, bins are dense from 0
    assert(packed.keySet == (1L to 40L).toSet)
    val bins = packed.values.toSeq.distinct.sorted
    assert(bins == (0L until bins.size.toLong), s"bins $bins")
    // the whole chain is deterministic
    val second = runPipeline()
    assert(second == ((nQuality, nDeduped, nKept, keptIds, packed)))
  }
}
