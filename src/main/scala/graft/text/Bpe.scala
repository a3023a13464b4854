package graft.text

import scala.collection.mutable.{ArrayBuffer, ListBuffer}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A word with its symbol segmentation and corpus frequency — one row
  * of the BPE working vocabulary.
  */
case class BpeWord(syms: Seq[String], cnt: Long)

/** One learned merge: at `rank`, the adjacent pair (left, right) had
  * the highest frequency-weighted count and was fused into left+right.
  */
case class BpeMerge(rank: Int, left: String, right: String, pairCount: Long)

/** Byte-pair-encoding vocabulary training (SURVEY.md §2.7) — the
  * tokenizer-construction step of an LLM data pipeline, Spark-shaped
  * the way BPE actually scales: the CORPUS is touched exactly once
  * (the [[wordCounts]] token explode + count — one shuffle); every
  * merge iteration then runs on the word-frequency table, whose size
  * is the distinct-word vocabulary — independent of corpus bytes, so
  * 100 TB of text and 100 GB of text pay the same per-merge cost once
  * the counts exist. This is the classic frequency-dict formulation
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
  * with Subword Units"): pair statistics are weighted by word
  * frequency; a merge rewrites occurrences left-to-right,
  * non-overlapping.
  *
  * The per-merge transforms are typed Dataset ops (a bounded
  * vocab-frame map, NOT a corpus-sized UDF path — same rationale as
  * the mapPartitions multimodal decode); the top-pair lookup collects
  * ONE row per round. Rounds localCheckpoint the vocab so lineage
  * stays flat across up to thousands of merges.
  */
object Bpe {

  /** Word-frequency table of `textCol` — the only corpus-sized pass
    * (explode + hash agg, one shuffle on the word).
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Greedy left-to-right, non-overlapping fuse of (a,b) → a+b —
    * Sennrich merge semantics ("aaa" under (a,a) → ["aa","a"]).
    */
  def mergePair(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  /** Learn up to `numMerges` merges from a (w, cnt) word-frequency
    * frame. Ties break lexicographically on (left, right) so the
    * result is deterministic across partitionings. Stops early when no
    * adjacent pair remains (every word fused to one symbol).
    */
  def learnMerges(wordCounts: DataFrame, numMerges: Int): Seq[BpeMerge] = {
    val spark = wordCounts.sparkSession
    import spark.implicits._
    var vocab: Dataset[BpeWord] = wordCounts.select(col("w").cast("string"), col("cnt").cast("long"))
      .as[(String, Long)]
      .map { case (w, c) => BpeWord(w.toCharArray.map(_.toString).toSeq, c) }
      .localCheckpoint()
    val merges = ArrayBuffer.empty[BpeMerge]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val top = vocab
        .flatMap(v =>
          if (v.syms.length < 2) Iterator.empty
          else v.syms.iterator.zip(v.syms.iterator.drop(1)).map { case (a, b) => (a, b, v.cnt) })
        .toDF("left", "right", "cnt")
        .groupBy("left", "right").agg(sum("cnt").as("n"))
        .orderBy(desc("n"), asc("left"), asc("right"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rt, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += BpeMerge(r, l, rt, n)
        val prev = vocab
        vocab = vocab.map(v => BpeWord(mergePair(v.syms, l, rt), v.cnt)).localCheckpoint()
        prev.unpersist()
        r += 1
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** Weighted adjacent-pair multiset of one segmentation. */
  private def weightedPairs(syms: Seq[String], cnt: Long): Iterator[(String, String, Long)] =
    if (syms.length < 2) Iterator.empty
    else syms.iterator.zip(syms.iterator.drop(1)).map { case (a, b) => (a, b, cnt) }

  /** Pair-count deltas from applying merge (l, r) to one word: EMPTY
    * when the word lacks the (l, r) adjacency — the property that makes
    * [[learnMergesIncremental]]'s per-round shuffle proportional to
    * affected words — otherwise the word's old pairs at −cnt plus its
    * rewritten pairs at +cnt (cancellation under sum leaves exactly the
    * counts a full re-explode would produce).
    */
  private[graft] def pairDeltas(w: BpeWord, l: String, r: String): Seq[(String, String, Long)] = {
    val affected = w.syms.length >= 2 &&
      w.syms.iterator.zip(w.syms.iterator.drop(1)).exists(p => p._1 == l && p._2 == r)
    if (!affected) Nil
    else (weightedPairs(w.syms, -w.cnt) ++
      weightedPairs(mergePair(w.syms, l, r), w.cnt)).toSeq
  }

  /** [[learnMerges]] with INCREMENTAL pair statistics — the form that
    * scales to thousands of merges: the (left, right) → n frame is
    * built once from the initial vocabulary and thereafter maintained
    * by DELTAS. After merging (a, b), only words containing the "a b"
    * adjacency change, and for each the old pairs enter at −cnt and the
    * rewritten pairs at +cnt ([[pairDeltas]]); the per-round shuffle is
    * those delta rows — proportional to affected words (Zipf-small
    * after the first merges) — instead of re-exploding every symbol of
    * every word. Identical output to [[learnMerges]] (same counts, same
    * lexicographic tie-break; spec-pinned), because the delta update is
    * an exact algebraic rewrite of the full aggregation.
    */
  def learnMergesIncremental(wordCounts: DataFrame, numMerges: Int): Seq[BpeMerge] = {
    val spark = wordCounts.sparkSession
    import spark.implicits._
    var vocab: Dataset[BpeWord] = wordCounts.select(col("w").cast("string"), col("cnt").cast("long"))
      .as[(String, Long)]
      .map { case (w, c) => BpeWord(w.toCharArray.map(_.toString).toSeq, c) }
      .localCheckpoint()
    var pairs: DataFrame = vocab
      .flatMap(v => weightedPairs(v.syms, v.cnt))
      .toDF("left", "right", "n")
      .groupBy("left", "right").agg(sum("n").as("n"))
      .localCheckpoint()
    val merges = ArrayBuffer.empty[BpeMerge]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val top = pairs.orderBy(desc("n"), asc("left"), asc("right")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rt, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += BpeMerge(r, l, rt, n)
        val deltas = vocab.flatMap(v => pairDeltas(v, l, rt)).toDF("left", "right", "n")
        val prevPairs = pairs
        pairs = pairs.unionByName(deltas)
          .groupBy("left", "right").agg(sum("n").as("n"))
          .filter(col("n") > 0)
          .localCheckpoint()
        prevPairs.unpersist()
        val prevVocab = vocab
        vocab = vocab.map(v => BpeWord(mergePair(v.syms, l, rt), v.cnt)).localCheckpoint()
        prevVocab.unpersist()
        r += 1
      }
    }
    vocab.unpersist()
    pairs.unpersist()
    merges.toSeq
  }

  /** Segment one word with a learned merge list (rank order). */
  def encodeWord(w: String, merges: Seq[BpeMerge]): Seq[String] =
    merges.sortBy(_.rank).foldLeft(w.toCharArray.map(_.toString).toSeq) {
      (syms, m) => mergePair(syms, m.left, m.right)
    }

  /** Apply learned merges to a whole corpus — the tokenizer-encode
    * pass of data prep. mapPartitions is the right tool here (same
    * justification as the multimodal decode): rank-priority merge
    * application is an imperative per-token loop no Column expression
    * expresses, the merge list is bounded (it ships in the task
    * closure), and a per-partition word→subwords memo exploits the
    * Zipfian repeat rate so most tokens hit the cache instead of the
    * merge loop. One pass over the corpus, zero shuffles; output rows
    * carry (id, subwords, n_tokens, n_subwords) for downstream
    * packing/budgeting.
    */
  def encodeCorpus(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[BpeMerge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ms = merges.sortBy(_.rank).map(m => (m.left, m.right))
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val cache = scala.collection.mutable.HashMap.empty[String, Seq[String]]
        it.map { case (id, text) =>
          val toks = text.trim.split("\\s+").toSeq.filter(_.nonEmpty)
          val subs = toks.flatMap(w => cache.getOrElseUpdate(w,
            ms.foldLeft(w.toCharArray.map(_.toString).toSeq) {
              (s, p) => mergePair(s, p._1, p._2)
            }))
          (id, subs, toks.length.toLong, subs.length.toLong)
        }
      }
      .toDF(idCol, "subwords", "n_tokens", "n_subwords")
  }

  /** Final subword vocabulary implied by the merges: all single
    * characters seen in the word table plus one token per merge.
    */
  def vocabOf(wordCounts: DataFrame, merges: Seq[BpeMerge]): Seq[String] = {
    val spark = wordCounts.sparkSession
    import spark.implicits._
    val chars = wordCounts.select(explode(split(col("w"), "")).as("ch"))
      .filter(length(col("ch")) > 0).distinct().as[String].collect().toSeq
    (chars ++ merges.sortBy(_.rank).map(m => m.left + m.right)).distinct
  }
}
