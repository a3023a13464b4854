package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines
  * (SURVEY.md §2.7). No UDFs anywhere; note that Spark's higher-order
  * functions (`filter`/`transform`/`aggregate`) are INTERPRETED, not
  * codegen'd — fine for a single ratio, but hot paths that need
  * several counters per row should use [[qualityStats]] (a one-pass
  * codegen'd expression) instead of stacking the lambda forms.
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword segmentation: words plus trailing punctuation as
    * separate tokens (regex analog of a GPT-2-style pre-tokenizer).
    */
  def regexTokens(c: Column): Column =
    split(trim(c), "(?=[^A-Za-z0-9\\s])|\\s+")

  /** Character n-gram shingles (positional, with duplicates). Empty for
    * texts shorter than n (guards Spark's descending-sequence gotcha).
    */
  def charNgrams(c: Column, n: Int): Column =
    when(length(c) >= n,
      transform(sequence(lit(1), length(c) - lit(n - 1)), i => c.substr(i, lit(n))))
      .otherwise(array())

  /** Distinct character n-gram shingle set. */
  def shingleSet(c: Column, n: Int): Column = array_distinct(charNgrams(c, n))

  /** Word n-grams from an already-materialized token-array column.
    * Prefer this over [[wordNgrams]] when the input can be projected
    * first: higher-order functions are interpreted (no
    * common-subexpression elimination), so handing them the raw
    * `tokens(text)` expression re-runs the regex split inside EVERY
    * lambda element — O(tokens²) per row.
    */
  def wordNgramsOf(t: Column, n: Int): Column =
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - lit(n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))))
      .otherwise(array())

  /** Word n-gram shingles (tokenizes inline — see [[wordNgramsOf]]). */
  def wordNgrams(c: Column, n: Int): Column = wordNgramsOf(tokens(c), n)

  /** Fraction of tokens that are in `words`. */
  def stopwordRatio(c: Column, words: Seq[String]): Column = {
    val t = tokens(c)
    size(filter(t, x => x.isin(words: _*))).cast("double") / size(t)
  }

  /** Fraction of characters that are sentence punctuation. */
  def punctRatio(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[.,!?;:]", ""))).cast("double") / length(c)

  /** Fraction of characters that are uppercase A-Z. */
  def upperRatio(c: Column): Column =
    length(regexp_replace(c, "[^A-Z]", "")).cast("double") / length(c)

  /** Mean token length in characters. */
  def meanTokenLen(c: Column): Column = {
    val t = tokens(c)
    aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t)
  }

  /** One-pass quality counters {len, n_tokens, stop_hits, punct,
    * upper} as a struct — the codegen'd
    * [[graft.functions.TextQualityStats]] expression. Select this ONCE
    * and derive every ratio from its fields; the lambda forms above
    * would re-tokenize per ratio in interpreted eval.
    */
  def qualityStats(c: Column, stopwords: Seq[String]): Column =
    graft.functions.TextQualityStats.stats(c, stopwords)

  /** stopwordRatio derived from a [[qualityStats]] struct. */
  def stopwordRatioOf(st: Column): Column =
    st.getField("stop_hits").cast("double") / st.getField("n_tokens")

  /** punctRatio derived from a [[qualityStats]] struct. */
  def punctRatioOf(st: Column): Column =
    st.getField("punct").cast("double") / st.getField("len")

  /** upperRatio derived from a [[qualityStats]] struct. */
  def upperRatioOf(st: Column): Column =
    st.getField("upper").cast("double") / st.getField("len")

  /** Composite quality score from a [[qualityStats]] struct. */
  def qualityScoreOf(st: Column): Column =
    least(st.getField("len").cast("double") / lit(500.0), lit(1.0)) * lit(0.4) +
      least(stopwordRatioOf(st) * lit(10.0), lit(1.0)) * lit(0.3) +
      (lit(1.0) - least(punctRatioOf(st) * lit(5.0), lit(1.0))) * lit(0.2) +
      (lit(1.0) - upperRatioOf(st)) * lit(0.1)

  /** Composite quality score in [0,1]-ish: rewards mid-length docs and
    * stopword presence, penalizes punctuation soup and shouting —
    * the shape of a C4/Gopher-style quality filter. One pass over the
    * text (subexpression elimination collapses the struct accesses).
    */
  def qualityScore(c: Column, stopwords: Seq[String]): Column =
    qualityScoreOf(qualityStats(c, stopwords))

  /** Rolling polynomial hash fingerprint over the full text:
    * fold(acc*31 + codepoint) mod 1e9+7. Deterministic across engines
    * (same fold order). Delegates to the codegen'd
    * [[graft.functions.PolyHash]] expression — one byte loop in
    * generated Java, vs the lambda pipeline's O(len) substring array
    * per row (identical values on ASCII text, oracle-checked).
    */
  def fingerprint(c: Column): Column = graft.functions.PolyHash.polyHash(c)

  /** Stopword-profile language ID: count profile hits per language,
    * pick the max score (ties → alphabetically first language). The
    * struct-min trick ((-score, lang)) keeps it a pure expression.
    */
  def langId(c: Column, profiles: Seq[(String, Seq[String])]): Column = {
    val t = tokens(c)
    val scored = profiles.sortBy(_._1).map { case (lang, words) =>
      struct(
        (-size(filter(t, x => x.isin(words: _*)))).as("negScore"),
        lit(lang).as("lang"))
    }
    array_min(array(scored: _*)).getField("lang")
  }
}
