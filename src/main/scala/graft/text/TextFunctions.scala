package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines
  * (SURVEY.md §2.7). Everything here is built from codegen'd
  * `functions._` lambdas — no UDFs — so the hot path stays inside
  * whole-stage codegen and scales linearly with the scan.
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

  /** Word n-gram shingles. */
  def wordNgrams(c: Column, n: Int): Column = {
    val t = tokens(c)
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - lit(n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))))
      .otherwise(array())
  }

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

  /** Composite quality score in [0,1]-ish: rewards mid-length docs and
    * stopword presence, penalizes punctuation soup and shouting —
    * the shape of a C4/Gopher-style quality filter.
    */
  def qualityScore(c: Column, stopwords: Seq[String]): Column =
    least(length(c).cast("double") / lit(500.0), lit(1.0)) * lit(0.4) +
      least(stopwordRatio(c, stopwords) * lit(10.0), lit(1.0)) * lit(0.3) +
      (lit(1.0) - least(punctRatio(c) * lit(5.0), lit(1.0))) * lit(0.2) +
      (lit(1.0) - upperRatio(c)) * lit(0.1)

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
