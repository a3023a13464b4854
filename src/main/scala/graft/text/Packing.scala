package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing — the "concatenate the corpus in order, split at
  * every `budget` tokens" step that turns a cleaned document corpus
  * into fixed-size training sequences (the standard LLM pretraining
  * batch layout). A document is assigned to the bin its FIRST token
  * lands in, so bins are contiguous runs of the document order and a
  * boundary-crossing document overflows its bin (fill can exceed 1.0)
  * — exactly the concat-then-split semantics, computed without
  * concatenating anything.
  *
  * Scale shape: the cumulative token count rides
  * [[graft.operators.GlobalRank.withPrefixSums]] (range partition +
  * per-partition offsets — never a single-partition window, which
  * would funnel the whole corpus through one task). The result is
  * materialized eagerly (localCheckpoint) so the prefix-sum cache can
  * be released here instead of leaking a release obligation to the
  * caller; as elsewhere, checkpoint blocks are not fault-tolerant —
  * persist promptly if the assignment must outlive executor churn.
  */
object Packing {

  /** Append a `bin` column: 0-based index of the `budget`-token
    * training sequence in which each document STARTS, under the total
    * order `orderCol` (must be unique — use the document key).
    * `tokensCol` is each document's token count.
    */
  def packSequences(docs: DataFrame, orderCol: Column, tokensCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val base = docs.withColumn("__nt", tokensCol.cast("long"))
    val ps = graft.operators.GlobalRank.withPrefixSums(
      base, Seq(orderCol.asc), Seq("__cum" -> col("__nt")))
    val out = ps.df
      // (cum - nt) = tokens BEFORE this doc; integer-divide by budget.
      // __cum is double (prefix sums accumulate as double) — exact for
      // corpora under 2^53 tokens, far past 100 TB of text.
      .withColumn("bin", floor((col("__cum") - col("__nt")) / lit(budget.toDouble)).cast("long"))
      .drop("__cum", "__nt")
      .localCheckpoint()
    ps.release()
    out
  }
}
