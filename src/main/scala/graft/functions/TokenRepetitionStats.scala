package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token repetition / diversity counters for the Gopher-style
  * repetition quality filters (reference: the corpus quality filtering
  * family next to `reference/src/feature/` text prep; the signals
  * themselves are the public C4/Gopher "repetitive content" measures:
  * duplicate-token fraction, most-common-token fraction, duplicate
  * n-gram fraction, unigram entropy).
  *
  * The declarative forms need one nested higher-order-function pipeline
  * PER signal (`array_max(transform(array_distinct(tk), x ->
  * size(filter(tk, y -> y = x))))` is O(distinct × tokens) in an
  * interpreter, and entropy repeats the same scan) — four signals
  * re-tokenize and re-count the same row four times. This expression
  * builds one token→count hash map per row and returns every counter
  * the four signals need as a struct:
  *
  *   {n_tokens, n_distinct, top_count, sum_c_ln_c, n_distinct_bigrams}
  *
  *   - n_tokens           = numElements of the array (null slots count
  *                          toward length, matching DuckDB `len(tk)`)
  *   - n_distinct         = distinct non-null tokens (byte equality)
  *   - top_count          = occurrences of the most frequent token
  *   - sum_c_ln_c         = Σ c·ln(c) over token counts — unigram
  *                          entropy is ln(n) − sum_c_ln_c/n
  *   - n_distinct_bigrams = distinct adjacent token pairs (pairs
  *                          touching a null slot are skipped), same
  *                          contract as [[CountDistinctWordBigrams]]
  */
case class TokenRepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenRepetitionStats.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_repetition_stats requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenRepetitionUtil.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokenRepetitionUtil$$.MODULE$$.stats($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenRepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_count", IntegerType, nullable = false),
    StructField("sum_c_ln_c", DoubleType, nullable = false),
    StructField("n_distinct_bigrams", IntegerType, nullable = false)))

  def stats(tokens: Column): Column =
    GraftBridge.column(TokenRepetitionStats(GraftBridge.expression(tokens)))
}

/** The per-row scan, shared by interpreted eval and generated code. */
object TokenRepetitionUtil {

  def stats(arr: ArrayData): InternalRow = {
    val m = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val c = counts.get(t)
        counts.put(t, if (c == null) 1 else c + 1)
      }
      i += 1
    }
    var top = 0
    var sumClnC = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().intValue()
      if (c > top) top = c
      if (c > 1) sumClnC += c * math.log(c.toDouble) // ln(1) = 0
    }
    val bigrams = new java.util.HashSet[UTF8String]()
    val space = UTF8String.fromString(" ")
    i = 0
    while (i < m - 1) {
      if (!arr.isNullAt(i) && !arr.isNullAt(i + 1)) {
        bigrams.add(UTF8String.concat(arr.getUTF8String(i), space, arr.getUTF8String(i + 1)))
      }
      i += 1
    }
    val row = new GenericInternalRow(5)
    row.setInt(0, m)
    row.setInt(1, counts.size())
    row.setInt(2, top)
    row.setDouble(3, sumClnC)
    row.setInt(4, bigrams.size())
    row
  }
}
