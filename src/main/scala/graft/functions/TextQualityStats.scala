package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-quality counters (reference: the C4/Gopher-style
  * quality features in feature_engineering; see
  * `reference/src/training/data_prep.py` quality filtering).
  *
  * The declarative forms in [[graft.text.TextFunctions]] —
  * `size(filter(split(trim(text))))`, `regexp_replace` length deltas —
  * are higher-order-function/regex interpreters, NOT codegen'd, and a
  * query that selects stopword ratio, punct ratio, AND the composite
  * quality score tokenizes the text ~4x per row. This expression makes
  * one pass over the UTF-8 bytes and returns every counter the quality
  * formula needs as a struct:
  *
  *   {len, n_tokens, stop_hits, punct, upper}
  *
  *   - len       = numChars (codepoints), as `length(text)`
  *   - n_tokens  = size(split(trim(text), "\\s+")) — Java-regex split
  *                 semantics with Spark's default limit -1 (leading
  *                 empty token if the trimmed text starts with
  *                 non-space whitespace; trailing empty kept; "" -> 1)
  *   - stop_hits = tokens ∈ stopwords (byte-exact equality)
  *   - punct     = chars in [.,!?;:]  (as the regexp_replace delta)
  *   - upper     = chars in [A-Z]
  *
  * Byte-level scanning is codepoint-exact for ALL UTF-8 input here:
  * Java regex `\s` without UNICODE_CHARACTER_CLASS matches only ASCII
  * whitespace, the punct/upper classes are ASCII, and ASCII bytes
  * never occur inside multi-byte UTF-8 sequences.
  */
case class TextQualityStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = TextQualityStats.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_quality_stats requires string, got ${other.catalogString}")
  }

  @transient private lazy val stopArr: Array[UTF8String] =
    stopwords.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any =
    TextQualityUtil.stats(input.asInstanceOf[UTF8String], stopArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwords", stopArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextQualityUtil$$.MODULE$$.stats($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextQualityStats {
  val schema: StructType = StructType(Seq(
    StructField("len", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("upper", IntegerType, nullable = false)))

  def stats(c: Column, stopwords: Seq[String]): Column =
    GraftBridge.column(TextQualityStats(GraftBridge.expression(c), stopwords))
}

/** The per-row scan, shared by interpreted eval and generated code. */
object TextQualityUtil {

  // Java regex \s (no UNICODE_CHARACTER_CLASS): ASCII whitespace only.
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  @inline private def isPunct(b: Byte): Boolean =
    b == '.' || b == ',' || b == '!' || b == '?' || b == ';' || b == ':'

  private def matchesAny(s: UTF8String, from: Int, until: Int,
      words: Array[UTF8String]): Boolean = {
    val n = until - from
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.numBytes == n) {
        var i = 0
        var ok = true
        while (ok && i < n) {
          if (s.getByte(from + i) != word.getByte(i)) ok = false
          i += 1
        }
        if (ok) return true
      }
      w += 1
    }
    false
  }

  def stats(s: UTF8String, stopwords: Array[UTF8String]): InternalRow = {
    val nb = s.numBytes
    var punct = 0
    var upper = 0
    var i = 0
    while (i < nb) {
      val b = s.getByte(i)
      if (isPunct(b)) punct += 1
      else if (b >= 'A' && b <= 'Z') upper += 1
      i += 1
    }
    // trim() removes only ' ' (0x20), matching Spark/DuckDB trim
    var lo = 0
    while (lo < nb && s.getByte(lo) == ' ') lo += 1
    var hi = nb
    while (hi > lo && s.getByte(hi - 1) == ' ') hi -= 1
    // split(trimmed, "\s+") with limit -1: n_tokens = ws_runs + 1;
    // a token is each maximal non-ws span (empty spans can't match)
    var runs = 0
    var stopHits = 0
    var tokStart = lo
    var inWs = false
    i = lo
    while (i < hi) {
      if (isWs(s.getByte(i))) {
        if (!inWs) {
          runs += 1
          if (i > tokStart && matchesAny(s, tokStart, i, stopwords)) stopHits += 1
          inWs = true
        }
      } else if (inWs) {
        tokStart = i
        inWs = false
      }
      i += 1
    }
    if (!inWs && hi > tokStart && matchesAny(s, tokStart, hi, stopwords)) stopHits += 1
    val row = new GenericInternalRow(5)
    row.setInt(0, s.numChars())
    row.setInt(1, runs + 1)
    row.setInt(2, stopHits)
    row.setInt(3, punct)
    row.setInt(4, upper)
    row
  }
}
