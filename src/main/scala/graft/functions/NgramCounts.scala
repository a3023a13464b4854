package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct-n-gram COUNTS as native codegen'd expressions.
  *
  * The declarative forms — `size(array_distinct(transform(sequence(…`
  * — walk per-row higher-order-function interpreters and materialize
  * the full n-gram array just to take its length; the honest bench
  * (noop-write materialization) measured them as the hottest text
  * queries at sf0.1. These expressions compute the same counts in one
  * pass with a per-row hash set and nothing materialized.
  *
  * Count semantics are identical to the declarative forms (and their
  * DuckDB oracles), byte-for-codepoint on ASCII corpora — same
  * contract as [[SimHash60]]/[[PolyHash]].
  */

/** Number of DISTINCT character n-grams of a string — the count
  * `size(shingleSet(text, n))` without building the set column.
  * Strings shorter than n have 0 (matching `charNgrams`' guard).
  */
case class CountDistinctCharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_distinct_char_ngrams requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val len = s.numChars()
    if (len < n) 0
    else {
      val seen = new java.util.HashSet[UTF8String]()
      var i = 0
      while (i <= len - n) {
        seen.add(s.substringSQL(i + 1, n))
        i += 1
      }
      seen.size()
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len"); val seen = ctx.freshName("seen")
      val i = ctx.freshName("i")
      s"""
         |final int $len = $a.numChars();
         |if ($len < $n) { ${ev.value} = 0; } else {
         |  final java.util.HashSet<org.apache.spark.unsafe.types.UTF8String> $seen =
         |    new java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>();
         |  for (int $i = 0; $i <= $len - $n; $i++) {
         |    $seen.add($a.substringSQL($i + 1, $n));
         |  }
         |  ${ev.value} = $seen.size();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Number of DISTINCT adjacent word pairs in a token array — the count
  * `size(array_distinct(wordNgrams(text, 2)))` without building the
  * bigram strings. Two tokens are one bigram; arrays with fewer than 2
  * elements count 0.
  */
case class CountDistinctWordBigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_distinct_word_bigrams requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < 2) 0
    else {
      val seen = new java.util.HashSet[UTF8String]()
      val space = UTF8String.fromString(" ")
      var i = 0
      while (i < m - 1) {
        // bigrams touching a null token are skipped (no NPE for SQL input)
        if (!arr.isNullAt(i) && !arr.isNullAt(i + 1)) {
          seen.add(UTF8String.concat(arr.getUTF8String(i), space, arr.getUTF8String(i + 1)))
        }
        i += 1
      }
      seen.size()
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m"); val seen = ctx.freshName("seen")
      val i = ctx.freshName("i"); val sp = ctx.freshName("sp")
      s"""
         |final int $m = $a.numElements();
         |if ($m < 2) { ${ev.value} = 0; } else {
         |  final java.util.HashSet<org.apache.spark.unsafe.types.UTF8String> $seen =
         |    new java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>();
         |  final org.apache.spark.unsafe.types.UTF8String $sp =
         |    org.apache.spark.unsafe.types.UTF8String.fromString(" ");
         |  for (int $i = 0; $i < $m - 1; $i++) {
         |    if ($a.isNullAt($i) || $a.isNullAt($i + 1)) { continue; }
         |    $seen.add(org.apache.spark.unsafe.types.UTF8String.concat(
         |      $a.getUTF8String($i), $sp, $a.getUTF8String($i + 1)));
         |  }
         |  ${ev.value} = $seen.size();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramCounts {
  def countDistinctCharNgrams(c: Column, n: Int): Column =
    GraftBridge.column(CountDistinctCharNgrams(GraftBridge.expression(c), n))

  def countDistinctWordBigrams(tokens: Column): Column =
    GraftBridge.column(CountDistinctWordBigrams(GraftBridge.expression(tokens)))
}
