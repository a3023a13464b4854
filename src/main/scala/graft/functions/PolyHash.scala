package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial hash of a string: fold(acc·31 + byte) mod 1e9+7
  * — the document-fingerprint primitive (SURVEY.md §2.7), as a native
  * codegen'd expression.
  *
  * Replaces the `aggregate(transform(sequence(1, length(c)), …))`
  * lambda pipeline, which materializes an O(len) array of substrings
  * per row and walks it through HigherOrderFunction interpreters; this
  * is one tight byte loop in generated Java. Byte-wise folding equals
  * the DuckDB oracle's per-codepoint `ascii()` fold for ASCII corpora
  * (same contract as [[SimHash60]]).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires string, got ${other.catalogString}")
  }

  private val P = 1000000007L

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xffL)) % P
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h"); val i = ctx.freshName("i")
      s"""
         |final byte[] $bytes = $a.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xffL)) % ${P}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  /** Column-level entry point. */
  def polyHash(c: Column): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(c)))
}
