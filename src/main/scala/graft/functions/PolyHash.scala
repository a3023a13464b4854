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
  * is one tight byte loop in generated Java on ASCII input (where
  * byte == codepoint), with a per-codepoint fallback ([[HashUtil]])
  * for strings containing multi-byte characters — so values are
  * codepoint-exact for ALL input, same as the lambda form and the
  * DuckDB oracle's `ascii()` fold.
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
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if (bytes(i) < 0) ascii = false
      else { h = (h * 31 + bytes(i)) % P; i += 1 }
    }
    if (ascii) h else HashUtil.poly31(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h"); val i = ctx.freshName("i")
      val ascii = ctx.freshName("ascii")
      s"""
         |final byte[] $bytes = $a.getBytes();
         |long $h = 0L;
         |boolean $ascii = true;
         |for (int $i = 0; $ascii && $i < $bytes.length; ) {
         |  if ($bytes[$i] < 0) { $ascii = false; }
         |  else { $h = ($h * 31L + $bytes[$i]) % ${P}L; $i++; }
         |}
         |${ev.value} = $ascii ? $h : graft.functions.HashUtil$$.MODULE$$.poly31($a);
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
