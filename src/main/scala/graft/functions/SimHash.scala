package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 60-bit SimHash over a token array as a native codegen'd Catalyst
  * expression — the document-fingerprint hot loop of near-dup detection
  * (SURVEY.md §2.5; reference dedup surface re-expressed Spark-first).
  *
  * Per token t, a 60-bit hash h(t) = p31(t) | (p37(t) << 30), where
  * pK(t) = fold(acc·K + codepoint) mod 1e9+7 over t's characters (both
  * halves < 2^30, so OR == addition). Bit b of the output is set iff
  * Σ_tokens (±1 by bit b of h(t)) ≥ 0 — standard SimHash with
  * engine-independent integer arithmetic, exactly reproducible in ANSI
  * SQL (the q_simhash DuckDB oracle computes the identical number).
  *
  * Why an Expression and not the `transform`/`aggregate` lambda
  * pipeline it replaces: the lambda form walks the token array 61
  * times (once per bit plus the pack) through HigherOrderFunction
  * interpreters; this walks it once with a local long[60] histogram in
  * generated Java inside whole-stage codegen — the difference between
  * "subset only" and "full corpus" at 100 TB.
  *
  * Characters iterate as bytes on ASCII tokens (byte == codepoint ==
  * the oracle's `ascii()`); tokens with multi-byte characters fall
  * back to the per-codepoint [[HashUtil]] path, so the value is
  * codepoint-exact for all input. Null tokens contribute nothing.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires array<string>, got ${other.catalogString}")
  }

  private val P = 1000000007L

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Long](60)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) { // null tokens contribute nothing
        val s = arr.getUTF8String(t)
        val bytes = s.getBytes
        var h1 = 0L; var h2 = 0L
        var i = 0
        var ascii = true
        while (ascii && i < bytes.length) {
          if (bytes(i) < 0) ascii = false
          else {
            h1 = (h1 * 31 + bytes(i)) % P
            h2 = (h2 * 37 + bytes(i)) % P
            i += 1
          }
        }
        if (!ascii) { // codepoint-exact fallback for multi-byte input
          val hs = HashUtil.polyPair(s); h1 = hs(0); h2 = hs(1)
        }
        val h = h1 | (h2 << 30)
        var b = 0
        while (b < 60) {
          counts(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val counts = ctx.freshName("counts"); val n = ctx.freshName("n")
      val t = ctx.freshName("t"); val bytes = ctx.freshName("bytes")
      val h1 = ctx.freshName("h1"); val h2 = ctx.freshName("h2")
      val h = ctx.freshName("h"); val i = ctx.freshName("i")
      val b = ctx.freshName("b"); val s = ctx.freshName("s")
      val ascii = ctx.freshName("ascii"); val hs = ctx.freshName("hs")
      val out = ctx.freshName("out")
      s"""
         |long[] $counts = new long[60];
         |final int $n = $a.numElements();
         |for (int $t = 0; $t < $n; $t++) {
         |  if ($a.isNullAt($t)) { continue; }
         |  final org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($t);
         |  final byte[] $bytes = $s.getBytes();
         |  long $h1 = 0L, $h2 = 0L;
         |  boolean $ascii = true;
         |  for (int $i = 0; $ascii && $i < $bytes.length; ) {
         |    if ($bytes[$i] < 0) { $ascii = false; }
         |    else {
         |      $h1 = ($h1 * 31L + $bytes[$i]) % ${P}L;
         |      $h2 = ($h2 * 37L + $bytes[$i]) % ${P}L;
         |      $i++;
         |    }
         |  }
         |  if (!$ascii) {
         |    final long[] $hs = graft.functions.HashUtil$$.MODULE$$.polyPair($s);
         |    $h1 = $hs[0]; $h2 = $hs[1];
         |  }
         |  final long $h = $h1 | ($h2 << 30);
         |  for (int $b = 0; $b < 60; $b++) {
         |    $counts[$b] += ((($h >> $b) & 1L) == 1L) ? 1L : -1L;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 60; $b++) {
         |  if ($counts[$b] >= 0L) { $out |= (1L << $b); }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  /** Column-level entry point over a token-array column. */
  def simhash60(tokens: Column): Column =
    GraftBridge.column(SimHash60(GraftBridge.expression(tokens)))
}
