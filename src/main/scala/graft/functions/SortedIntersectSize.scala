package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Intersection size of two SORTED string arrays via a two-pointer
  * merge — O(|a|+|b|) with zero allocation, versus `size(
  * array_intersect(a, b))` which builds a hash set and materializes
  * the intersection array per row.
  *
  * This is the hot inner loop of Jaccard verification in the dedup
  * pipelines (SURVEY.md §2.5): candidate pairs × set intersection is
  * where near-dup CPU goes at 100 TB, which justifies a native
  * Catalyst expression with codegen (preference order (b) — a custom
  * Expression — since built-ins can't express "inputs are sorted").
  *
  * PRECONDITION: both arrays sorted ascending with no nulls (use
  * `array_sort`/`sort_array`). Unsorted input gives an undercount, not
  * an error — callers own the invariant. Duplicate elements are fine:
  * equal runs are skipped after each match, so the result is the SET
  * intersection size — identical to `size(array_intersect(a, b))` —
  * even on non-distinct input (the expression is exposed to arbitrary
  * SQL via the `sorted_intersect_size` registration).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_size requires two array<string> inputs, " +
            s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var cnt = 0
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
      val xi = x.getUTF8String(i)
      val c = xi.compareTo(y.getUTF8String(j))
      if (c == 0) {
        cnt += 1
        // skip equal runs on both sides: set semantics on dup input
        i += 1; while (i < nx && x.getUTF8String(i).equals(xi)) i += 1
        j += 1; while (j < ny && y.getUTF8String(j).equals(xi)) j += 1
      }
      else if (c < 0) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt"); val c = ctx.freshName("c")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      s"""
         |int $i = 0, $j = 0, $cnt = 0;
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |while ($i < $nx && $j < $ny) {
         |  final org.apache.spark.unsafe.types.UTF8String $xi = $a.getUTF8String($i);
         |  final int $c = $xi.compareTo($b.getUTF8String($j));
         |  if ($c == 0) {
         |    $cnt++;
         |    $i++; while ($i < $nx && $a.getUTF8String($i).equals($xi)) { $i++; }
         |    $j++; while ($j < $ny && $b.getUTF8String($j).equals($xi)) { $j++; }
         |  }
         |  else if ($c < 0) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Column-level entry point. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectSize(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
