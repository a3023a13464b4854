package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a native codegen'd Catalyst expression — the
  * per-document hot loop of MinHash-LSH near-dup candidate generation
  * (SURVEY.md §2.5; reference dedup surface re-expressed Spark-first).
  *
  * Input: the document's shingle hashes (array<long>, values already
  * reduced mod P = 1e9+7 by [[graft.dedup.Dedup.shingleHashes]]).
  * Output: array<long> of numPerm signature values, element i =
  * min over shingle hashes h of (a_i·h + b_i) mod P — identical
  * arithmetic to the `transform(perms, p -> array_min(transform(hs,
  * …)))` lambda pipeline it replaces (a_i, h < P ≈ 2^30, so a_i·h + b_i
  * stays far under Long overflow).
  *
  * Why an Expression and not the lambda pipeline: higher-order
  * functions run interpreted, and the inner transform materializes a
  * boxed array of |shingles| longs PER PERMUTATION per row — numPerm
  * allocations and numPerm × |shingles| megamorphic calls where this
  * runs one allocation-free double loop in generated Java inside
  * whole-stage codegen.
  *
  * Null shingle hashes are skipped (array_min semantics); a document
  * with no valid hashes yields a NULL signature, which the banded
  * explode then drops — the lambda form produced an all-null array
  * whose bands can never equi-join, so candidate output is identical.
  */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression {

  require(as.nonEmpty && as.length == bs.length,
    s"coefficient arrays must be non-empty and equal length: ${as.length} vs ${bs.length}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true // empty/all-null input → null signature

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<long>, got ${other.catalogString}")
  }

  private val P = 1000000007L
  private val aArr: Array[Long] = as.toArray
  private val bArr: Array[Long] = bs.toArray

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val k = aArr.length
    val sig = Array.fill(k)(Long.MaxValue)
    var seen = false
    var t = 0
    while (t < n) {
      if (!hs.isNullAt(t)) {
        seen = true
        val h = hs.getLong(t)
        var i = 0
        while (i < k) {
          val v = (aArr(i) * h + bArr(i)) % P
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      t += 1
    }
    if (!seen) null else new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
      val sig = ctx.freshName("sig"); val n = ctx.freshName("n")
      val t = ctx.freshName("t"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val v = ctx.freshName("v")
      val seen = ctx.freshName("seen")
      val k = aArr.length
      s"""
         |final int $n = $hs.numElements();
         |final long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |boolean $seen = false;
         |for (int $t = 0; $t < $n; $t++) {
         |  if ($hs.isNullAt($t)) { continue; }
         |  $seen = true;
         |  final long $h = $hs.getLong($t);
         |  for (int $i = 0; $i < $k; $i++) {
         |    final long $v = ($aRef[$i] * $h + $bRef[$i]) % ${P}L;
         |    if ($v < $sig[$i]) { $sig[$i] = $v; }
         |  }
         |}
         |if (!$seen) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** Column-level entry point over a (mod-P) shingle-hash array column. */
  def minhashSig(hashes: Column, coeffs: Seq[(Long, Long)]): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(hashes),
      coeffs.map(_._1), coeffs.map(_._2)))
}
