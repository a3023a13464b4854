package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a native
  * TypedImperativeAggregate (same mergeable-sketch API as
  * [[KmvDistinct]]; MG is the mergeable-summaries worked example of
  * Agarwal et al., PODS 2012).
  *
  * The buffer holds at most `m` (key → count) counters. Updating a
  * full buffer decrements every counter by the buffer's minimum count
  * (batched MG step) and drops zeros; merging sums counters and, when
  * over capacity, subtracts the (m+1)-th largest count from all.
  * Either way the summary keeps the defining MG invariant: every
  * counter UNDERCOUNTS its key by at most n/m total decremented
  * mass, so any key with true frequency > n/m is guaranteed
  * present — top-k over an unbounded keyspace with O(m) state per
  * group, O(m) bytes shuffled per partial. This is the scale path for
  * vocabulary heads where the exact (token, count) shuffle
  * (q_vocab_topk) would shuffle the whole vocabulary: a trillion-token
  * noisy corpus has billions of junk singleton tokens that MG never
  * materializes.
  *
  * eval returns the summary as array<struct<key, count>> sorted by
  * (count desc, key asc) — counts are MG lower bounds (exact when the
  * buffer never overflowed). Spec'd in ExpressionPropertySpec: heavy
  * keys above the guarantee threshold always surface, counts sit
  * within the n/m band, and partial-aggregation merges preserve
  * both (the default 32-partition run exercises merge on every query).
  */
case class MisraGriesTopK(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(m >= 8, "m must be >= 8 for a usable summary")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1L)
        case None if buf.size < m => buf.update(key, 1L)
        case None =>
          // batched MG decrement: subtract the min count from all
          val delta = buf.valuesIterator.min
          decrementAll(buf, delta)
          if (buf.size < m) buf.update(key, 1L)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > m) {
      // subtract the (m+1)-th largest count (Agarwal et al. MG merge)
      val counts = a.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse)
      decrementAll(a, counts(m))
    }
    a
  }

  private def decrementAll(buf: mutable.HashMap[String, Long], delta: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    buf.foreach { case (k, c) =>
      if (c - delta <= 0L) dead += k else buf.update(k, c - delta)
    }
    dead.foreach(buf.remove)
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray.map { case (k, c) => (k.getBytes(StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(entries.length)
    entries.foreach { case (kb, c) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kl = bb.getInt
      val kb = new Array[Byte](kl)
      bb.get(kb)
      buf.update(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGriesTopK {
  /** Column entry point: heavy-hitters summary (array of (key, count)
    * lower bounds, count desc). Any key with frequency > n/m is
    * guaranteed present.
    */
  def heavyHitters(c: Column, m: Int = 256): Column =
    GraftBridge.column(MisraGriesTopK(GraftBridge.expression(c), m).toAggregateExpression())
}
