package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV ("k minimum values") distinct-count sketch as a native
  * TypedImperativeAggregate — the mergeable-sketch aggregation API
  * (same family as Spark's own HLL++ / percentile sketches).
  *
  * Buffer = the k smallest 64-bit hashes seen. Estimate: with the
  * k-th smallest hash at normalized position θ in [0,1),
  * distinct ≈ (k-1)/θ. Buffers merge by set-union + trim, so the
  * aggregate is map-side combinable and shuffles O(k) longs per
  * group — the sketch shape that works at 100 TB.
  *
  * Spark ships HLL for this purpose ([[org.apache.spark.sql.functions
  * .approx_count_distinct]]); KMV is here as the worked example of the
  * TypedImperativeAggregate contract (exact when distinct ≤ k, simple
  * mergeability proof) and is used by specs to cross-check the API.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  require(k >= 16, "k must be >= 16 for a usable estimate")

  private lazy val hasher = XxHash64(Seq(child), 42L)

  override def createAggregationBuffer(): java.util.TreeSet[Long] = new java.util.TreeSet[Long]()

  override def update(buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    if (child.eval(input) != null) {
      val h = hasher.eval(input).asInstanceOf[Long]
      buf.add(h)
      if (buf.size() > k) buf.remove(buf.last())
    }
    buf
  }

  override def merge(a: java.util.TreeSet[Long], b: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    a.addAll(b)
    while (a.size() > k) a.remove(a.last())
    a
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    if (buf.size() < k) buf.size().toLong
    else {
      // normalize signed long to [0, 1)
      val theta = (buf.last().toDouble / 1.8446744073709552e19) + 0.5
      if (theta <= 0.0) Long.MaxValue else math.round((k - 1) / theta)
    }
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvDistinct {
  /** Column entry point: approximate distinct count via a KMV sketch. */
  def kmvDistinct(c: Column, k: Int = 256): Column =
    GraftBridge.column(KmvDistinct(GraftBridge.expression(c), k).toAggregateExpression())
}
