package graft.sim

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed per-key top-k via a typed Aggregator with a bounded
  * buffer — the scalable replacement for
  * `row_number().over(partitionBy(key).orderBy(score))` + filter:
  * a WindowExec must SORT every key's entire group, while an
  * Aggregator gets map-side partial aggregation for free, so each
  * task ships at most k candidates per key into the shuffle and no
  * full sort ever happens. Classic combiner-style top-k.
  *
  * Ordering: score DESC, id ASC on ties — matching Similarity.topK's
  * deterministic rank order.
  */
object TopKAggregator {

  type Pair = (Double, Long) // (score, id)

  private def better(a: Pair, b: Pair): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(k: Int)(buf: List[Pair], x: Pair): List[Pair] =
    if (buf.length >= k && better(buf.last, x)) buf
    else {
      val (front, back) = buf.span(p => better(p, x))
      (front ::: x :: back).take(k)
    }

  /** Aggregator over (key, score, id) tuples; buffer = best-first list
    * of at most k pairs (merge = fold-insert, associative+commutative).
    */
  final class TopKAgg(k: Int) extends Aggregator[(Long, Double, Long), List[Pair], Seq[Pair]] {
    override def zero: List[Pair] = Nil
    override def reduce(buf: List[Pair], x: (Long, Double, Long)): List[Pair] =
      insert(k)(buf, (x._2, x._3))
    override def merge(a: List[Pair], b: List[Pair]): List[Pair] = b.foldLeft(a)(insert(k))
    override def finish(buf: List[Pair]): Seq[Pair] = buf
    override def bufferEncoder: Encoder[List[Pair]] = Encoders.kryo[List[Pair]]
    override def outputEncoder: Encoder[Seq[Pair]] = Encoders.kryo[Seq[Pair]]
  }

  /** Per-key top-k of (scoreCol, idCol): (key, id, score, rank) rows —
    * equality-tested against the window implementation in specs.
    *
    * PRECONDITION: `keyCol` and `idCol` must be integral (they are cast
    * to long) — string ids need a surrogate long key first. The window
    * form this replaces accepted any id type; this constraint buys the
    * map-side-combinable typed aggregation.
    */
  def topKPerKey(df: DataFrame, keyCol: String, idCol: String, scoreCol: String, k: Int): DataFrame = {
    import df.sparkSession.implicits._
    val ds = df.select(col(keyCol).cast("long"), col(scoreCol).cast("double"), col(idCol).cast("long"))
      .as[(Long, Double, Long)]
    new TopKAgg(k) // instantiate once; toColumn binds encoders
      .pipe { agg =>
        ds.groupByKey(_._1)
          .agg(agg.toColumn.name("topk"))
          .flatMap { case (key, items) =>
            items.zipWithIndex.map { case ((score, id), i) => (key, id, score, i + 1) }
          }
          .toDF(keyCol, idCol, scoreCol, "rank")
      }
  }

  private implicit class Piper[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }
}
