package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator for exact per-group top-k — the custom-aggregation
  * extension point (Aggregator → TypedColumn) demonstrated on the shape
  * a window + filter would otherwise compute with a full per-group sort.
  *
  * State is a sorted buffer of AT MOST k (value, id) pairs, so the
  * map-side partial aggregate carries O(k) per group instead of the
  * window's O(group) sort state, and merge is a bounded list merge —
  * the aggregation pushes work into the combiner exactly like a
  * hand-written MR top-k. Order is total (value desc, id asc) so the
  * result is deterministic under any partitioning.
  */
case class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] = {
    val (ahead, rest) = buf.span(better(_, x))
    (ahead ::: x :: rest).take(k)
  }

  override def zero: List[(Double, Long)] = Nil
  override def reduce(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    insert(buf, x)
  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf
  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
