package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a mergeable aggregate.
  *
  * The window spelling of per-group top-k (`row_number() OVER
  * (PARTITION BY g ORDER BY score DESC) <= k`) sorts EVERY row of
  * every group through a shuffle before discarding all but k. As an
  * `Aggregator`, the partial state is a k-bounded sorted list, so the
  * map side reduces each partition to at most k entries per group
  * before the exchange — the shuffle carries O(groups × k), not
  * O(rows), which is the difference that matters when one group holds
  * a billion rows. (Same partial/final split Spark's own
  * `collect_top_k` uses internally for TakeOrdered; this exposes it
  * per-group as a typed Aggregator via `functions.udaf`.)
  *
  * Ordering: score descending, id ascending on ties — fully
  * deterministic output for any partitioning.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length == k && ord.lteq(buf.last, in)) buf
    else ((buf :+ in).sorted(ord)).take(k)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    bufferEncoder
}
