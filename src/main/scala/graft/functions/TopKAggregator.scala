package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k largest (score, id) pairs per
  * group — the custom-`Aggregator` form of "top N per key".
  *
  * A window row_number computes the same thing but must SORT each
  * group; this buffer keeps only k elements, so the shuffle carries at
  * most k pairs per group from each map task (partial aggregation) —
  * the difference between O(n log n) per group and O(n log k) with k-
  * sized state at 100 TB. Deterministic order: score desc, id asc.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)],
      in: (Double, Long)): Seq[(Double, Long)] =
    (buf :+ in).sorted(ord).take(k)

  override def merge(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}

/** Typed bottom-k aggregator over exact Long keys: keeps the k pairs
  * with the SMALLEST (key, id) per group. Same k-bounded-buffer scale
  * argument as [[TopKAggregator]] (≤ k pairs per group cross the
  * shuffle from each map task), but ordered on a Long key instead of a
  * Double score — a 60-bit salted-md5 rank does not fit a Double's
  * 53-bit mantissa, and any precision loss there would silently
  * diverge from a SQL oracle's exact integer ORDER BY. */
class MinKLongAggregator(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  private def ord: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long)],
      in: (Long, Long)): Seq[(Long, Long)] =
    (buf :+ in).sorted(ord).take(k)

  override def merge(a: Seq[(Long, Long)],
      b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] = bufferEncoder
}
