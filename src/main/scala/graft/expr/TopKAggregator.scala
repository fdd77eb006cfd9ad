package graft.expr

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable grouped top-k accumulator — the typed-`Aggregator` UDAF
  * extension path (SURVEY §2's preference order: compose built-ins,
  * then a typed aggregator, then a full physical operator). Keeps the
  * k SMALLEST (value, key) pairs per group, lexicographic tie-break on
  * the unique key so the result is a deterministic total-order prefix.
  *
  * Why an aggregator and not a window: `row_number() OVER (PARTITION
  * BY g ORDER BY v) ≤ k` must shuffle and SORT every row of every
  * group; this accumulator is an algebraic (commutative-monoid) fold —
  * partial aggregation caps the state at k pairs per group per
  * partition BEFORE the exchange, so the shuffle carries
  * O(k·groups·partitions) rows instead of the whole table, and nothing
  * ever sorts more than 2k tuples at once. At 100 TB with bounded
  * group cardinality that is the difference between a full-table sort
  * and a near-free map-side combine. The buffer is kept sorted
  * ascending as the invariant, so reduce is an O(k) insert and merge
  * an O(k) sorted take.
  */
final class TopKMinAggregator(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0)

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(b: Seq[(Long, Long)],
                      a: (Long, Long)): Seq[(Long, Long)] =
    if (b.length >= k && Ordering[(Long, Long)].lteq(b.last, a)) b
    else ((b :+ a).sorted: Seq[(Long, Long)]).take(k)

  override def merge(b1: Seq[(Long, Long)],
                     b2: Seq[(Long, Long)]): Seq[(Long, Long)] =
    ((b1 ++ b2).sorted: Seq[(Long, Long)]).take(k)

  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
