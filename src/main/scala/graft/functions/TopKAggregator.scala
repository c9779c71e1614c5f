package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator (SURVEY.md §2.10): exact bounded top-k of (score,
  * id) pairs — the buffer never exceeds k entries, so a global top-k
  * costs O(n) scan + O(partitions · k) merge instead of a full sort.
  * Catalyst's TakeOrderedAndProject already covers the common case
  * (PlanSpec); this Aggregator is the typed escape hatch for top-k
  * UNDER aggregation (e.g. top-k per group inside a single agg pass,
  * or top-k of a derived score no sort key exists for).
  *
  * Determinism: ordering is (score desc, id asc) — a total order.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sorted(ord).take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    // The buffer is sorted after every trim, so the common reject case
    // (x ranks below the current k-th) is one comparison instead of an
    // O(k log k) append-and-sort per input row (reviewer finding).
    if (buf.size < k || ord.lt(x, buf.last)) trim(buf :+ x) else buf

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(buf)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}
