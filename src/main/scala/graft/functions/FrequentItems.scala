package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch as a typed Aggregator (SURVEY.md
  * §2.10 surface): a bounded summary of at most `m` (item, count)
  * counters with the classic guarantee that every item whose true
  * frequency exceeds n/(m+1) is present in the final summary, while
  * each kept count under-reports by at most n/(m+1).
  *
  * Distribution: Spark runs this as a partial aggregate per partition
  * and then MERGES the partial summaries — the merge below is the
  * mergeable-summaries form (Agarwal et al., PODS'12): sum counters
  * key-wise, then subtract the (m+1)-th largest counter from all and
  * drop the non-positive ones. That trim keeps the summary at ≤ m
  * entries and the total undercount additive, so the superset guarantee
  * survives arbitrary partitioning — the property the exact-recount
  * pass in `LlmOps.t20HeavyHitters` relies on.
  *
  * Why a sketch at all: the naive heavy-hitters plan shuffles the FULL
  * key space (groupBy key → count → filter). At 100 TB the vocabulary
  * can be billions of keys; this summary is O(m) per partition, merges
  * to one O(m) row, and the follow-up exact count touches only
  * candidate keys. Determinism: counts depend on partitioning, but the
  * candidate SET is always a superset of the true frequent set, and the
  * recount pass makes the final answer partitioning-independent.
  */
class FrequentItemsAggregator(m: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < m => buf.updated(x, 1L)
      case None =>
        // Full and x absent: decrement every counter (x's own count
        // cancels against the shared decrement), dropping zeros. O(m),
        // but only taken when the incoming key is non-resident — with a
        // skewed stream most rows hit the increment branch above.
        buf.collect { case (k, c) if c > 1 => k -> (c - 1) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (summed.size <= m) summed
    else {
      // (m+1)-th largest counter value is the subtraction that restores
      // the size bound with the least added undercount.
      val cut = summed.valuesIterator.toArray.sortBy(-_).apply(m)
      summed.collect { case (k, c) if c > cut => k -> (c - cut) }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] = bufferEncoder
}
