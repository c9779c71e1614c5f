package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FrequentItemsAggregator

/** Sketch-property checks for the Misra-Gries aggregator: the superset
  * guarantee (every item with frequency > n/(m+1) survives) under both
  * sequential reduce and arbitrary partition/merge orders — the property
  * `t20_heavy_hitters`' exact-recount pass relies on.
  */
class FrequentItemsSpec extends AnyFunSuite {

  private def freq(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  /** Adversarial stream: 3 genuinely frequent items interleaved with a
    * long tail of near-singletons that keeps the buffer churning.
    */
  private val stream: Seq[String] = {
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++ Seq.fill(250)("gamma")
    val tail = (0 until 900).map(i => s"tail${i % 450}") // 450 keys × 2
    // Deterministic interleave (no RNG): round-robin by index hash.
    (heavy ++ tail).sortBy(s => (s.hashCode & 0x7fffffff) % 1000 -> s)
  }

  private val m = 20

  test("sequential reduce keeps every item above n/(m+1)") {
    val agg = new FrequentItemsAggregator(m)
    val summary = stream.foldLeft(agg.zero)(agg.reduce)
    assert(summary.size <= m)
    val n = stream.size
    val mustKeep = freq(stream).collect { case (k, c) if c * (m + 1) > n => k }
    mustKeep.foreach(k => assert(summary.contains(k), s"lost frequent item $k"))
    // Counts under-report by at most n/(m+1).
    summary.foreach { case (k, est) =>
      val exact = freq(stream).getOrElse(k, 0L)
      assert(est <= exact, s"$k overcounted: $est > $exact")
      assert(exact - est <= n / (m + 1) + 1, s"$k undercounted past the bound")
    }
  }

  test("partitioned reduce + pairwise merge preserves the superset guarantee") {
    val agg = new FrequentItemsAggregator(m)
    // Three deliberately unbalanced partitions, merged in two orders.
    val parts = Seq(stream.take(97), stream.slice(97, 1200), stream.drop(1200))
      .map(_.foldLeft(agg.zero)(agg.reduce))
    val mergedLtr = parts.reduceLeft(agg.merge)
    val mergedRtl = parts.reduceRight(agg.merge)
    val n = stream.size
    val mustKeep = freq(stream).collect { case (k, c) if c * (m + 1) > n => k }
    for (merged <- Seq(mergedLtr, mergedRtl)) {
      assert(merged.size <= m)
      mustKeep.foreach(k => assert(merged.contains(k), s"merge lost $k"))
    }
  }

  test("capacity above the vocabulary degenerates to exact counting") {
    val agg = new FrequentItemsAggregator(1000)
    val summary = stream.foldLeft(agg.zero)(agg.reduce)
    assert(summary === freq(stream))
  }
}
