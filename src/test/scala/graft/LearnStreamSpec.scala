package graft

import org.apache.spark.sql.functions._

import graft.operators.LlmOps
import graft.streaming.Streaming

/** Round-11 late additions, part 2: the iterative BPE learn loop (t30)
  * and the streaming near-dup gate (st14).
  */
class LearnStreamSpec extends SparkTestBase {

  test("t30 learns iteratively — merges the initial ranking can never contain") {
    import spark.implicits._
    val dir = tempDir("t30")
    // Hand-traced corpus: aab ×3, abb ×2.
    //  round 1: pairs aa:3, ab:5, bb:2            → merge (a, b, 5)
    //    aab → "a ab" (leftmost scan: (a,a) first, not the elected pair;
    //    then (a,b) fires), abb → "ab b" (merged ab is NOT re-matched as
    //    the left side of (b, b)).
    //  round 2: pairs (a,ab):3, (ab,b):2          → merge (a, ab, 3)
    //  round 3: pairs (ab,b):2                    → merge (ab, b, 2)
    //  round 4: no adjacent pairs left            → loop stops early.
    // (a, ab) and (ab, b) cannot appear in t28's initial-count ranking —
    // multi-char symbols only exist AFTER a merge — so this pins the
    // recount-per-round semantics, not a restated t28.
    Seq((1L, "aab aab aab abb abb"))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = LlmOps.t30BpeLearn(spark, dir)
      .as[(Long, String, String, Long)].collect().toSet
    assert(out === Set(
      (1L, "a", "b", 5L),
      (2L, "a", "ab", 3L),
      (3L, "ab", "b", 2L)))
  }

  test("t30's per-round plan depth is constant out to 32 rounds") {
    import spark.implicits._
    // 36 distinct symbols -> >= 35 merges available, far past the
    // shipped BpeLearnRounds = 4; the abab word seeds a distinct
    // top-count pair so round 1 is deterministic.
    val words = Seq(("abcdefghijklmnopqrstuvwxyz0123456789", 3L), ("abab", 2L))
      .toDF("tok", "freq")
    val out = LlmOps.bpeLearnFrom(spark, words, 32)
    assert(out.count() === 32)
    // The r11 formulation composed one more nested fold per round (plan
    // size grew linearly, per-row work O(r)); the materialized loop must
    // show the SAME pre-checkpoint plan size every round.
    val sizes = LlmOps.lastLearnPlanSizes
    assert(sizes.size === 32)
    assert(sizes.distinct.size === 1,
      s"per-round plan size must be constant, got: $sizes")
  }

  test("st14 alerts dedupe to exactly d5b's incremental ingest result") {
    import spark.implicits._
    val alerts = Streaming.st14StreamNeardup(spark, Sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(alerts.nonEmpty)
    // Per-band at-least-once: every pair alerts at least once, with the
    // SAME exact jaccard on every alert for a pair. No upper bound
    // (advisor finding): the operator's contract is at-least-once per
    // colliding band — the parquet-append sink is non-idempotent on a
    // replayed micro-batch, so a retried run may legitimately exceed
    // NumBands rows per pair; asserting a cap would encode exactly-once
    // semantics the sink does not provide.
    val byPair = alerts.groupBy(a => (a._1, a._2))
    assert(byPair.valuesIterator.forall(rows => rows.length >= 1))
    assert(byPair.valuesIterator.forall(rows => rows.map(_._4).distinct.length == 1))
    // Batch truth: one exact dedup of the alert stream equals the batch
    // ingest path (same index, same corpus) — the in-flight signal loses
    // nothing and invents nothing.
    val deduped = byPair.map { case ((n, e), rows) => (n, e, rows.head._4) }.toSet
    val batch = LlmOps.d5bIndexIngest(spark, Sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(deduped === batch)
  }
}
