package graft

import graft.operators.LlmOps

/** The dedup family pins shared scans with persist() and (d7) local
  * checkpoints; the harness contract is PersistScope.releaseAll() after
  * each query's action. This spec proves the contract actually returns
  * executor storage to its pre-query state — the round-5 finding was
  * that nothing released these and a long session accumulated dead
  * blocks until LRU eviction.
  */
class PersistScopeSpec extends SparkTestBase {

  test("releaseAll returns persistent-RDD storage to its pre-query state") {
    val sc = spark.sparkContext
    // Other suites share this JVM/session; assert against a snapshot,
    // not against empty.
    PersistScope.releaseAll()
    spark.catalog.clearCache()
    val before = sc.getPersistentRDDs.keySet

    // The heaviest pinners: d2 (shingles+bands+sets), d4 (raw+filtered
    // rows), d7 (edges + iterative labels with localCheckpoint blocks —
    // storage CacheManager cannot see, so clearCache alone would NOT
    // recover it).
    LlmOps.d2DedupMinhash(spark, Sf).count()
    LlmOps.d4NgramJaccard(spark, Sf).count()
    LlmOps.d7DedupResolve(spark, Sf).count()
    assert(sc.getPersistentRDDs.keySet.diff(before).nonEmpty,
      "expected the dedup family to pin storage while running")

    PersistScope.releaseAll()
    val leaked = sc.getPersistentRDDs.keySet.diff(before)
    assert(leaked.isEmpty, s"leaked persistent RDDs after releaseAll: $leaked")
  }
}
