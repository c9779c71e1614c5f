package graft

import graft.operators.LlmOps

/** The d9 clique guard, exercised with a planted boilerplate clique: the
  * EXACT prefix join must, by contract, emit Θ(k²) pairs for a k-way
  * near-dup clique — so a degenerate (>D9DegreeCap-doc) clique source
  * turns d9 quadratic in both verify work and output. d9b refuses to
  * explode such cliques (pairs touching an over-cap doc are dropped
  * BEFORE the intersection join), d9_degree_stats counts what was
  * refused, and organic near-dup pairs — whose candidate degree is tiny —
  * survive untouched.
  */
class D9SkewSpec extends SparkTestBase {

  private val CliqueSize = LlmOps.D9DegreeCap + 20 // degree cap+19 > cap

  private def writeCorpus(): String = {
    import spark.implicits._
    val dir = tempDir("d9_skew")
    // A template dump: CliqueSize docs with IDENTICAL 20-token text
    // (shingle sets equal, pairwise Jaccard = 1, every pair qualifies at
    // t = 0.8) — each clique doc's candidate degree is CliqueSize-1 >
    // D9DegreeCap. Plus one organic near-dup pair (14 tokens each, one
    // trailing-token swap: 11 of each doc's 12 3-shingles shared,
    // J = 11/13 ≈ 0.846 ≥ 4/5 — qualifies) and singleton fillers whose
    // shingles are unique.
    val template = (1 to 20).map(i => s"tmpl$i").mkString(" ")
    val clique = (0 until CliqueSize).map(i => (1000L + i, template))
    val organic = Seq(
      (1L, "quick brown fox jumps over the lazy dog near the old mill stream bank"),
      (2L, "quick brown fox jumps over the lazy dog near the old mill stream edge"))
    val filler = (0 until 5).map { i =>
      (500L + i, (1 to 12).map(j => s"f${i}w$j").mkString(" "))
    }
    (clique ++ organic ++ filler)
      .map { case (id, text) => (id, text, "en", "src0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact d9 explodes a planted clique; d9b drops it and keeps organic pairs") {
    import spark.implicits._
    val dir = writeCorpus()
    val cliqueIds = (0 until CliqueSize).map(1000L + _).toSet

    // The organic pair must genuinely qualify (guards against a silently
    // sub-threshold fixture making the "survives" assertion vacuous).
    val exact = LlmOps.d9PrefixJoin(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.contains((1L, 2L)), s"fixture's organic pair must qualify; got $exact")
    val exactCliquePairs = exact.count { case (a, b) => cliqueIds(a) && cliqueIds(b) }
    assert(exactCliquePairs === CliqueSize * (CliqueSize - 1) / 2,
      "the exact join must emit the full quadratic clique (its stated output bound)")

    val guarded = LlmOps.d9bPrefixGuarded(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(guarded === Set((1L, 2L)),
      s"guard must drop all clique pairs and keep the organic pair; got $guarded")

    // No silent cap: the stats view flags exactly the clique docs.
    val stats = LlmOps.d9DegreeStats(spark, dir)
      .as[(Long, Long, Boolean)].collect()
    val dropped = stats.collect { case (id, _, true) => id }.toSet
    assert(dropped === cliqueIds, s"dropped set must equal the clique; got $dropped")
    val organicDeg = stats.collect { case (id, d, _) if id <= 2 => id -> d }.toMap
    assert(organicDeg === Map(1L -> 1L, 2L -> 1L))
  }
}
