package graft

import graft.operators.LlmOps

/** d4's boilerplate/skew ceiling, exercised: a shingle shared by a whole
  * block (license header, templated footer) previously made the shingle
  * self-join quadratic in that block AND emitted a jaccard>0 pair for
  * every doc pair touching it. With the df ceiling (df > n_docs /
  * D4DfDropDiv ⇒ dropped before sizes and intersections), boilerplate-
  * only pairs vanish while genuinely near-identical documents — which
  * share many LOW-df shingles — still surface.
  */
class D4SkewSpec extends SparkTestBase {

  test("corpus-wide boilerplate shingles are dropped; organic near-dups survive") {
    import spark.implicits._
    val dir = tempDir("d4_skew")
    // 40 docs sharing a 5-token boilerplate prefix (3 boilerplate-only
    // 3-gram shingles, df = 40 > 50/5) followed by per-doc-unique words,
    // plus one organic near-dup pair (docs 100/101: same 12 words, one
    // swapped) and 8 singleton fillers to keep the true pair's shingles
    // rare. Every doc in one source; texts sized into one len bucket.
    val boiler = (0 until 40).map { i =>
      (100L + 110 + i, s"legal header boiler plate text u${i}a u${i}b u${i}c u${i}d u${i}e")
    }
    val organic = Seq(
      (100L, "quick brown fox jumps over the lazy dog near the old mill"),
      (101L, "quick brown fox jumps over the lazy cat near the old mill"))
    val filler = (0 until 8).map { i =>
      (300L + i, s"f${i}w1 f${i}w2 f${i}w3 f${i}w4 f${i}w5 f${i}w6 f${i}w7 f${i}w8 f${i}w9 f${i}wa f${i}wb f${i}wc")
    }
    val docs = (boiler ++ organic ++ filler).map { case (id, text) =>
      (id, text, "en", "src0", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val pairs = LlmOps.d4NgramJaccard(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

    // Without the ceiling, the 40 boilerplate docs alone produce
    // 40*39/2 = 780 jaccard>0 pairs (they all share the 3 header
    // shingles); with it, none do.
    val boilerIds = boiler.map(_._1).toSet
    val boilerPairs = pairs.filter { case (a, b) => boilerIds(a) && boilerIds(b) }
    assert(boilerPairs.isEmpty,
      s"boilerplate-only pairs should be dropped, got ${boilerPairs.size}")
    // The organic twins share 9 of their ~10 shingles, all with df = 2 —
    // far below the ceiling — so the true near-dup still surfaces.
    assert(pairs.contains((100L, 101L)), s"organic near-dup lost; pairs=$pairs")
  }
}
