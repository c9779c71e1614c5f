package graft

import org.apache.spark.sql.functions._

import graft.operators.LlmOps

/** Behavioral checks for the round-8 operators — each against an
  * independent Scala-side recomputation or a structural invariant the
  * shared DuckDB oracle can't express (file counts, probability-mass
  * identities), per SURVEY.md §5.2.5.
  */
class Round8Spec extends SparkTestBase {
  import spark.implicits._

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit =
    docs.map { case (id, text) => (id, text, "en", "src0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("t24 pair counts match a hand-computed BPE statistic and pick the right merge") {
    val dir = tempDir("bpe_docs")
    // "low" x3 and "lower" x2 — the Sennrich toy corpus shape. Pairs:
    // l+o: 5, o+w: 5, w+e: 2, e+r: 2. Top merge must be a 5-count pair.
    writeDocs(dir, Seq((1L, "low low low lower lower")))
    val pairs = LlmOps.t24BpePairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs(("l", "o")) === 5L)
    assert(pairs(("o", "w")) === 5L)
    assert(pairs(("w", "e")) === 2L)
    assert(pairs(("e", "r")) === 2L)
    assert(pairs.size === 4)
    val top = pairs.maxBy { case (p, n) => (n, p._1, p._2) }
    assert(top._2 === 5L, "the next BPE merge must be a maximal pair")
  }

  test("t24 drops single-character words on the real corpus (no pair, no row)") {
    // The fixture corpus contains the word "a"; every emitted pair must
    // come from a word of length >= 2, so both symbols are non-empty.
    val rows = LlmOps.t24BpePairs(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0).length === 1 && r.getString(1).length === 1)
      assert(r.getString(0).nonEmpty && r.getString(1).nonEmpty)
    }
  }

  test("t25 separates a token that only the positive class uses") {
    val dir = tempDir("clf_docs")
    // src0 docs share 'shibboleth' (weight 1000); src1 docs share
    // 'noise' (weight 0); 'common' appears in both (weight 500).
    Seq(
      (1L, "shibboleth common", "en", "src0", 18L),
      (2L, "shibboleth common", "en", "src0", 18L),
      (3L, "noise common", "en", "src1", 12L),
      (4L, "noise common", "en", "src1", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val scores = LlmOps.t25Classifier(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // src0 doc: (1000 + 500) / 2 = 750; src1 doc: (0 + 500) / 2 = 250.
    // Two sources -> derived prior milli(1, 2) = 500: 750 > 500 fires
    // is_pos, 250 does not.
    assert(scores(1L) === ((750L, 1L)))
    assert(scores(2L) === ((750L, 1L)))
    assert(scores(3L) === ((250L, 0L)))
    assert(scores(4L) === ((250L, 0L)))
  }

  test("t25 on the real corpus: scores stay in [0, 1000] and both classes appear") {
    val rows = LlmOps.t25Classifier(spark, Sf).collect()
    assert(rows.length > 0)
    rows.foreach(r => assert(r.getLong(2) >= 0L && r.getLong(2) <= 1000L))
    val pos = rows.count(_.getLong(3) == 1L)
    assert(pos > 0 && pos < rows.length,
      "the derived milli(1, n_src) prior cut must split the corpus, not degenerate")
  }

  test("t26 conditional rates: a deterministic successor scores 1000, a 50/50 one 500") {
    val dir = tempDir("lm_docs")
    // After 'a' always comes 'b' (p=1000); after 'b', 'a' or 'c' equally
    // (p=500 each). Doc 1 = "a b a b a b" -> bigrams ab,ba,ab,ba,ab:
    // avg = (1000+500+1000+500+1000)/5 = 800.
    writeDocs(dir, Seq((1L, "a b a b a b"), (2L, "a b c a b c")))
    val rows = LlmOps.t26BigramLm(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(1L)._1 === 5L)
    assert(rows(1L)._2 === 800L)
    // Doc 2 bigrams: ab,bc,ca,ab,bc -> (1000+500+1000+1000+500)/5 = 800.
    assert(rows(2L)._1 === 5L)
    assert(rows(2L)._2 === 800L)
  }

  test("t26 per-context rates sum to ~1000 per context (probability mass)") {
    // Structural identity of the trained model: for every context a the
    // conditional rates sum to one — sum over b of p_milli(b|a) ~= 1000,
    // exact up to round-half-up (half a milli per distinct successor).
    val bi = Tables.documents(spark, Sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(posexplode(col("toks")).as(Seq("pos", "a")), size(col("toks")).as("n"),
        col("toks"))
      .filter(col("pos") <= col("n") - 2)
      .select(col("a"), element_at(col("toks"), col("pos") + 2).as("b"))
    val cA = bi.groupBy("a").agg(count(lit(1)).as("c_a"))
    val model = bi.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      .join(cA, "a")
      .select(col("a"), col("c_a"), col("c_ab"),
        expr("(2000 * c_ab + c_a) div (2 * c_a)").as("p_milli"))
    val off = model.groupBy("a")
      .agg(sum(col("p_milli")).as("mass"), count(lit(1)).as("n_succ"))
      .filter(abs(col("mass") - 1000L) > col("n_succ") / 2 + 1)
      .count()
    assert(off === 0L, "per-context probability mass must be ~1000 milli")
  }

  test("q_compact leaves a single packed file behind (the 64-file layout is gone)") {
    // Content preservation is the oracle's job; this locks the layout
    // effect: after Scale.compactFiles the table directory holds one
    // data file, not the 64-file post-ingest fragmentation.
    val df = graft.operators.Scale.qCompact(spark, Sf)
    val dir = df.inputFiles
    assert(dir.length === 1, s"expected 1 compacted file, got ${dir.length}")
    assert(df.count() === Tables.orders(spark, Sf).count())
  }
}
