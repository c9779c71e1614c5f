package graft

import graft.operators.LlmOps

/** The NFC fold's load-bearing property (VERDICT r14 #6): composed and
  * decomposed Unicode forms of the same text coalesce into ONE dedup
  * class under d10b, while byte-exact d1 keeps them apart. Plus the
  * expression-level contracts: UAX #15 canonical composition against
  * java.text.Normalizer pinned values, ASCII pass-through, null safety.
  */
class NfcNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  // 'café' composed (U+00E9) vs decomposed (e + U+0301 combining acute).
  private val composed = "café menu"
  private val decomposed = "café menu"

  test("nfc_normalize composes decomposed input and passes composed through") {
    val rows = Seq(composed, decomposed, "plain ascii", "Ångström")
      .toDF("s").selectExpr("s", "nfc_normalize(s) AS n").collect()
    assert(rows(0).getString(1) === composed)  // already NFC — unchanged
    assert(rows(1).getString(1) === composed)  // decomposed → composed
    assert(rows(2).getString(1) === "plain ascii")
    assert(rows(3).getString(1) ===
      java.text.Normalizer.normalize("Ångström",
        java.text.Normalizer.Form.NFC))
  }

  // ADVICE r15 (medium): the d10b fold lowercases with simple_lower
  // (per-code-point simple mapping — what DuckDB's utf8proc lower()
  // applies), NOT Spark's full-mapping lower(). These fixtures pin the
  // exact full-vs-simple divergence class: values asserted here equal
  // DuckDB's lower() output (verified against duckdb: 'İ'→'i' one code
  // point, 'ΟΣ'→'οσ' with non-final σ), while Spark's lower() yields
  // 'i'+U+0307 and final-sigma 'ος' — so the built-in would fail this.
  test("simple_lower matches utf8proc's simple mapping where full mapping diverges") {
    val rows = Seq("İstanbul", "ΟΣ", "MiXeD ascii", "ÉCOLE")
      .toDF("s").selectExpr("simple_lower(s) AS l").collect()
    val istanbul = rows(0).getString(0)
    assert(istanbul === "istanbul")                      // not "i̇stanbul"
    assert(istanbul.codePointCount(0, istanbul.length) === 8)
    assert(rows(1).getString(0) === "οσ")      // σ, never final ς
    assert(rows(2).getString(0) === "mixed ascii")       // ASCII fast path
    assert(rows(3).getString(0) === "école")
    // Full d10b fold agreement on the same inputs: one dedup class for
    // the case variants that differ only in the divergent code point.
    val n = spark.sql(
      "SELECT count(DISTINCT trim(regexp_replace(simple_lower(nfc_normalize(s)), ' +', ' '))) c " +
      "FROM VALUES ('İstanbul'), ('istanbul'), ('Istanbul') AS t(s)").collect()
    assert(n.head.getLong(0) === 1L)
  }

  test("simple_lower null propagation and empty string") {
    val r = spark.sql(
      "SELECT simple_lower(CAST(NULL AS STRING)) AS n, simple_lower('') AS e").collect()
    assert(r.head.isNullAt(0))
    assert(r.head.getString(1) === "")
  }

  test("nfc_normalize null propagation") {
    val r = spark.sql("SELECT nfc_normalize(CAST(NULL AS STRING)) AS n").collect()
    assert(r.head.isNullAt(0))
  }

  test("d10b coalesces composed/decomposed near-clones that d1 splits") {
    val dir = tempDir("nfc_docs")
    val texts = Seq(
      composed,            // doc 0
      decomposed,          // doc 1 — same class as 0 under NFC
      "CAFÉ   menu",  // doc 2 — case+spacing variant, same class
      "cafe menu")         // doc 3 — genuinely different (no accent)
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", s"src$i", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val d10b = LlmOps.d10bNfcDedup(spark, dir).collect()
    assert(d10b.length === 2) // {0,1,2} and {3}
    val merged = d10b.filter(_.getLong(2) == 3L)
    assert(merged.length === 1 && merged.head.getLong(1) === 0L)
    // d1 (byte-exact) keeps all four apart — the gap d10b closes.
    assert(LlmOps.d1DedupExact(spark, dir).count() === 4L)
  }
}
