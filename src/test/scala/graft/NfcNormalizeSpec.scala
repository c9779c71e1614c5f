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
