package graft

import org.apache.spark.sql.functions._

import graft.operators.LlmOps

/** The content-defined-chunking claim, measured: CDC boundaries derive
  * from content, so an edit near the head of a document only disturbs
  * chunks up to the first boundary after the edit — everything
  * downstream re-aligns and keeps identical chunk hashes. Fixed-stride
  * chunking (t15's geometry) loses every chunk after an insertion.
  */
class CdcChunkSpec extends SparkTestBase {

  // LCG-driven, aperiodic (a modular-polynomial-in-i alphabet is
  // periodic in i, which collapses the window-hash space and starves
  // the boundary rule of candidates).
  private def pseudoText(n: Int, seed: Long = 12345L): String = {
    var x = seed
    (0 until n).map { _ =>
      x = (x * 1103515245L + 12345L) & 0x7fffffffL
      ('a' + (x % 26)).toChar
    }.mkString
  }

  test("CDC chunks re-align after a prefix insertion; generator edge cases hold") {
    import spark.implicits._
    val base = pseudoText(2400)
    val dir = tempDir("cdc_fixture")
    Seq((0L, base), (1L, "INSERTED-PREFIX-" + base))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")

    val chunks = LlmOps.t18CdcChunks(spark, dir)
      .select("doc_id", "chunk_md5").as[(Long, String)].collect()
    val md5s0 = chunks.filter(_._1 == 0L).map(_._2).toSet
    val md5s1 = chunks.filter(_._1 == 1L).map(_._2).toSet
    assert(md5s0.size >= 4, s"expected several chunks, got ${md5s0.size}")
    val shared = (md5s0 intersect md5s1).size
    // Only the chunks spanning the edit should differ.
    assert(shared * 2 >= md5s0.size,
      s"CDC should preserve at least half the chunks across a prefix edit " +
        s"(shared $shared of ${md5s0.size})")

    // Generator edge semantics: short text → one degenerate window at
    // pos 0; empty text → no rows (one sentinel chunk of length 0 would
    // be meaningless downstream).
    val hashes = spark.sql(
      s"SELECT rolling_hashes('abc', ${LlmOps.CdcWindow}) AS (pos, hash)")
    assert(hashes.count() === 1)
    assert(hashes.select("pos").head().getLong(0) === 0L)
    // And the degenerate hash equals the min-hash of the same string
    // (single window ⇒ min over one element).
    val single = hashes.select("hash").head().getLong(0)
    val minh = spark.sql(s"SELECT rolling_min_hash('abc', ${LlmOps.CdcWindow}) AS h")
      .head().getLong(0)
    assert(single === minh)

    // The window literal accepts every integral width — TINYINT through
    // BIGINT all fold to the same Int window.
    Seq("TINYINT", "SMALLINT", "INT", "BIGINT").foreach { t =>
      val h = spark.sql(s"SELECT rolling_hashes('abcdef', CAST(3 AS $t)) AS (pos, hash)")
      assert(h.count() === 4, s"window literal as $t")
    }
  }

  test("t19 finds a span copied across documents; unique text contributes nothing") {
    import spark.implicits._
    val dir = tempDir("dup_spans")
    val copied = "THE-EXACT-COPIED-LICENSE-HEADER-LINE-HERE" // 41 chars > SpanWindow
    val docs = Seq(
      (1L, copied + pseudoText(200, seed = 1)),
      (2L, pseudoText(180, seed = 2) + copied),    // same span, different offset
      (3L, pseudoText(150, seed = 3) + copied + pseudoText(90, seed = 4)),
      (4L, pseudoText(400, seed = 5)))             // no copied content
      .map { case (id, text) => (id, text, "en", "src0", text.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val spans = LlmOps.t19DupSpans(spark, dir)
      .select("span_md5", "n_docs").as[(String, Long)].collect().toMap
    // Every 32-window inside the copied region is shared by docs 1-3.
    val windows = (0 to copied.length - LlmOps.SpanWindow).map { i =>
      org.apache.commons.codec.digest.DigestUtils.md5Hex(
        copied.substring(i, i + LlmOps.SpanWindow))
    }
    windows.foreach { m =>
      assert(spans.get(m).contains(3L), s"copied-span window missing or wrong count")
    }
    // The LCG filler is aperiodic — doc 4 shares nothing.
    assert(spans.values.forall(_ <= 3L))
  }
}
