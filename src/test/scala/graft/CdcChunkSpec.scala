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
  private def pseudoText(n: Int): String = {
    var x = 12345L
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
}
