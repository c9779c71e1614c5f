package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.RollingMinHash

/** The O(n) rolling update must equal the O(n·w) from-scratch window
  * hash everywhere — including strings shorter than the window and the
  * empty string — and the registered SQL expression must equal the
  * static loop.
  */
class RollingMinHashSpec extends SparkTestBase {
  import spark.implicits._

  // From-scratch reference over CODEPOINTS — the engine's declared
  // contract (and the oracle twins' ord()/substr() semantics).
  private def brute(s: String, w: Int): Long = {
    import RollingMinHash.{Base, Mod}
    val cp = s.codePoints().toArray
    val n = cp.length
    if (n == 0) return 0L
    val ww = math.min(w, n)
    (0 to n - ww).map { i =>
      (0 until ww).foldLeft(0L)((h, j) => (h * Base + cp(i + j)) % Mod)
    }.min
  }

  test("rolling update equals from-scratch window hashes on random strings") {
    val gen = for {
      len <- Gen.chooseNum(0, 200)
      cs <- Gen.listOfN(len, Gen.chooseNum(32, 126))
    } yield cs.map(_.toChar).mkString
    val samples = Gen.listOfN(300, gen).apply(Gen.Parameters.default, Seed(7L)).get ++
      Seq("", "a", "short", "exactly8", "123456789")
    samples.foreach { s =>
      assert(RollingMinHash.compute(s, 8) === brute(s, 8), s"input='$s'")
    }
  }

  test("non-ASCII text hashes codepoints: BMP accents and surrogate pairs") {
    // é is one codepoint (0xE9); 𝄞 (U+1D11E) is a surrogate PAIR in
    // Java's UTF-16 String — a UTF-16-unit loop would hash two units and
    // shift every later position. The engine must agree with the
    // codepoint reference on both, and window widths count codepoints.
    val samples = Seq(
      "café crème brûlée",
      "clef: 𝄞 then ascii tail",
      "𝄞𝄞𝄞",
      "mixed é𝄞ü end")
    samples.foreach { s =>
      assert(RollingMinHash.compute(s, 4) === brute(s, 4), s"input='$s'")
      // 4-codepoint string ≡ one degenerate window at w≥4
      val cpLen = s.codePoints().count().toInt
      assert(RollingMinHash.compute(s, cpLen) === brute(s, cpLen))
    }
    // hashIterator position count = cpLen - w + 1 (codepoint positions)
    val s = "ab𝄞cd" // 5 codepoints, 6 UTF-16 units
    val rows = functions.RollingHashes.hashIterator(s, 2).toList
    assert(rows.size === 4)
  }

  test("the registered SQL expression equals the static loop") {
    val rows = Tables.documents(spark, Sf).limit(50)
      .select(col("doc_id"), col("text"),
        expr("rolling_min_hash(text, 8)").as("fp"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) === RollingMinHash.compute(r.getString(1), 8))
    }
  }
}
