package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.LlmOps

/** The r15 seeded MinHash family's mixer: `mix64(x, a, b)` must equal
  * ((a·x + b) mod 2^64) >>> 4 computed exactly — the value the DuckDB
  * twins restate in HUGEINT arithmetic (SparkEntry.duckMix). Pinning
  * the Spark side to BigInt mod-2^64 here means the banded-family
  * oracles check engine parity, not two copies of the same mistake.
  */
class Mix64Spec extends SparkTestBase {
  import spark.implicits._

  private def refMix(x: Long, a: Long, b: Long): Long = {
    val m = BigInt(1) << 64
    val ux = BigInt(x) & (m - 1)
    val ua = BigInt(a) & (m - 1)
    val ub = BigInt(b) & (m - 1)
    (((ua * ux + ub) mod m) >> 4).longValue
  }

  test("mix64 equals BigInt mod-2^64 multiply-add-shift over random inputs") {
    val gen = for {
      x <- Gen.chooseNum(0L, (1L << 60) - 1) // hash60 domain
      k <- Gen.chooseNum(0, LlmOps.NumHashes - 1)
    } yield (x, k)
    val samples = Gen.listOfN(500, gen)
      .apply(Gen.Parameters.default, Seed(42L)).get ++
      (0 until LlmOps.NumHashes).flatMap(k =>
        Seq((0L, k), (1L, k), ((1L << 60) - 1, k)))
    val got = samples.toDF("x", "k")
      .selectExpr("x", "k",
        (0 until LlmOps.NumHashes).map(k =>
          s"mix64(x, ${LlmOps.MixA(k)}L, ${LlmOps.MixB(k)}L)")
          .mkString("array(", ", ", ") as hs"))
      .collect()
    got.foreach { r =>
      val x = r.getLong(0)
      val hs = r.getSeq[Long](2)
      (0 until LlmOps.NumHashes).foreach { k =>
        assert(hs(k) === refMix(x, LlmOps.MixA(k), LlmOps.MixB(k)),
          s"x=$x k=$k")
      }
    }
    assert(got.length >= 500)
  }

  test("mix64 results land in [0, 2^60) and constants satisfy the oracle bounds") {
    // a_k odd (bijection mod 2^64) and both < 2^63 (HUGEINT product
    // headroom in the DuckDB twin) — the documented contract.
    LlmOps.MixA.foreach { a =>
      assert(a > 0 && (a & 1L) === 1L, s"a=$a must be positive odd (< 2^63)")
    }
    LlmOps.MixB.foreach { b => assert(b > 0, s"b=$b must be < 2^63") }
    val vals = Seq(0L, 1L, 42L, (1L << 60) - 1).toDF("x")
      .selectExpr(s"mix64(x, ${LlmOps.MixA(0)}L, ${LlmOps.MixB(0)}L) as h")
      .as[Long].collect()
    vals.foreach(h => assert(h >= 0 && h < (1L << 60), s"h=$h"))
  }

  test("mix64 null propagation") {
    val r = spark.sql(
      s"SELECT mix64(CAST(NULL AS BIGINT), ${LlmOps.MixA(0)}L, ${LlmOps.MixB(0)}L) AS h")
      .collect()
    assert(r.head.isNullAt(0))
  }
}
