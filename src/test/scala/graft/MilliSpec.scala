package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.LlmOps

/** Property: the integer `milli` expression — (2000·num + den) div
  * (2·den) — equals round-half-up(1000·num/den) computed exactly in
  * BigDecimal, for every positive denominator. Every `*_milli` oracle
  * column (Jaccard, TTR, quality, avg token length, ...) rests on this
  * identity holding in BOTH engines; here the Spark side is pinned to
  * the mathematical definition. Same raw-Gen style as ScalarsSpec (one
  * vectorized evaluation, fixed seed).
  */
class MilliSpec extends SparkTestBase {
  import spark.implicits._

  test("milli(num, den) == round-half-up(1000*num/den) over random non-negative pairs") {
    val gen = for {
      num <- Gen.chooseNum(0L, 1000000L)
      den <- Gen.chooseNum(1L, 1000000L)
    } yield (num, den)
    val samples = Gen.listOfN(500, gen)
      .apply(Gen.Parameters.default, Seed(42L)).get ++
      Seq((0L, 1L), (1L, 2L), (1L, 3L), (2L, 3L), (999L, 1000L), (1000L, 1000L),
        (1L, 1000000L), (999999L, 1000000L)) // boundaries incl. exact halves
    val got = samples.toDF("n", "d")
      .selectExpr("n", "d", LlmOps.milli("n", "d") + " as m")
      .collect()
    got.foreach { r =>
      val (n, d, m) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val expected = (BigDecimal(n * 1000) / BigDecimal(d))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      assert(m === expected, s"num=$n den=$d")
    }
    assert(got.length >= 500)
  }
}
