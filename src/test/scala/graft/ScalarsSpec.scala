package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Scalars

/** Pins the exact reference semantics of the scalar derivations:
  *
  *  - F1 calc_age (planning_center.py:73-78): integer year difference
  *    with the "(month, day) tuple-compare" birthday adjustment (:76),
  *    formatted "<n> years", '' for missing dates.
  *  - F2 stringify_grade (:81-82): "Grade <g>" with Python truthiness —
  *    grade 0 AND null both collapse to ''.
  *
  * The age property check compares the Spark expression against a direct
  * Scala reimplementation of the reference's tuple compare over a
  * ScalaCheck-generated date sample (fixed seed — deterministic), plus
  * the named edge cases: Feb-29, birthday exactly today, birthday
  * tomorrow, end-of-year wraps.
  */
class ScalarsSpec extends SparkTestBase {
  import spark.implicits._

  /** The reference formula, verbatim (planning_center.py:76):
    * age = today.year - birth.year - ((today.month, today.day) < (birth.month, birth.day))
    */
  private def referenceAge(birth: LocalDate, asOf: LocalDate): Int = {
    val notYet =
      (asOf.getMonthValue, asOf.getDayOfMonth) < ((birth.getMonthValue, birth.getDayOfMonth))
    asOf.getYear - birth.getYear - (if (notYet) 1 else 0)
  }

  private implicit val tupleOrdering: Ordering[(Int, Int)] = Ordering.Tuple2[Int, Int]
  private def lt(a: (Int, Int), b: (Int, Int)): Boolean = tupleOrdering.lt(a, b)
  // Overload shim so the reference formula above reads like the Python.
  implicit private class TupleCmp(a: (Int, Int)) {
    def <(b: (Int, Int)): Boolean = lt(a, b)
  }

  private def checkAges(dates: Seq[LocalDate], asOf: LocalDate): Unit = {
    val df = dates.map(_.toString).toDF("birthdate")
    val got = df
      .select(col("birthdate"),
        Scalars.ageYears(to_date(col("birthdate")), to_date(lit(asOf.toString))).as("age"))
      .collect()
      .map(r => r.getString(0) -> r.getInt(1))
      .toMap
    dates.foreach { d =>
      assert(got(d.toString) === referenceAge(d, asOf),
        s"ageYears($d, asOf=$asOf) != reference tuple-compare")
    }
  }

  test("F1 ageYears matches the reference tuple-compare on a generated sample") {
    val gen = Gen.choose(0L, 365L * 130)
      .map(off => LocalDate.of(1900, 1, 1).plusDays(off))
    // Deterministic sample: fixed seed, 400 dates (includes leap years).
    val dates = Gen.listOfN(400, gen)(Gen.Parameters.default, Seed(42L)).get.distinct
    for (asOf <- Seq(LocalDate.of(2026, 6, 1), LocalDate.of(2024, 2, 29), LocalDate.of(2025, 12, 31)))
      checkAges(dates, asOf)
  }

  test("F1 edge cases: Feb-29, birthday today, birthday tomorrow, year edges") {
    val asOf = LocalDate.of(2026, 6, 1)
    val edges = Seq(
      LocalDate.of(2012, 2, 29),  // leap birthdate, non-leap asOf year
      LocalDate.of(2000, 6, 1),   // birthday exactly today → full age
      LocalDate.of(2000, 6, 2),   // birthday tomorrow → one less
      LocalDate.of(2000, 5, 31),  // birthday yesterday
      LocalDate.of(1999, 12, 31),
      LocalDate.of(2000, 1, 1),
      LocalDate.of(2026, 6, 1))   // born "today" → 0
    checkAges(edges, asOf)
    // Feb-29 birthdate against a Feb-28 as-of: tuple (2,28) < (2,29) → not yet.
    checkAges(Seq(LocalDate.of(2012, 2, 29)), LocalDate.of(2026, 2, 28))
    checkAges(Seq(LocalDate.of(2012, 2, 29)), LocalDate.of(2026, 3, 1))
  }

  test("F1 ageLabel formats '<n> years' and maps missing dates to ''") {
    val df = Seq(Some("2010-03-15"), None, Some("")).toDF("birthdate")
    // try_to_date: ANSI mode throws on '' with plain to_date; the
    // reference's '' → '' path needs the graceful parse.
    val got = df.select(
      Scalars.ageLabel(try_to_date(col("birthdate")), to_date(lit("2026-06-01"))).as("age"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("16 years", "", ""))
  }

  test("F2 gradeLabel: Python truthiness — 0 and null both become ''") {
    val df = Seq(Some(0), None, Some(5), Some(12)).toDF("grade")
    val got = df.select(Scalars.gradeLabel(col("grade")).as("g"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("", "", "Grade 5", "Grade 12"))
  }

  test("F7 emptyIfNull substitutes '' only for null") {
    val df = Seq(Some("x"), None, Some("")).toDF("v")
    val got = df.select(Scalars.emptyIfNull(col("v")).as("v"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("x", "", ""))
  }
}
