package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column functions re-expressing the reference's row-level Python
  * helpers as pure Catalyst expression trees (codegen'd, pushdown-friendly —
  * no UDFs anywhere).
  *
  * Reference semantics pinned here:
  *  - calc_age: dags/tasks/planning_center.py:73-78 — integer year diff with
  *    a "(month, day) tuple-compare" birthday adjustment, formatted
  *    "<n> years", empty string (never null) when the date is missing.
  *  - stringify_grade: dags/tasks/planning_center.py:81-82 — "Grade <g>"
  *    with Python truthiness: grade 0 and null both collapse to ''.
  *  - default-if-empty: planning_center.py:65,70 — missing values become ''.
  */
object Scalars {

  /** Whole years between `birth` and `asOf`, with the not-yet-had-birthday
    * adjustment done exactly like the reference's tuple compare
    * (planning_center.py:76): subtract one iff (asOf.month, asOf.day) <
    * (birth.month, birth.day). Implemented with explicit month/day
    * comparisons (not months_between) so Feb-29 and same-day edges match the
    * reference bit-for-bit.
    */
  def ageYears(birth: Column, asOf: Column): Column = {
    val notYet =
      (month(asOf) < month(birth)) ||
        (month(asOf) === month(birth) && dayofmonth(asOf) < dayofmonth(birth))
    year(asOf) - year(birth) - when(notYet, 1).otherwise(0)
  }

  /** "<n> years" or '' for null birth dates (planning_center.py:73-78). */
  def ageLabel(birth: Column, asOf: Column): Column =
    when(birth.isNull, lit(""))
      .otherwise(concat(ageYears(birth, asOf).cast("string"), lit(" years")))

  /** "Grade <g>", with grade 0 / null → '' (Python truthiness,
    * planning_center.py:81-82).
    */
  def gradeLabel(grade: Column): Column =
    when(grade.isNull || grade === 0, lit(""))
      .otherwise(concat(lit("Grade "), grade.cast("string")))

  /** Reference null discipline: '' instead of null at output boundaries
    * (planning_center.py:65,70,78,82). Keep nulls internal; apply this only
    * in final projections.
    */
  def emptyIfNull(c: Column): Column = coalesce(c, lit(""))
}
