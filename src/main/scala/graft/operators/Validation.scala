package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dual-source count reconciliation — the reference's one correctness idea
  * (dags/tasks/webscraper.py:88-96, consumed at
  * dags/tasks/planning_center.py:53-58): compare an expected count against
  * an independently-computed actual count, per key.
  *
  * Semantics pinned from the reference:
  *  - match        → valid = 1
  *  - mismatch     → valid = 0
  *  - key missing from the actual side → valid = 0 (the `:96` fall-through)
  *
  * The reference re-scans the whole expected dict per key — O(keys²); here
  * it is a single equi-join. Both inputs are post-aggregation (one row per
  * key), so at any scale this join broadcasts.
  */
object Validation {

  /** @param expected DataFrame with columns (key, expected_count)
    * @param actual   DataFrame with columns (key, actual_count)
    * @return (key, expected_count, actual_count, valid) — actual_count 0
    *         when the key never showed up (missing → invalid, like `:96`).
    */
  def validateCounts(expected: DataFrame, actual: DataFrame, key: String): DataFrame =
    expected.join(actual, Seq(key), "left")
      .select(
        col(key),
        col("expected_count"),
        coalesce(col("actual_count"), lit(0L)).as("actual_count"),
        when(col("actual_count") === col("expected_count"), 1).otherwise(0).as("valid"))

  /** Run-level verdict: 1 iff every per-key check passed (the engine-side
    * aggregate the reference only logged, planning_center.py:53-58).
    */
  def overallVerdict(verdicts: DataFrame): DataFrame =
    verdicts.agg(min(col("valid")).as("all_valid"), count(lit(1)).as("n_checks"))
}
