package graft

import org.apache.spark.sql.functions._

import graft.streaming.Sessionize

/** The custom flatMapGroupsWithState sessionizer must reproduce the
  * built-in session_window exactly (same gap rule, same end = last+gap).
  */
class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  test("typed custom-state sessionizer equals the built-in session_window") {
    val events = Tables.events(spark, Sf)
      .select(col("user_id"), col("ts"))
      .as[Sessionize.Ev]
    val custom = Sessionize.sessions(spark, events).toDF
    val builtin = Tables.events(spark, Sf)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count("*").as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
    assert(custom.count() > 0)
    assert(custom.exceptAll(builtin).count() === 0)
    assert(builtin.exceptAll(custom).count() === 0)
  }
}
