package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Streaming results must equal their batch twins (the §2.9 contract:
  * AvailableNow + complete output ≡ batch over the same data).
  */
class StreamingSpec extends SparkTestBase {

  private def assertSameRows(stream: DataFrame, batch: DataFrame): Unit = {
    assert(stream.count() > 0)
    assert(stream.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(stream).count() === 0)
  }

  test("tumbling streaming windows equal the batch groupBy-window twin") {
    val batch = Tables.events(spark, Sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count("*").as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
    assertSameRows(Streaming.tumblingCounts(spark, Sf), batch)
  }

  test("foreachBatch parquet sink holds the final aggregate state") {
    val out = tempDir("stream_sink")
    val written = Streaming.tumblingToParquet(spark, Sf, out)
    val batch = Tables.events(spark, Sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count("*").as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))
    assertSameRows(written, batch)
  }

  test("session streaming windows equal the batch session_window twin") {
    val batch = Tables.events(spark, Sf)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count("*").as("n_events"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))
    assertSameRows(Streaming.sessionCounts(spark, Sf), batch)
  }
}
