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
      .agg(count("*").as("n_events"),
        sum(expr("cast(round(value * 1000) as bigint)")).as("total_value_milli"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value_milli"))
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

  test("streaming upsert sink replaces only its own partitions") {
    import spark.implicits._
    val out = tempDir("stream_upsert")
    // Pre-seed a partition owned by "another pipeline": event_type values
    // in the stream never include 'seeded', so the upsert must not touch it.
    Seq((java.sql.Timestamp.valueOf("2000-01-01 00:00:00"), "seeded", 7L))
      .toDF("window_start", "event_type", "n_events")
      .write.partitionBy("event_type").mode("append").parquet(out)
    // Partition-column reads append event_type LAST; re-pin the column
    // order since exceptAll compares positionally.
    val written = Streaming.upsertToPartitions(spark, Sf, out)
      .select("window_start", "event_type", "n_events")
    // The foreign partition survived intact...
    val seeded = written.filter(col("event_type") === "seeded")
    assert(seeded.count() === 1)
    assert(seeded.select("n_events").as[Long].head() === 7L)
    // ...and the stream's own partitions hold exactly the batch twin.
    val batch = Tables.events(spark, Sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count("*").as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))
    assertSameRows(written.filter(col("event_type") =!= "seeded"), batch)
    // Idempotence: re-running the same window replaces, never duplicates.
    val rerun = Streaming.upsertToPartitions(spark, Sf, out)
      .select("window_start", "event_type", "n_events")
    assertSameRows(rerun.filter(col("event_type") =!= "seeded"), batch)
    assert(rerun.filter(col("event_type") === "seeded").count() === 1)
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

  test("derived stream partitions scale with input bytes, floored and capped") {
    val target = Streaming.StreamBytesPerPartition
    val cap = math.max(4, spark.sparkContext.defaultParallelism)
    // Fixture-sized inputs sit at the measured local-optimum floor (4).
    assert(Streaming.derivedStreamPartitions(spark, 0L) === 4)
    assert(Streaming.derivedStreamPartitions(spark, 2L << 20) === 4)
    // Past the floor the count follows the byte rule (ceil bytes/target),
    // capped at the session's parallelism: an unset conf can never
    // produce more state stores than the session has cores to commit.
    assert(Streaming.derivedStreamPartitions(spark, 6 * target)
      === math.min(6, cap))
    assert(Streaming.derivedStreamPartitions(spark, 6 * target + 1)
      === math.min(7, cap))
    assert(Streaming.derivedStreamPartitions(spark, 100000L * target) === cap)
  }
}
