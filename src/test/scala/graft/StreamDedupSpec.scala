package graft

import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ingestion dedup (st5): the dedup state must persist across
  * micro-batches within the watermark horizon — a duplicate key arriving
  * in a LATER batch is dropped, not re-emitted. Mirrors the semantics
  * [[graft.streaming.Streaming.streamDedup]] documents.
  */
class StreamDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("duplicates within the watermark horizon are dropped across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = Instant.parse("2024-01-01T00:00:00Z")
    def at(sec: Long) = t0.plusSeconds(sec)
    val input = MemoryStream[(String, Long, Instant)]
    val deduped = input.toDS().toDF("event_type", "user_id", "ts")
      .select(col("event_type"), col("user_id"),
        date_trunc("minute", col("ts")).as("minute"))
      .withWatermark("minute", "10 minutes")
      .dropDuplicatesWithinWatermark("event_type", "user_id", "minute")
    val query = deduped.writeStream
      .format("memory").queryName("dedup_stream")
      .outputMode("append")
      .option("checkpointLocation", tempDir("dedup_ckpt"))
      .start()
    try {
      // Batch 1: two events in the same minute bucket — ONE emission.
      input.addData(("click", 1L, at(10)), ("click", 1L, at(40)))
      query.processAllAvailable()
      // Batch 2: same key again (still within the horizon) — dropped —
      // plus a fresh key that must emit.
      input.addData(("click", 1L, at(50)), ("click", 2L, at(1800)))
      query.processAllAvailable()
      val rows = spark.table("dedup_stream")
        .select(col("event_type"), col("user_id"), col("minute"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getAs[java.sql.Timestamp](2).toInstant))
        .toSet
      assert(rows === Set(
        ("click", 1L, at(0)),
        ("click", 2L, at(1800))))
    } finally query.stop()
  }
}
