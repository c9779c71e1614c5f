package graft

import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream LEFT OUTER join (st7's shape) across micro-batches:
  * a matched pair emits as soon as both sides arrived; a never-matched
  * left row emits null-extended only AFTER the global watermark (min of
  * both streams') passes its whole match window; a left row whose
  * window is still open emits nothing yet.
  */
class StreamLeftJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("unmatched rows emit null-extended once the watermark closes their window") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = Instant.parse("2024-01-01T00:00:00Z")
    def at(min: Long) = t0.plusSeconds(min * 60)
    val sIn = MemoryStream[(Long, Long, Instant)]
    val pIn = MemoryStream[(Long, Long, Instant)]
    val signups = sIn.toDS().toDF("signup_id", "s_user", "s_ts")
      .withWatermark("s_ts", "10 minutes")
    val purchases = pIn.toDS().toDF("purchase_id", "p_user", "p_ts")
      .withWatermark("p_ts", "10 minutes")
    val joined = signups.join(purchases,
      col("s_user") === col("p_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"),
      "leftOuter")
    val query = joined.writeStream
      .format("memory").queryName("left_join_stream")
      .outputMode("append")
      .option("checkpointLocation", tempDir("lj_ckpt"))
      .start()
    try {
      // Batch 1: u1 signs up and buys (match); u2 signs up, never buys.
      sIn.addData((1L, 1L, at(0)), (2L, 2L, at(0)))
      pIn.addData((10L, 1L, at(30)))
      query.processAllAvailable()
      // Batch 2: activity 3 h later on BOTH streams pushes the global
      // watermark past u2's (1 h) window end → its null row must emit.
      sIn.addData((3L, 3L, at(180)))
      pIn.addData((20L, 3L, at(181)))
      query.processAllAvailable()
      val rows = spark.table("left_join_stream")
        .select(col("signup_id"), col("s_user"),
          coalesce(col("purchase_id"), lit(-1L)))
        .as[(Long, Long, Long)].collect().toSet
      assert(rows === Set(
        (1L, 1L, 10L),  // matched in batch 1
        (3L, 3L, 20L),  // matched in batch 2
        (2L, 2L, -1L))) // evicted unmatched after the watermark advanced
    } finally query.stop()
  }
}
