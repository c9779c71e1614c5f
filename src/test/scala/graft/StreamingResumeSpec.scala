package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Checkpoint RESUME — the incremental-ingest contract behind every
  * AvailableNow backfill here: the file-source offset log in the
  * checkpoint remembers which files were processed, so a restarted run
  * reads ONLY what landed since, while the aggregation state carries
  * the history. Re-running from a fresh checkpoint would also be
  * CORRECT (reprocess everything, same final table) — what this spec
  * pins is the COST shape: per-run input ∝ new data, the property that
  * makes a daily 100 TB ingest pay for a day, not for the corpus.
  */
class StreamingResumeSpec extends SparkTestBase {
  import spark.implicits._

  test("a resumed run reads only newly landed files; state carries history") {
    val src = tempDir("resume_src")
    val ckpt = tempDir("resume_ckpt")
    val out = tempDir("resume_out")
    val schema = StructType(Seq(
      StructField("event_type", StringType), StructField("n", LongType)))

    def land(name: String, rows: Seq[(String, Long)]): Unit =
      rows.toDF("event_type", "n").coalesce(1)
        .write.parquet(s"$src/$name")

    def runOnce(): Long = {
      val agged = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(s"$src/*")
        .groupBy("event_type").agg(sum("n").as("total"))
      val q = agged.writeStream
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(out)
        }
        .start()
      q.awaitTermination()
      q.recentProgress.map(_.numInputRows).sum
    }

    land("batch_a", Seq(("signup", 1L), ("signup", 2L), ("purchase", 10L)))
    val read1 = runOnce()
    assert(read1 === 3L, s"first run must read the 3 landed rows, read $read1")

    land("batch_b", Seq(("purchase", 5L)))
    val read2 = runOnce()
    // The offset log skips batch_a's files entirely.
    assert(read2 === 1L, s"resumed run must read ONLY the new row, read $read2")

    // The complete-mode state still carries batch_a's history.
    val totals = spark.read.parquet(out)
      .as[(String, Long)].collect().toMap
    assert(totals === Map("signup" -> 3L, "purchase" -> 15L))
  }
}
