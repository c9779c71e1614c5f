package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale

/** The Z-order layout claim, measured on the files it writes: under a
  * z-ordered layout a range predicate on EITHER column can skip most
  * files by parquet min/max stats, while a single-column sort prunes
  * only its own column. The spec computes per-file (min, max) envelopes
  * for both columns — exactly the stats a reader's row-group/file skip
  * consults — and counts how many files a fixed range query overlaps.
  */
class ZOrderSpec extends SparkTestBase {

  test("z-ordered layout prunes on both dimensions; linear sort only on one") {
    val events = Tables.events(spark, Sf)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"))
    val files = 8

    val zDir = tempDir("zorder")
    Scale.writeZOrdered(events, zDir, "user_id", "ts_ms", files)
    // Baseline: the same data sorted by ts only (the default "sort by
    // time" layout every ingest naturally produces).
    val tsDir = tempDir("tssort")
    events.repartitionByRange(files, col("ts_ms"))
      .sortWithinPartitions("ts_ms")
      .write.mode("overwrite").parquet(tsDir)

    def envelopes(dir: String): Seq[(Long, Long, Long, Long)] = {
      val fs = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(fs.length > 1, s"expected multiple files in $dir")
      fs.toSeq.map { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min("user_id"), max("user_id"), min("ts_ms"), max("ts_ms"))
          .collect().head
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    }
    // A query for a narrow user band (~13% of the sf0.001 domain
    // [0, 14]) — the lookup shape a second index column exists for.
    val (uLo, uHi) = (5L, 6L)
    def overlapping(env: Seq[(Long, Long, Long, Long)]): Int =
      env.count { case (ulo, uhi, _, _) => uhi >= uLo && ulo <= uHi }

    val zHit = overlapping(envelopes(zDir))
    val tsHit = overlapping(envelopes(tsDir))
    // Time-sorted files each span ~all users: every file matches. The
    // z-layout confines users to a few rectangles.
    assert(tsHit === files, s"ts-sorted layout should not prune on user_id (hit $tsHit)")
    assert(zHit * 2 <= files,
      s"z-ordered layout should skip at least half the files on a user range (hit $zHit of $files)")
    // And the data itself round-trips unchanged.
    val back = spark.read.parquet(zDir)
    assert(back.count() === events.count())
    assert(back.exceptAll(events).count() === 0)

    // RUNTIME proof, not just envelopes: the scan's numOutputRows under
    // the pushed user-band predicate counts rows actually DECODED after
    // row-group skipping — the z layout must decode far less than the
    // time-sorted one (which matches every row group's user envelope).
    def decodedRows(dir: String): Long = {
      val df = spark.read.parquet(dir)
        .filter(col("user_id") >= uLo && col("user_id") <= uHi)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
    }
    val zRows = decodedRows(zDir)
    val tsRows = decodedRows(tsDir)
    assert(zRows * 2 <= tsRows,
      s"z layout decoded $zRows rows vs $tsRows time-sorted — expected at least 2× skipping")
  }
}
