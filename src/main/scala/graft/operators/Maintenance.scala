package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Table-maintenance operators — the OPTIMIZE half of a lakehouse
  * pipeline. Streaming ingest ([[graft.streaming.Streaming]]'s st8 upsert
  * sink, the d5 incremental band index) lands many small files per
  * micro-batch; at 100 TB the resulting file-count explosion, not data
  * volume, is what kills scan throughput (driver-side split enumeration,
  * one short-lived task per tiny file, dead columnar compression).
  * Compaction rewrites a fragmented directory into files sized for the
  * scan path and is idempotent — re-running on a compacted table is a
  * no-op rewrite to the same file count.
  */
object Maintenance {

  /** Result of one [[compact]] run — enough to decide whether the
    * rewrite was worth it and to log the maintenance action.
    */
  final case class CompactStats(
    filesBefore: Long, bytesBefore: Long, filesAfter: Long, rows: Long)

  /** Compact a parquet directory in place: read, repartition to
    * `ceil(bytes / targetFileBytes)` output files, write to a staging
    * dir, then swap. Content is preserved exactly (the spec and the
    * `q_compact` oracle both assert it); only the file layout changes.
    *
    * Scale notes:
    *  - The file count derives from observed BYTES, not rows — parquet
    *    size per row varies wildly with schema and encoding, and the
    *    scan path cares about bytes per split.
    *  - `repartition` (round-robin shuffle), not `coalesce`: coalesce
    *    glues existing partitions without rebalancing, so one output
    *    file inherits any skew in the small-file layout; the one
    *    extra shuffle buys evenly sized output files, which is the
    *    point of the rewrite. This matches what production OPTIMIZE
    *    implementations do.
    *  - On a partitioned table you'd run this per fragmented PARTITION
    *    (selected by file-count threshold from the listing) and swap via
    *    dynamic partition overwrite ([[graft.sinks.Sinks
    *    .overwritePartitions]]) so healthy partitions are never
    *    rewritten. The swap here is two renames on the table root —
    *    the whole-directory analogue.
    *  - The staging dir lives NEXT TO the table (same filesystem), so
    *    the swap renames never copy data across filesystems.
    */
  def compact(spark: SparkSession, tableDir: String,
              targetFileBytes: Long): CompactStats = {
    val path = new Path(tableDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path).filter { st =>
      st.isFile && !st.getPath.getName.startsWith("_")
    }
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(tableDir)
    val staging = new Path(path.getParent, path.getName + "._compact_staging")
    fs.delete(staging, true)
    df.repartition(nOut).write.parquet(staging.toString)
    val rows = spark.read.parquet(staging.toString).count()
    // Swap: move the old layout aside, promote staging, drop the old.
    // A crash between the two renames leaves either the old table or
    // the staged one plus a .old dir — both states re-read correctly
    // and a re-run cleans up; no state loses rows.
    val old = new Path(path.getParent, path.getName + "._compact_old")
    fs.delete(old, true)
    fs.rename(path, old)
    fs.rename(staging, path)
    fs.delete(old, true)
    val after = fs.listStatus(path).count { st =>
      st.isFile && !st.getPath.getName.startsWith("_")
    }
    CompactStats(files.length.toLong, bytes, after.toLong, rows)
  }

  /** `q_compact`: fragment the orders table into 64 small files (the
    * post-ingest state), compact to ~8 MiB targets, and return the
    * compacted table — the oracle twin reads the SAME rows straight from
    * the source, proving the rewrite preserved content exactly.
    */
  def qCompact(spark: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("graft_compact")
    scratch.toFile.deleteOnExit()
    val table = s"$scratch/orders"
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      .repartition(64)
      .write.mode("overwrite").parquet(table)
    compact(spark, table, targetFileBytes = 8L * 1024 * 1024)
    spark.read.parquet(table)
  }
}
