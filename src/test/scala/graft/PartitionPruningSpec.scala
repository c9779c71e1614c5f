package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.sinks.Sinks

/** Partition pruning over a partitioned write: at 100 TB the directory
  * layout IS the coarse index — a filter on the partition column must
  * reach the scan as a PartitionFilter and the executed scan must touch
  * ONLY the files under the matching partition directories, never
  * list-and-skip the rest. (Dataset.inputFiles can't show this: it
  * lists the whole relation pre-pruning; the scan's numFiles metric is
  * the ground truth.)
  */
class PartitionPruningSpec extends SparkTestBase {

  private def filesUnder(dir: String): Long = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .count(p => p.getFileName.toString.startsWith("part-"))
  }

  test("a partition-column filter reads only the matching partition directory") {
    val out = tempDir("pruned_docs")
    Sinks.writeParquet(Tables.documents(spark, Sf), out, Seq("source"))
    val pruned = spark.read.parquet(out).filter(col("source") === "src0")
    val expected = Tables.documents(spark, Sf)
      .filter(col("source") === "src0").count()
    assert(pruned.count() === expected)

    pruned.collect() // finalize THIS df's adaptive plan and its metrics
    val finalPlan = pruned.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = finalPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }
    assert(scan.isDefined, s"no FileSourceScanExec in:\n$finalPlan")
    assert(scan.get.toString.contains("PartitionFilters: [isnotnull(source"),
      "filter must prune at partition-metadata level, not post-scan")
    val readFiles = scan.get.metrics("numFiles").value
    assert(readFiles === filesUnder(s"$out/source=src0"),
      s"scan read $readFiles files, src0 partition holds ${filesUnder(s"$out/source=src0")}")
    assert(readFiles < filesUnder(out),
      "pruned scan must read strictly fewer files than the full table")
  }
}
