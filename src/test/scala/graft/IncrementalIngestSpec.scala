package graft

import org.apache.spark.sql.functions._

import graft.operators.LlmOps

/** The d5 production path: a materialized, bucketed corpus index
  * ([[LlmOps.buildCorpusIndex]]) plus per-batch incremental dedup against
  * it ([[LlmOps.d5IncrementalAgainstIndex]]).
  *
  * Checks:
  *  1. the index path returns EXACTLY the rows of the full-recompute
  *     query ([[LlmOps.d5DedupIncremental]]) on the same corpus;
  *  2. the candidate band join against the stored index does NOT
  *     re-shuffle the corpus side (the bucketed layout is the 100 TB
  *     point of the materialization).
  */
class IncrementalIngestSpec extends SparkTestBase {

  test("incremental dedup against the materialized index matches full recompute") {
    LlmOps.buildCorpusIndex(spark, Sf, "ingest_idx")
    val viaIndex = LlmOps.d5IncrementalAgainstIndex(spark, Sf, "ingest_idx")
    val recompute = LlmOps.d5DedupIncremental(spark, Sf)
    assert(viaIndex.columns.toSeq === recompute.columns.toSeq)
    assert(viaIndex.exceptAll(recompute).count() === 0)
    assert(recompute.exceptAll(viaIndex).count() === 0)
    // The fixture plants at least one cross-source near-dup; an empty
    // result would vacuously pass the set compares above.
    assert(viaIndex.count() > 0)
  }

  test("the corpus side of the band join is read bucketed, not re-shuffled") {
    LlmOps.buildCorpusIndex(spark, Sf, "ingest_idx_plan")
    val batchBands = spark.table("ingest_idx_plan_bands")
      .groupBy("bkey").agg(min("doc_id").as("probe_doc"))
    val joined = spark.table("ingest_idx_plan_bands").join(batchBands, "bkey")
    joined.count()
    // One Exchange is fine (the probe side); the stored-bands scan itself
    // must not sit under a hashpartitioning exchange.
    val plan = joined.queryExecution.executedPlan.toString
    val scanSide = plan.split("\n").zipWithIndex
      .filter(_._1.contains("Scan parquet"))
    assert(scanSide.nonEmpty)
    assert(plan.contains("Bucketed: true"),
      s"stored bands should be read through their bucket layout; plan:\n$plan")
  }
}
