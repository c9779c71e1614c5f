package graft.tools

import graft.{PersistScope, Sessions}
import graft.operators.LlmOps

/** Scratch comparison: d5's full-recompute incremental dedup vs d5b's
  * materialized-index ingest, same corpus, alternating reps. The index
  * build (the once-per-snapshot setup job) is timed separately so the
  * amortization math is visible: build once + N cheap ingests vs N full
  * recomputes.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def cool(): Unit = { PersistScope.releaseAll(); spark.catalog.clearCache() }
    // Warm codegen/readers on the recompute path.
    LlmOps.d5DedupIncremental(spark, dir).count(); cool()
    val build = time { LlmOps.buildCorpusIndex(spark, dir, "ingestbench_idx"); 0L }
    val reps = 5
    val recompute = (1 to reps).map { _ =>
      val t = time(LlmOps.d5DedupIncremental(spark, dir).count()); cool(); t
    }
    val indexed = (1 to reps).map { _ =>
      val t = time(LlmOps.d5IncrementalAgainstIndex(spark, dir, "ingestbench_idx").count()); cool(); t
    }
    println(f"INGEST index build (once/snapshot) = $build%.3f s")
    println(f"INGEST d5 recompute med=${recompute.sorted.apply(reps / 2)}%.3f all=${recompute.map(t => f"$t%.3f").mkString(",")}")
    println(f"INGEST d5b indexed  med=${indexed.sorted.apply(reps / 2)}%.3f all=${indexed.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
