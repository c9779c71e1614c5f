package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Sessions, SparkEntry, Tables}

/** Scratch profiler for the dedup family: times whole queries cold plus
  * the d4 sub-stages, so optimization targets the measured bottleneck.
  * Round-3 findings this tool produced (kept for future rounds):
  *  - interpreted lambda-HOF generators (posexplode over transform(...))
  *    ran ~54 ms/row and stalled sibling tasks JVM-wide → rewritten as
  *    plain projections / array generators (LlmOps.minhashBandsOf, d6);
  *  - persist() does not flatten lineage: the CC loop re-analyzed d2's
  *    full plan tree every round (110 s round 1 vs 2 s round 2) →
  *    localCheckpoint before iterating;
  *  - AQE parallelismFirst=true ran 32 one-record reduce tasks per tiny
  *    stage → size-based coalescing in Sessions.
  * Not part of the library surface.
  */
object ProfileDedup {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.operators.LlmOps

    Tables.documents(spark, dir).count() // warm
    def reset(): Unit = { spark.catalog.clearCache(); System.gc() }

    // d4 sub-stages (mirrors the CURRENT LlmOps.d4NgramJaccard — the
    // relational shingle-row join formulation).
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    val shingles = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(expr("split(text, ' ')")).as(Seq("pos", "tok")))
      .withColumn("n1", lead("tok", 1).over(w))
      .withColumn("n2", lead("tok", 2).over(w))
      .filter(col("n2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("n1"), col("n2")).as("shingle"))
    time("d4: shingle rows raw")(shingles.count())
    val meta = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), expr("n_chars div 100").as("len_bucket"))
    val rows = shingles.distinct().join(meta, "doc_id").persist()
    time("d4: rows distinct+persist")(rows.count())
    val sizes = rows.groupBy("doc_id").agg(count("*").as("nsh"))
    val inter = rows.toDF("doc_a", "shingle", "source", "len_bucket")
      .join(rows.toDF("doc_b", "shingle", "source", "len_bucket"),
        Seq("source", "len_bucket", "shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("source", "doc_a", "doc_b")
      .agg(count("*").as("i"))
    time("d4: self-join group-count")(inter.count())
    time("d4: + sizes joins")(
      inter.join(sizes.toDF("doc_a", "na"), "doc_a")
        .join(sizes.toDF("doc_b", "nb"), "doc_b")
        .select(col("source"), col("doc_a"), col("doc_b"),
          expr("(2000 * (i) + (na + nb - i)) div (2 * (na + nb - i))").as("jaccard_milli"))
        .filter(col("jaccard_milli") > 0)
        .count())
    reset()

    time("d2 full")(LlmOps.d2DedupMinhash(spark, dir).count())
    reset()
    time("d4 full")(LlmOps.d4NgramJaccard(spark, dir).count())
    reset()
    time("d5 full")(LlmOps.d5DedupIncremental(spark, dir).count())
    reset()
    time("d6 full")(LlmOps.d6SimhashNeardup(spark, dir).count())
    reset()
    time("d7 full")(LlmOps.d7DedupResolve(spark, dir).count())
    reset()
    time("q_kmeans")(SparkEntry.queries("q_kmeans")(spark, dir).count())
    graft.PersistScope.releaseAll(); reset()
    time("q_pagerank")(SparkEntry.queries("q_pagerank")(spark, dir).count())
    graft.PersistScope.releaseAll(); reset()
    time("st4_stream_join")(SparkEntry.queries("st4_stream_join")(spark, dir).count())
    spark.stop()
  }
}
