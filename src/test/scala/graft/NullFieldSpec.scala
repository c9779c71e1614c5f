package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.{LlmOps, Multimodal, Similarity}

/** Null-field robustness: a 100 TB corpus always contains rows with null
  * text / null embeddings (failed extractions, schema drift). Every
  * operator must treat such rows as absent-or-null — never throw.
  */
class NullFieldSpec extends SparkTestBase {

  private lazy val nullDir: String = {
    val dir = tempDir("null_fields")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val docs = Seq(
      Row(0L, "the quick brown fox jumps over the lazy dog today", "en", "src0", 49L),
      Row(1L, null, null, "src1", null),
      Row(2L, "one two three four five six seven eight nine ten", "en", "src1", 48L))
    spark.createDataFrame(spark.sparkContext.parallelize(docs), docSchema)
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val embs = Seq(
      Row(0L, Seq(0.5f, -0.2f, 0.8f, 0.1f), 0),
      Row(1L, null, 0),
      Row(2L, Seq(1.0f, -0.4f, 1.6f, 0.2f), 1))
    spark.createDataFrame(spark.sparkContext.parallelize(embs), embSchema)
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("document operators tolerate a null-text row") {
    // Must not throw; the null row contributes no shingles/tokens.
    LlmOps.d1DedupExact(spark, nullDir).count()
    LlmOps.d2DedupMinhash(spark, nullDir).count()
    LlmOps.d3Simhash(spark, nullDir).count()
    LlmOps.d4NgramJaccard(spark, nullDir).count()
    LlmOps.d7DedupResolve(spark, nullDir).count()
    LlmOps.t1TextStats(spark, nullDir).count()
    LlmOps.t4Fingerprint(spark, nullDir).count()
    LlmOps.t6PiiScrub(spark, nullDir).count()
    LlmOps.t9Repetition(spark, nullDir).count()
    LlmOps.t10MixtureSample(spark, nullDir).count()
    LlmOps.t11Decontaminate(spark, nullDir).count()
    Multimodal.m1MediaMeta(spark, nullDir).count()
    Multimodal.m2FrameSample(spark, nullDir).count()
  }

  test("round-5 operators tolerate null text and null event fields") {
    // Null text: contributes no tokens/chunks/terms; must not throw.
    LlmOps.t14PackSequences(spark, nullDir).count()
    LlmOps.t15Chunk(spark, nullDir).count()
    LlmOps.t16TfIdf(spark, nullDir).count()
    // Events with null ts / user_id / value / event_type.
    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val base = 1704067200000000000L // 2024-01-01 in ns
    val evs = Seq(
      Row(0L, base, 1L, "click", 1.5, null),
      Row(1L, base + 3600L * 1000000000L, 1L, null, null, null),
      Row(2L, null, 2L, "click", -0.5, null),
      Row(3L, base + 2L * 3600 * 1000000000L, null, "error", 2.0, null),
      // User 1 continues past the NULL-typed event: view and purchase
      // give them 3 real events STRADDLING the null — the case where a
      // lag that didn't skip nulls would fabricate a shrunken pattern.
      Row(4L, base + 2L * 3600 * 1000000000L, 1L, "view", 1.0, null),
      Row(5L, base + 3L * 3600 * 1000000000L, 1L, "purchase", 9.0, null))
    spark.createDataFrame(spark.sparkContext.parallelize(evs), evSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$nullDir/events.parquet")
    graft.operators.Relational.w7Sessionize(spark, nullDir).count()
    graft.operators.Relational.qScd2(spark, nullDir).count()
    graft.operators.Relational.qRangeJoin(spark, nullDir).count()
    graft.operators.Relational.a11Histogram(spark, nullDir).count()
    // Trigram mining: the NULL-typed event is ABSENT from the sequence
    // (never a shrunken concat_ws pattern), so no pattern may mention it
    // and no pattern may have fewer than three elements.
    val pats = graft.operators.Relational.qEventNgrams(spark, nullDir)
      .collect().map(_.getString(0))
    assert(pats.toSeq === Seq("click > view > purchase"),
      s"expected the null-straddling trigram only, got ${pats.mkString("; ")}")
  }

  test("similarity operators tolerate a null-embedding row") {
    Similarity.simTopk(spark, nullDir).count()
    Similarity.simLshPairs(spark, nullDir).count()
    Similarity.simQuantizeQ8(spark, nullDir).count()
    Similarity.d8EmbedNeardup(spark, nullDir).count()
  }
}
