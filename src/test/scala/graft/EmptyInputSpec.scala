package graft

import org.apache.spark.sql.types._

import graft.operators.{LlmOps, Multimodal, Similarity}

/** Degenerate-input robustness: every documents/embeddings operator must
  * return an empty result — never throw — on an empty table. (A 100 TB
  * pipeline routinely hits empty partitions, empty ingest batches, and
  * filters that eliminate everything.)
  */
class EmptyInputSpec extends SparkTestBase {

  private lazy val emptyDir: String = {
    val dir = tempDir("empty_tables")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], docSchema)
      .write.parquet(s"$dir/documents.parquet")
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], embSchema)
      .write.parquet(s"$dir/embeddings.parquet")
    // events.ts is written as LongType: Tables.events reads raw nanos
    // (nanosAsLong session) and truncates to micros itself.
    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], evSchema)
      .write.parquet(s"$dir/events.parquet")
    val custSchema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], custSchema)
      .write.parquet(s"$dir/customer.parquet")
    val ordSchema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampNTZType), StructField("o_orderpriority", StringType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ordSchema)
      .write.parquet(s"$dir/orders.parquet")
    val liSchema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampNTZType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], liSchema)
      .write.parquet(s"$dir/lineitem.parquet")
    val suppSchema = StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], suppSchema)
      .write.parquet(s"$dir/supplier.parquet")
    val partSchema = StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_type", StringType),
      StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], partSchema)
      .write.parquet(s"$dir/part.parquet")
    val natSchema = StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], natSchema)
      .write.parquet(s"$dir/nation.parquet")
    val regSchema = StructType(Seq(
      StructField("r_regionkey", IntegerType), StructField("r_name", StringType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], regSchema)
      .write.parquet(s"$dir/region.parquet")
    dir
  }

  test("round-5 operators return empty on an empty corpus") {
    assert(LlmOps.t14PackSequences(spark, emptyDir).count() === 0)
    assert(LlmOps.t15Chunk(spark, emptyDir).count() === 0)
    assert(LlmOps.t16TfIdf(spark, emptyDir).count() === 0)
    assert(graft.operators.Relational.w7Sessionize(spark, emptyDir).count() === 0)
    assert(graft.operators.Relational.qScd2(spark, emptyDir).count() === 0)
    // Empty events → NULL min/max bounds → null-rejecting containment:
    // the bucketed range join must yield zero rows, not throw.
    assert(graft.operators.Relational.qRangeJoin(spark, emptyDir).count() === 0)
  }

  test("round-5b operators survive empty inputs") {
    import org.apache.spark.sql.functions.col
    assert(LlmOps.t17InvertedIndex(spark, emptyDir).count() === 0)
    assert(LlmOps.t18CdcChunks(spark, emptyDir).count() === 0)
    assert(Similarity.simPqTopk(spark, emptyDir).count() === 0)
    // Empty old side = first-ever ingest: everything classifies as added.
    val some = spark.range(3).toDF("k").withColumn("v", col("k") * 10)
    val none = some.filter(col("k") < 0)
    val d = graft.operators.Delta.snapshotDiff(none, some, Seq("k"), Seq("v"))
    assert(d.count() === 3)
    assert(d.filter(col("change_type") === "added").count() === 3)
    // Skew profile over zero rows: one row, zero keys, null stats — a
    // monitoring caller must never crash on an empty partition's profile.
    val prof = graft.operators.Scale.skewProfile(none, "k").collect().head
    assert(prof.getAs[Long]("n_keys") === 0L)
    assert(prof.isNullAt(prof.fieldIndex("skew_milli")))
  }

  test("round-6 operators survive empty inputs") {
    // Sorted neighborhood over zero customers: two sorts, zero pairs.
    assert(graft.operators.Relational.qFuzzyMatchName(spark, emptyDir).count() === 0)
    // Interval join over zero orders on both sides.
    assert(graft.operators.Relational.qIntervalJoin(spark, emptyDir).count() === 0)
    // SCD2 merge of an empty snapshot into an empty dimension.
    assert(graft.operators.Delta.qScd2Merge(spark, emptyDir).count() === 0)
    // Index ingest: builds an (empty) corpus index, joins nothing.
    assert(LlmOps.d5bIndexIngest(spark, emptyDir).count() === 0)
    // PPM family: zero documents → zero images; the P6 construction and
    // header parse never see a row.
    assert(Multimodal.m3Resize(spark, emptyDir).count() === 0)
    assert(graft.operators.Relational.f15Variant(spark, emptyDir).count() === 0)
    assert(LlmOps.t19DupSpans(spark, emptyDir).count() === 0)
    assert(Multimodal.m4AudioMeta(spark, emptyDir).count() === 0)
  }

  test("round-7 operators survive empty inputs") {
    // Sketch over zero bigrams: the Misra-Gries summary is an empty
    // map, the candidate explode emits nothing, the recount is empty.
    assert(LlmOps.t20HeavyHitters(spark, emptyDir).count() === 0)
    // BM25 over zero documents: corpus scalars divide by zero into
    // NULLs, but no scored row exists to carry them.
    assert(LlmOps.t21Bm25(spark, emptyDir).count() === 0)
    // k-means: zero vectors → zero initial centroids → empty
    // assignment each iteration; must converge to nothing, not throw.
    assert(Similarity.qKmeansCluster(spark, emptyDir).count() === 0)
    // PageRank: an empty purchase graph has no nodes; the node-count
    // broadcast is zero and no rank row exists to divide.
    assert(graft.operators.Graph.qPagerank(spark, emptyDir).count() === 0)
    // EWMA: no users, no folds.
    assert(graft.operators.Relational.w9Ewma(spark, emptyDir).count() === 0)
    // phash: zero documents → zero images to hash.
    assert(Multimodal.m5ImagePhash(spark, emptyDir).count() === 0)
    // Bounded-heap sampling over zero groups.
    assert(LlmOps.t22GroupSample(spark, emptyDir).count() === 0)
  }

  test("round-7b operators survive empty inputs") {
    import graft.operators.{Graph, Relational, Tpch}
    // Novelty: zero documents → zero bigrams, zero frequent head.
    assert(LlmOps.t23RareBigrams(spark, emptyDir).count() === 0)
    // Prefix join: zero shingle rows → zero prefixes → zero candidates.
    assert(LlmOps.d9PrefixJoin(spark, emptyDir).count() === 0)
    // Winsorize: no orders, no groups, no bounds, no rows.
    assert(Relational.qWinsorize(spark, emptyDir).count() === 0)
    // Event n-grams: no events, no windows, no patterns.
    assert(Relational.qEventNgrams(spark, emptyDir).count() === 0)
    // Triangles: the three count aggregates each yield one zero row,
    // cross-joined into a single (0, 0, 0) summary — never a throw.
    val tri = Graph.qTriangles(spark, emptyDir).collect()
    assert(tri.length === 1 &&
      (0 to 2).forall(i => tri.head.getLong(i) === 0L))
    // Sketch-merge: no events, no day sketches, no weeks.
    assert(Relational.a14HllMerge(spark, emptyDir).count() === 0)
    // TPC-H representatives over the all-empty star schema: the
    // correlated-MIN, LEFT-JOIN-distribution, and NULL-scalar-threshold
    // shapes all collapse to empty without errors.
    assert(Tpch.q2(spark, emptyDir).count() === 0)
    assert(Tpch.q13(spark, emptyDir).count() === 0)
    assert(Tpch.q22(spark, emptyDir).count() === 0)
    assert(Tpch.q21(spark, emptyDir).count() === 0)
  }

  test("round-8 operators survive empty inputs") {
    // Pruned LM: zero bigrams → empty model → empty broadcast → no rows.
    assert(LlmOps.t27BigramTopk(spark, emptyDir).count() === 0)
    // TTL-state stream: an empty events file still forms one (empty)
    // Trigger.Once batch; no key, no state, no output row.
    assert(graft.streaming.Streaming.st13TtlState(spark, emptyDir).count() === 0)
    // Recursive closure: the seed row exists even over an empty graph —
    // the frontier dies at hop 1 and only (4, 0) survives.
    val rc = graft.operators.Graph.qRecClosure(spark, emptyDir).collect()
    assert(rc.length === 1 && rc.head.getLong(0) === 4L && rc.head.getLong(1) === 0L)
  }

  test("document operators return empty on an empty corpus") {
    assert(LlmOps.d1DedupExact(spark, emptyDir).count() === 0)
    assert(LlmOps.d2DedupMinhash(spark, emptyDir).count() === 0)
    assert(LlmOps.d3Simhash(spark, emptyDir).count() === 0)
    assert(LlmOps.d4NgramJaccard(spark, emptyDir).count() === 0)
    assert(LlmOps.d5DedupIncremental(spark, emptyDir).count() === 0)
    assert(LlmOps.d6SimhashNeardup(spark, emptyDir).count() === 0)
    assert(LlmOps.d7DedupResolve(spark, emptyDir).count() === 0)
    assert(LlmOps.t1TextStats(spark, emptyDir).count() === 0)
    assert(LlmOps.t5TokenEstimate(spark, emptyDir).count() === 0)
    assert(LlmOps.t7TokenFreq(spark, emptyDir).count() === 0)
    assert(LlmOps.t8HashSplit(spark, emptyDir).count() === 0)
    assert(LlmOps.t9Repetition(spark, emptyDir).count() === 0)
    assert(LlmOps.t10MixtureSample(spark, emptyDir).count() === 0)
    assert(LlmOps.t11Decontaminate(spark, emptyDir).count() === 0)
    assert(LlmOps.t12Stopwords(spark, emptyDir).count() === 0)
    assert(LlmOps.t13RollingFp(spark, emptyDir).count() === 0)
    assert(LlmOps.curationManifest(spark, emptyDir).count() === 0)
    assert(Multimodal.m1MediaMeta(spark, emptyDir).count() === 0)
    assert(Multimodal.m2FrameSample(spark, emptyDir).count() === 0)
  }

  test("similarity operators return empty on an empty corpus") {
    assert(Similarity.simTopk(spark, emptyDir).count() === 0)
    assert(Similarity.simLshPairs(spark, emptyDir).count() === 0)
    assert(Similarity.simIvfTopk(spark, emptyDir).count() === 0)
    assert(Similarity.simQuantizeQ8(spark, emptyDir).count() === 0)
    assert(Similarity.d8EmbedNeardup(spark, emptyDir).count() === 0)
  }

  test("an empty table satisfies every data-quality constraint") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", LongType), StructField("v", DoubleType))))
    val verdicts = graft.operators.Validation.checkConstraints(
        empty, Seq("neg_v" -> "v < 0"), uniqueKey = Some("id"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    // Zero rows → zero violations → pass, for predicate AND uniqueness
    // rules alike (pre-fix, sum() over no rows was NULL → pass = 0).
    assert(verdicts === Map("neg_v" -> ((0L, 1)), "dup_id" -> ((0L, 1))))
  }
}
