package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Delta, Graph, LlmOps, Multimodal, Relational, Scale, Similarity, Tpch}
import graft.streaming.Streaming

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 appears as a named query
  * here, paired (where ANSI-SQL-expressible) with an equivalent DuckDB
  * oracle query over the same parquet tables. Column names and types are
  * aligned on both sides because the driver's comparator sorts columns by
  * name before hashing values.
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.2) on /root/testdata/sf0.001; driver
    * smoke-checks rows>0. Exercises filter → 3 joins → derive → agg →
    * validate → project in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.flagship(spark, "/root/testdata/sf0.001")

  type Query = (SparkSession, String) => DataFrame

  private val relationalQueries: Map[String, Query] = Map(
    "s1_scan_project"      -> Relational.s1ScanProject _,
    "s4_filtered_scan"     -> Relational.s4FilteredScan _,
    "p1_contains_filter"   -> Relational.p1ContainsFilter _,
    "p2_projection"        -> Relational.p2Projection _,
    "p4_pick_first"        -> Relational.p4PickFirst _,
    "j1_dim_join"          -> Relational.j1DimJoin _,
    "j2_fact_join"         -> Relational.j2FactJoin _,
    "j3_left_join_default" -> Relational.j3LeftJoinDefault _,
    "j5_validate_counts"   -> Relational.j5ValidateCounts _,
    "j6_semi_join"         -> Relational.j6SemiJoin _,
    "j7_anti_join"         -> Relational.jAntiJoin _,
    "a1_group_count"       -> Relational.a1GroupCount _,
    "a2_group_agg"         -> Relational.a2GroupAgg _,
    "a3_count_distinct"    -> Relational.a3CountDistinct _,
    "a4_rollup"            -> Relational.a4Rollup _,
    "a5_cube"              -> Relational.a5Cube _,
    "a6_approx_distinct"   -> Relational.aApproxDistinct _,
    "w1_topk_per_group"    -> Relational.w1TopkPerGroup _,
    "w2_running_total"     -> Relational.w2RunningTotal _,
    "w3_lag_lead"          -> Relational.w3LagLead _,
    "w4_range_frame"       -> Relational.w4RangeFrame _,
    "w5_rank_family"       -> Relational.w5RankFamily _,
    "w6_first_last"        -> Relational.w6FirstLast _,
    "w7_sessionize"        -> Relational.w7Sessionize _,
    "q_range_join"         -> Relational.qRangeJoin _,
    "q_interval_join"      -> Relational.qIntervalJoin _,
    "q_tpch_q3"            -> Relational.qTpchQ3 _,
    "q_tpch_q5"            -> Relational.qTpchQ5 _,
    "q_funnel"             -> Relational.qFunnel _,
    "q_retention"          -> Relational.qRetention _,
    "q_mad_outliers"       -> Relational.qMadOutliers _,
    "q_scd2"               -> Relational.qScd2 _,
    "f11_collect"          -> Relational.f11Collect _,
    "a11_histogram"        -> Relational.a11Histogram _,
    // a12: intentionally NO oracle entry — sketch percentiles are
    // engine-specific; ApproxDistinctSpec bounds them against exact
    // percentiles (a6's contract).
    "a12_approx_percentile" -> Relational.a12ApproxPercentile _,
    "a14_hll_merge"        -> Relational.a14HllMerge _,
    "q_winsorize"          -> Relational.qWinsorize _,
    "q_event_ngrams"       -> Relational.qEventNgrams _,
    "q_global_rownum"      -> Relational.qGlobalRownum _,
    "f12_conditional_agg"  -> Relational.f12ConditionalAgg _,
    "q_scalar_subquery"    -> Relational.qScalarSubquery _,
    "q_correlated_scalar"  -> Relational.qCorrelatedScalar _,
    "a7_grouping_sets"     -> Relational.a7GroupingSets _,
    "a8_pivot"             -> Relational.a8Pivot _,
    "a10_percentile"       -> Relational.a10Percentile _,
    "a9_unpivot"           -> Relational.a9Unpivot _,
    "k5_slice"             -> Relational.k5Slice _,
    "q_topk_global"        -> Relational.topkGlobal _,
    "set_union"            -> Relational.setUnion _,
    "set_intersect"        -> Relational.setIntersect _,
    "set_except"           -> Relational.setExcept _,
    "f1_age_label"         -> Relational.f1AgeLabel _,
    "f2_grade_label"       -> Relational.f2GradeLabel _,
    "f6_json_extract"      -> Relational.f6JsonExtract _,
    "f7_from_json"         -> Relational.f7FromJson _,
    "f8_datetime"          -> Relational.f8Datetime _,
    "f9_strings"           -> Relational.f9Strings _,
    "s5_parse_source"      -> Relational.s5ParseSource _,
    "f10_arrays"           -> Relational.f10Arrays _,
    // S1's real form: the DSv2 paginated source (pages = partitions); the
    // deterministic offline fetcher makes it oracle-checkable arithmetic.
    "s6_paginated_rest"    -> ((s: SparkSession, _: String) =>
      s.read.format("paginated").option("pages", 12).option("pageSize", 25).load()
        .groupBy((org.apache.spark.sql.functions.col("list_id") % 4).as("grp"))
        .agg(
          org.apache.spark.sql.functions.count("*").as("n_lists"),
          org.apache.spark.sql.functions.sum("n_members").as("total_members"))),
    "p7_rename_lookup"     -> Relational.p7RenameLookup _,
    "j4_pick_first_supplier" -> Relational.j4PickFirstSupplier _,
    "j8_full_outer"        -> Relational.j8FullOuter _,
    "j9_salted_join"       -> Relational.j9SaltedJoin _,
    "q_asof_join"          -> Relational.qAsofJoin _,
    "q_asof_native"        -> Relational.qAsofNative _,
    "q_flagship"           -> Relational.flagship _,
    "q_snapshot_diff"      -> Delta.qSnapshotDiff _,
    "q_scd2_merge"         -> Delta.qScd2Merge _,
    "q_table_checksum"     -> Delta.qTableChecksum _,
    "q_compact"            -> Scale.qCompact _,
    "q_incremental_rollup" -> Scale.qIncrementalRollup _,
    "q_fuzzy_match"        -> Relational.qFuzzyMatch _,
    "q_fuzzy_match_name"   -> Relational.qFuzzyMatchName _,
    "f14_regex"            -> Relational.f14Regex _,
    "f15_variant"          -> Relational.f15Variant _,
    "q_gap_fill"           -> Relational.qGapFill _,
    "f13_maps"             -> Relational.f13Maps _,
    // The pre-flight join diagnostic, run on the orders fact's key.
    "q_skew_profile"       -> ((s: SparkSession, dir: String) =>
      Scale.skewProfile(graft.Tables.orders(s, dir), "o_custkey")),
    "q_data_quality"       -> ((s: SparkSession, dir: String) =>
      graft.operators.Validation.checkConstraints(
        graft.Tables.orders(s, dir),
        Seq(
          "null_custkey"      -> "o_custkey is null",
          "nonpositive_price" -> "o_totalprice <= 0",
          "bad_status"        -> "o_orderstatus not in ('F', 'O', 'P')"),
        uniqueKey = Some("o_orderkey"))),
    "q_tpch_q1"            -> Relational.qTpchQ1 _,
    "q_tpch_q6"            -> Relational.qTpchQ6 _,
    "q_tpch_q4"            -> Relational.qTpchQ4 _,
    "q_tpch_q10"           -> Relational.qTpchQ10 _,
    "q_tpch_q18"           -> Relational.qTpchQ18 _,
    "q_pagerank"           -> Graph.qPagerank _,
    "q_funnel_steps"       -> Relational.qFunnelSteps _,
    "q_rec_closure"        -> Graph.qRecClosure _,
    "q_tpch_q12"           -> Relational.qTpchQ12 _,
    "q_tpch_q14"           -> Relational.qTpchQ14 _,
    "j10_bloom_prejoin"    -> Relational.j10BloomPrejoin _,
    "w8_running_distinct"  -> Relational.w8RunningDistinct _,
    "w9_ewma"              -> Relational.w9Ewma _,
    "a13_mode"             -> Relational.a13Mode _,
    "q_group_regression"   -> Relational.qGroupRegression _,
    "f16_hof"              -> Relational.f16Hof _,
    "q_tpch_q2"            -> Tpch.q2 _,
    "q_tpch_q7"            -> Tpch.q7 _,
    "q_tpch_q8"            -> Tpch.q8 _,
    "q_tpch_q9"            -> Tpch.q9 _,
    "q_tpch_q11"           -> Tpch.q11 _,
    "q_tpch_q13"           -> Tpch.q13 _,
    "q_tpch_q15"           -> Tpch.q15 _,
    "q_tpch_q16"           -> Tpch.q16 _,
    "q_tpch_q17"           -> Tpch.q17 _,
    "q_tpch_q19"           -> Tpch.q19 _,
    "q_tpch_q20"           -> Tpch.q20 _,
    "q_tpch_q21"           -> Tpch.q21 _,
    "q_tpch_q22"           -> Tpch.q22 _,
    "q_triangles"          -> Graph.qTriangles _,
    "q_triangles_idx"      -> Graph.qTrianglesIndexed _,
    "q_triangles_adj"      -> Graph.qTrianglesAdj _,
    "q_triangles_adj_idx"  -> Graph.qTrianglesAdjIdx _,
    "q_triangles_adj_ingest" -> Graph.qTrianglesAdjIngest _,
  )

  private val llmQueries: Map[String, Query] = Map(
    "d1_dedup_exact"   -> LlmOps.d1DedupExact _,
    "d2_dedup_minhash" -> LlmOps.d2DedupMinhash _,
    "d3_simhash"       -> LlmOps.d3Simhash _,
    "d4_ngram_jaccard" -> LlmOps.d4NgramJaccard _,
    "d5_dedup_incremental" -> LlmOps.d5DedupIncremental _,
    "d5b_index_ingest"     -> LlmOps.d5bIndexIngest _,
    "d6_simhash_neardup" -> LlmOps.d6SimhashNeardup _,
    "d9_prefix_join"   -> LlmOps.d9PrefixJoin _,
    "d9b_prefix_guarded" -> LlmOps.d9bPrefixGuarded _,
    "d9_degree_stats"  -> LlmOps.d9DegreeStats _,
    "d10_norm_dedup"   -> LlmOps.d10NormDedup _,
    "d10b_nfc_dedup"   -> LlmOps.d10bNfcDedup _,
    "d11_band_stats"   -> LlmOps.d11BandStats _,
    "d7_dedup_resolve" -> LlmOps.d7DedupResolve _,
    "d7b_resolve_idx"  -> LlmOps.d7bResolveIdx _,
    "d7c_resolve_ingest" -> LlmOps.d7cResolveIngest _,
    "d12_quality_resolve" -> LlmOps.d12QualityResolve _,
    "d12b_quality_idx" -> LlmOps.d12bQualityIdx _,
    "d13_group_split"  -> LlmOps.d13GroupSplit _,
    "d13b_split_idx"   -> LlmOps.d13bSplitIdx _,
    "q_curation_neardup_idx" -> LlmOps.curationNeardupIdx _,
    "q_curation_coverage" -> LlmOps.curationCoverageManifest _,
    "t1_text_stats"    -> LlmOps.t1TextStats _,
    "t2_lang_id"       -> LlmOps.t2LangId _,
    "t3_quality_score" -> LlmOps.t3QualityScore _,
    "t4_fingerprint"   -> LlmOps.t4Fingerprint _,
    "t5_token_estimate" -> LlmOps.t5TokenEstimate _,
    "t6_pii_scrub"     -> LlmOps.t6PiiScrub _,
    "t7_token_freq"    -> LlmOps.t7TokenFreq _,
    "t8_hash_split"    -> LlmOps.t8HashSplit _,
    "t9_repetition"    -> LlmOps.t9Repetition _,
    "t10_mixture_sample" -> LlmOps.t10MixtureSample _,
    "t11_decontaminate" -> LlmOps.t11Decontaminate _,
    "q_curation_pipeline" -> LlmOps.curationManifest _,
    "q_curation_neardup"  -> LlmOps.curationNeardupManifest _,
    "t12_stopwords"    -> LlmOps.t12Stopwords _,
    "t13_rolling_fp"   -> LlmOps.t13RollingFp _,
    "t14_pack"         -> LlmOps.t14PackSequences _,
    "t15_chunk"        -> LlmOps.t15Chunk _,
    "t16_tfidf"        -> LlmOps.t16TfIdf _,
    "t17_inverted_index" -> LlmOps.t17InvertedIndex _,
    "t18_cdc_chunks"   -> LlmOps.t18CdcChunks _,
    "t19_dup_spans"    -> LlmOps.t19DupSpans _,
    "t20_heavy_hitters" -> LlmOps.t20HeavyHitters _,
    "t21_bm25"         -> LlmOps.t21Bm25 _,
    "t22_group_sample" -> LlmOps.t22GroupSample _,
    "t23_rare_bigrams" -> LlmOps.t23RareBigrams _,
    "t24_bpe_pairs"    -> LlmOps.t24BpePairs _,
    "t28_bpe_encode"   -> LlmOps.t28BpeEncode _,
    "t29_winnow_dups"  -> LlmOps.t29WinnowDups _,
    "t29b_winnow_ingest" -> LlmOps.t29bWinnowIngest _,
    "t19b_dup_spans_idx" -> LlmOps.t19bDupSpansIdx _,
    "t31_span_coverage" -> LlmOps.t31SpanCoverage _,
    "t30_bpe_learn"    -> LlmOps.t30BpeLearn _,
    "t25_classifier"   -> LlmOps.t25Classifier _,
    "t26_bigram_lm"    -> LlmOps.t26BigramLm _,
    "t27_bigram_topk"  -> ((s: SparkSession, d: String) => LlmOps.t27BigramTopk(s, d)),
  )

  private val simQueries: Map[String, Query] = Map(
    "sim_topk"      -> Similarity.simTopk _,
    "sim_lsh_pairs" -> Similarity.simLshPairs _,
    "sim_ivf_topk"  -> Similarity.simIvfTopk _,
    "sim_quantize_q8" -> Similarity.simQuantizeQ8 _,
    "sim_pq_topk"   -> Similarity.simPqTopk _,
    "q_kmeans"      -> Similarity.qKmeansCluster _,
    "q_semdedup"    -> Similarity.qSemDedup _,
    "d8_embed_neardup" -> Similarity.d8EmbedNeardup _,
    "sim_ivf_recall" -> Similarity.simIvfRecall _,
    "sim_lsh_sweep"  -> Similarity.simLshSweep _,
    // Materialized inverted-list forms (r13): same oracles as their
    // recompute twins — the stored index is a pure optimization.
    "sim_ivf_idx"        -> Similarity.simIvfTopkIdx _,
    "sim_ivf_recall_idx" -> Similarity.simIvfRecallIdx _,
    "sim_ivf_ingest"     -> Similarity.simIvfIngest _,
  )

  private val streamingQueries: Map[String, Query] = Map(
    "st1_tumbling_window" -> Streaming.tumblingCounts _,
    "st2_sliding_window"  -> Streaming.slidingCounts _,
    "st3_session_window"  -> Streaming.sessionCounts _,
    "st4_stream_join"     -> Streaming.streamStreamJoin _,
    "st5_stream_dedup"    -> Streaming.streamDedup _,
    "st6_stream_static"   -> Streaming.streamStaticJoin _,
    "st7_stream_left_join" -> Streaming.streamStreamLeftJoin _,
    "st8_stream_upsert"    -> Streaming.st8StreamUpsert _,
    "st9_sessionize_custom" -> Streaming.st9SessionizeCustom _,
    "st10_stream_full_outer" -> Streaming.streamStreamFullOuter _,
    "st11_milestones"      -> Streaming.st11Milestones _,
    "st12_inactivity"      -> Streaming.st12Inactivity _,
    "st13_ttl_state"       -> Streaming.st13TtlState _,
    "st14_stream_neardup"  -> Streaming.st14StreamNeardup _,
  )

  private val multimodalQueries: Map[String, Query] = Map(
    "m1_media_meta"   -> Multimodal.m1MediaMeta _,
    "m2_frame_sample" -> Multimodal.m2FrameSample _,
    "m3_resize"       -> Multimodal.m3Resize _,
    "m4_audio_meta"   -> Multimodal.m4AudioMeta _,
    "m5_image_phash"  -> Multimodal.m5ImagePhash _,
    "m6_phash_neardup" -> Multimodal.m6PhashNeardup _,
    "m7_audio_fingerprint" -> Multimodal.m7AudioFingerprint _,
    "m8_audio_neardup" -> Multimodal.m8AudioNeardup _,
    "m9_png_meta"      -> Multimodal.m9PngMeta _,
  )

  def queries: Map[String, Query] =
    relationalQueries ++ llmQueries ++ simQueries ++ streamingQueries ++ multimodalQueries

  /** Deliberately-kept COMPARISON twins (r12 verdict #7): each key is a
    * full-recompute / unindexed / unguarded baseline whose recommended
    * production form is the value. They stay in the catalog because (a)
    * every indexed/guarded form must keep proving oracle-equality
    * against its recompute twin, and (b) the graded delta between the
    * two IS the engine's scale evidence (flat index consumers vs
    * growing recompute twins on the curve). ~25 s of the graded sf0.1
    * total is this map's keys — a reader of BENCH_r{N} should not
    * count that as query cost a user would pay, and a future round must
    * not "optimize" the twins away (surfaced in BENCH_DETAIL as
    * baseline_twins).
    */
  val baselineTwins: Map[String, String] = Map(
    "d5_dedup_incremental" -> "d5b_index_ingest",
    "d7_dedup_resolve"     -> "d7b_resolve_idx",
    "d12_quality_resolve"  -> "d12b_quality_idx",
    "d13_group_split"      -> "d13b_split_idx",
    "q_curation_neardup"   -> "q_curation_neardup_idx",
    "d9_prefix_join"       -> "d9b_prefix_guarded",
    // r14: the recommended full-corpus READ path is the stored-index
    // consumer (t29b stays the recommended INGEST form; both are
    // non-twin catalog entries).
    "t29_winnow_dups"      -> "t19b_dup_spans_idx",
    "q_triangles"          -> "q_triangles_adj_idx",
    "q_triangles_idx"      -> "q_triangles_adj_idx",
    "q_triangles_adj"      -> "q_triangles_adj_idx",
    "sim_ivf_topk"         -> "sim_ivf_idx",
    "sim_ivf_recall"       -> "sim_ivf_recall_idx",
  )

  // As-of date literal shared with Relational.AsOfDate — the oracle must
  // pin the same "today" (SURVEY.md §7.4.1).
  private val asOf = Relational.AsOfDate
  private val ageExpr =
    s"""year(DATE '$asOf') - year(o_orderdate) - CASE WHEN (month(DATE '$asOf') < month(o_orderdate)) OR (month(DATE '$asOf') = month(o_orderdate) AND day(DATE '$asOf') < day(o_orderdate)) THEN 1 ELSE 0 END"""

  private val relationalOracle: Map[String, String] = Map(
    "s1_scan_project" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "s4_filtered_scan" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01' ORDER BY l_orderkey, l_linenumber",
    "p1_contains_filter" ->
      "SELECT p_partkey, p_name, p_brand FROM part WHERE p_name LIKE '%widget%' ORDER BY p_partkey",
    "p2_projection" ->
      "SELECT c_custkey, c_name, upper(c_mktsegment) AS segment, CASE WHEN c_nationkey IS NULL OR c_nationkey = 0 THEN '' ELSE 'Grade ' || CAST(c_nationkey AS VARCHAR) END AS grade_label FROM customer ORDER BY c_custkey",
    "p4_pick_first" ->
      "SELECT o_custkey, o_orderkey AS first_orderkey, CAST(o_orderdate AS DATE) AS first_orderdate FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn FROM orders) WHERE rn = 1 ORDER BY o_custkey",
    "j1_dim_join" ->
      "SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name",
    "j2_fact_join" ->
      "SELECT o_orderpriority, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, count(*) AS n_items FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority ORDER BY o_orderpriority",
    // Salting only changes partitioning, never results — same twin as j2.
    "j9_salted_join" ->
      "SELECT o_orderpriority, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, count(*) AS n_items FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority ORDER BY o_orderpriority",
    "j3_left_join_default" ->
      "SELECT c_custkey, coalesce(CAST(CAST(first_date AS DATE) AS VARCHAR), '') AS first_order_date, coalesce(n_orders, 0) AS n_orders FROM customer LEFT JOIN (SELECT o_custkey, min(o_orderdate) AS first_date, count(*) AS n_orders FROM orders GROUP BY o_custkey) ON c_custkey = o_custkey ORDER BY c_custkey",
    "j5_validate_counts" ->
      ("WITH expected AS (SELECT c_nationkey AS nation_key, count(*) AS expected_count FROM customer GROUP BY 1), " +
        "actual AS (SELECT c_nationkey AS nation_key, count(DISTINCT c_custkey) AS actual_count FROM customer JOIN orders ON c_custkey = o_custkey GROUP BY 1) " +
        "SELECT e.nation_key, e.expected_count, coalesce(a.actual_count, 0) AS actual_count, CASE WHEN a.actual_count = e.expected_count THEN 1 ELSE 0 END AS valid " +
        "FROM expected e LEFT JOIN actual a ON e.nation_key = a.nation_key ORDER BY e.nation_key"),
    "j6_semi_join" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') ORDER BY o_orderkey",
    // NOT EXISTS, not NOT IN: NOT IN returns zero rows if the subquery has
    // any NULL key, which is not left_anti's semantics (advisor finding).
    "j7_anti_join" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderstatus = 'P' AND o_custkey = c_custkey)",
    "a1_group_count" ->
      "SELECT o_orderpriority, count(*) AS n_orders FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
    "a2_group_agg" ->
      "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, round(sum(l_extendedprice), 2) AS sum_base_price, round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, round(avg(l_quantity), 2) AS avg_qty, count(*) AS count_order FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "a3_count_distinct" ->
      "SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers, count(*) AS n_orders FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    "a4_rollup" ->
      "SELECT coalesce(r_name, 'ALL') AS region_name, coalesce(n_name, 'ALL') AS nation_name, count(*) AS n_customers FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY ROLLUP(r_name, n_name) ORDER BY region_name, nation_name",
    "a5_cube" ->
      ("SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE coalesce(o_orderstatus, 'NULL') END AS order_status, " +
        "CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE coalesce(o_orderpriority, 'NULL') END AS order_priority, " +
        "count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)"),
    // a6_approx_distinct: intentionally no oracle — HLL estimates are
    // engine-specific; bounded-error-vs-exact is asserted in ScalaTest.
    "w1_topk_per_group" ->
      "SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk",
    "w2_running_total" ->
      "SELECT o_custkey, o_orderkey, round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total FROM orders ORDER BY o_custkey, o_orderkey",
    "w3_lag_lead" ->
      "SELECT o_custkey, o_orderkey, coalesce(lag(o_totalprice, 1) OVER w, 0.0) AS prev_price, coalesce(lead(o_totalprice, 1) OVER w, 0.0) AS next_price FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) ORDER BY o_custkey, o_orderkey",
    "w4_range_frame" ->
      ("SELECT o_custkey, o_orderkey, count(*) OVER w AS n_orders_30d, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_30d FROM orders " +
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)"),
    "w5_rank_family" ->
      ("SELECT o_orderpriority, o_orderkey, dense_rank() OVER w AS drank, percent_rank() OVER w AS prank, " +
        "cume_dist() OVER w AS cdist, ntile(4) OVER w AS quartile FROM orders WHERE o_custkey < 100 " +
        "WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)"),
    "w6_first_last" ->
      ("SELECT o_custkey, o_orderkey, first_value(o_orderkey) OVER w AS first_key, " +
        "last_value(o_orderkey) OVER w AS last_key, " +
        "coalesce(nth_value(o_orderkey, 2) OVER w, -1) AS second_key FROM orders " +
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"),
    // Gaps-and-islands sessionization twin: identical integer-milli gap
    // arithmetic; CAST on the running sum (DuckDB sum(int) → HUGEINT).
    "w7_sessionize" ->
      ("WITH ev AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events), " +
        "f AS (SELECT user_id, event_id, ts_ms, CASE WHEN ts_ms - lag(ts_ms) OVER w > 1800000 " +
        "OR lag(ts_ms) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess FROM ev " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)), " +
        "s AS (SELECT user_id, ts_ms, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq FROM f) " +
        "SELECT user_id, session_seq, count(*) AS n_events, min(ts_ms) AS start_ms, " +
        "max(ts_ms) AS end_ms, max(ts_ms) - min(ts_ms) AS duration_ms FROM s GROUP BY user_id, session_seq"),
    // Boolean/conditional aggregate twins; arg_max on the same
    // integer ordinal so exact-price ties break identically.
    "f12_conditional_agg" ->
      ("SELECT o_orderstatus, " +
        "CAST(count(*) FILTER (o_totalprice > 100000) AS BIGINT) AS n_big, " +
        "bool_and(o_totalprice > 0) AS all_positive, " +
        "bool_or(o_orderpriority = '1-URGENT') AS any_urgent, " +
        "arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS priciest_key " +
        "FROM orders GROUP BY o_orderstatus"),
    // Two-pass scalable numbering ≡ the naive total-order row_number.
    "q_global_rownum" ->
      "SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) AS rn FROM orders",
    // Ordered-collection twin: string_agg with ORDER BY states what the
    // engine's collect→array_sort→join pipeline computes.
    "f11_collect" ->
      ("SELECT o_custkey, string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderdate, o_orderkey) AS order_keys, " +
        "count(*) AS n_orders FROM orders GROUP BY o_custkey"),
    // Integer-milli histogram: identical exact bucket arithmetic.
    "a11_histogram" ->
      ("WITH ev AS (SELECT CAST(round(value * 1000) AS BIGINT) AS v_milli FROM events WHERE value IS NOT NULL), " +
        "b AS (SELECT min(v_milli) AS lo, max(v_milli) AS hi FROM ev) " +
        "SELECT least(19, ((v_milli - lo) * 20) // (hi - lo + 1)) AS bucket, " +
        "count(*) AS n_events, min(v_milli) AS min_v_milli, max(v_milli) AS max_v_milli " +
        "FROM ev, b GROUP BY 1"),
    // SCD2 twin: same change-detect (lag) → close (lead) → number
    // (row_number) pipeline; windows re-stated over the filtered set.
    "q_scd2" ->
      ("WITH ev AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type FROM events), " +
        "c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_type FROM ev), " +
        "ch AS (SELECT user_id, event_id, ts_ms, event_type FROM c WHERE prev_type IS NULL OR prev_type <> event_type) " +
        "SELECT user_id, event_type, ts_ms AS valid_from_ms, " +
        "coalesce(lead(ts_ms) OVER w2 - 1, -1) AS valid_to_ms, " +
        "CAST(row_number() OVER w2 AS BIGINT) AS version " +
        "FROM ch WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_ms, event_id)"),
    // Range-containment join stated naively (inequality join); the engine
    // side computes the same matches through the bucketed equi-join.
    "q_range_join" ->
      ("WITH ev AS (SELECT epoch_ms(ts) AS ts_ms, CAST(round(value * 1000) AS BIGINT) AS value_milli FROM events), " +
        "b AS (SELECT min(ts_ms) AS lo, max(ts_ms) AS hi FROM ev), " +
        "w AS (SELECT r AS w_id, lo + r * ((hi - lo + 1) // 64) AS w_start, " +
        "lo + r * ((hi - lo + 1) // 64) + ((hi - lo + 1) // 32 + 1) AS w_end FROM range(0, 48) t(r), b) " +
        "SELECT w_id, count(*) AS n_events, CAST(sum(value_milli) AS BIGINT) AS sum_value_milli " +
        "FROM w JOIN ev ON ts_ms >= w_start AND ts_ms < w_end GROUP BY w_id"),
    // MAD-outlier twin: quantile_cont interpolates exactly like Spark's
    // percentile (proven by a10), and the doubled-integer encoding makes
    // every derived value and the 1.5-MAD cut integer-exact.
    "q_mad_outliers" ->
      ("WITH c AS (SELECT c_custkey, c_mktsegment AS segment, CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer), " +
        "m AS (SELECT segment, CAST(round(2 * quantile_cont(cents, 0.5)) AS BIGINT) AS med2 FROM c GROUP BY 1), " +
        "d AS (SELECT c.*, med2, abs(2 * cents - med2) AS dev2 FROM c JOIN m USING (segment)), " +
        "md AS (SELECT segment, CAST(round(2 * quantile_cont(dev2, 0.5)) AS BIGINT) AS mad4 FROM d GROUP BY 1) " +
        "SELECT c_custkey, segment, cents, med2, CAST(dev2 AS BIGINT) AS dev2, mad4 " +
        "FROM d JOIN md USING (segment) WHERE dev2 * 4 > mad4 * 3"),
    // Funnel twin: per-user min/max fold, 1:1 left join, integer-milli
    // conversion via the shared round-half-up primitive.
    "q_funnel" ->
      ("WITH s AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS s_ts FROM events WHERE event_type = 'signup' GROUP BY 1), " +
        "p AS (SELECT user_id, max(CAST(ts AS TIMESTAMP)) AS last_p FROM events WHERE event_type = 'purchase' GROUP BY 1), " +
        "u AS (SELECT CAST(date_trunc('day', s_ts) AS DATE) AS cohort_day, " +
        "CASE WHEN last_p IS NOT NULL AND last_p >= s_ts THEN 1 ELSE 0 END AS conv FROM s LEFT JOIN p USING (user_id)) " +
        "SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_signups, CAST(sum(conv) AS BIGINT) AS n_converted, " +
        "CAST((2000 * sum(conv) + count(*)) // (2 * count(*)) AS BIGINT) AS conv_milli FROM u GROUP BY 1"),
    // Retention twin: first-seen week per user, distinct activity weeks,
    // integer week offsets (both engines truncate weeks to ISO Monday).
    "q_retention" ->
      ("WITH c AS (SELECT user_id, CAST(date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS DATE) AS cohort_week FROM events GROUP BY 1), " +
        "a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week FROM events) " +
        "SELECT cohort_week, CAST((week - cohort_week) // 7 AS BIGINT) AS week_offset, CAST(count(*) AS BIGINT) AS n_active " +
        "FROM a JOIN c USING (user_id) GROUP BY 1, 2"),
    // TPC-H twins: near-verbatim SQL — the whole point of the spark.sql
    // text surface is that the same statement runs on both engines.
    "q_tpch_q3" ->
      ("SELECT o_orderkey, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents, " +
        "CAST(o_orderdate AS DATE) AS order_date " +
        "FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15' " +
        "GROUP BY o_orderkey, o_orderdate ORDER BY revenue_cents DESC, o_orderkey LIMIT 10"),
    "q_tpch_q5" ->
      ("SELECT n_name, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents " +
        "FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey " +
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
        "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY n_name"),
    // Interval-overlap twin: the naive overlap inequality join — the
    // engine's bucketed form must compute exactly these matches.
    "q_interval_join" ->
      ("WITH a AS (SELECT o_orderkey AS a_orderkey, CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS a_lo, " +
        "CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) + 14 AS a_hi FROM orders WHERE o_custkey % 50 = 1), " +
        "b AS (SELECT o_orderkey AS b_orderkey, CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS b_lo, " +
        "CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) + 14 AS b_hi FROM orders WHERE o_custkey % 50 = 2) " +
        "SELECT a_orderkey, b_orderkey, least(a_hi, b_hi) - greatest(a_lo, b_lo) AS overlap_days " +
        "FROM a JOIN b ON a_lo < b_hi AND b_lo < a_hi"),
    // Fuzzy-match twin: same blocking equi-join stated as SQL, same
    // built-in Levenshtein (unit-cost edit distance in both engines).
    "q_fuzzy_match" ->
      ("SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b, " +
        "CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist " +
        "FROM customer a JOIN customer b " +
        "ON a.c_nationkey = b.c_nationkey AND a.c_custkey // 100 = b.c_custkey // 100 " +
        "AND a.c_custkey < b.c_custkey " +
        "WHERE levenshtein(a.c_name, b.c_name) <= 3"),
    // Name-derived-blocking twin: the same two-pass sorted-neighborhood
    // stated in SQL — row_number over (name / reversed name), a ±W band
    // self-join per pass, union, Levenshtein verify. Deterministic
    // because c_name is unique, so both orderings are total.
    "q_fuzzy_match_name" ->
      ("WITH c AS (SELECT c_custkey AS key, c_name AS name FROM customer), " +
        "f AS (SELECT key, name, row_number() OVER (ORDER BY name) AS rn FROM c), " +
        "r AS (SELECT key, name, row_number() OVER (ORDER BY reverse(name)) AS rn FROM c), " +
        s"pairs AS (SELECT a.key AS ka, b.key AS kb, a.name AS na, b.name AS nb FROM f a JOIN f b ON b.rn > a.rn AND b.rn <= a.rn + ${Relational.FuzzyWindow} " +
        s"UNION ALL SELECT a.key, b.key, a.name, b.name FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + ${Relational.FuzzyWindow}) " +
        "SELECT DISTINCT least(ka, kb) AS cust_a, greatest(ka, kb) AS cust_b, " +
        "CAST(levenshtein(na, nb) AS BIGINT) AS edit_dist FROM pairs " +
        "WHERE levenshtein(na, nb) <= 3"),
    // Regex family twin: extract/count/match via DuckDB's RE builtins.
    "f14_regex" ->
      ("SELECT p_partkey, regexp_extract(p_name, '^[a-z]+') AS first_word, " +
        "CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT) AS n_vowel_runs, " +
        "regexp_matches(p_name, '(ring|bolt)') AS is_fastener FROM part"),
    // Variant twin: typed path extraction via DuckDB's JSON functions —
    // same values, same null-on-miss ''-coalesce.
    "f15_variant" ->
      ("SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num, " +
        "json_extract_string(props, '$.k') AS k_str, " +
        "coalesce(json_extract_string(props, '$.absent'), '') AS missing FROM events"),
    // Snapshot-diff twin: the oracle re-derives the perturbed "next
    // snapshot" with identical integer/mod arithmetic and classifies via
    // a plain FULL JOIN value compare — the engine's hash-compare is an
    // implementation detail it must agree with.
    "q_snapshot_diff" ->
      ("WITH o AS (SELECT o_orderkey, o_orderstatus AS status, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "n AS (SELECT o_orderkey, CASE WHEN o_orderkey % 13 = 0 THEN 'X' ELSE status END AS status, " +
        "CASE WHEN o_orderkey % 7 = 0 THEN cents + 500 ELSE cents END AS cents FROM o WHERE o_orderkey % 97 <> 0 " +
        "UNION ALL SELECT o_orderkey + 100000000, status, cents FROM o WHERE o_orderkey % 101 = 0) " +
        "SELECT * FROM (SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey, " +
        "CASE WHEN o.o_orderkey IS NULL THEN 'added' WHEN n.o_orderkey IS NULL THEN 'removed' " +
        "WHEN o.status <> n.status OR o.cents <> n.cents THEN 'changed' ELSE 'unchanged' END AS change_type " +
        "FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey) WHERE change_type <> 'unchanged'"),
    // Compaction twin: the maintenance rewrite must be invisible to any
    // reader — the oracle reads the same rows straight from the source.
    "q_compact" ->
      ("SELECT o_orderkey, o_orderstatus, " +
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders"),
    // Checksum twin: the same prefix-free token encoding → md5 → 60-bit
    // integer (first 15 hex chars, big-endian nibbles), folded with the
    // same commutative aggregates. The gate itself demonstrates the
    // point: two engines, two row orders, one fingerprint.
    "q_table_checksum" ->
      (s"WITH h AS (SELECT md5(${Seq("doc_id", "text", "lang", "source", "n_chars")
        .map(c => s"(CASE WHEN $c IS NULL THEN 'N' ELSE length($c::VARCHAR)::VARCHAR || ':' || $c::VARCHAR END)")
        .mkString(" || ")}) AS h FROM documents), " +
        "s AS (SELECT CAST(list_sum(list_transform(range(0, 15), i -> " +
        "(strpos('0123456789abcdef', substr(h, i + 1, 1)) - 1)::BIGINT * (1::BIGINT << (4 * (14 - i))))) AS BIGINT) AS sig FROM h) " +
        "SELECT count(*) AS n_rows, CAST(bit_xor(sig) AS BIGINT) AS xor_sig, " +
        "CAST(sum(sig % 1000003) AS BIGINT) AS sum_sig FROM s"),
    // Incremental-rollup twin: the flat full-history GROUP BY — the gate
    // proves maintained-rollup + tail recompute ≡ recompute-everything.
    "q_incremental_rollup" ->
      ("SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n_events, " +
        "CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS total_value_milli " +
        "FROM events GROUP BY 1, 2"),
    // SCD2-MERGE twin: the MERGE expansion stated as one FULL JOIN and
    // four UNION ALL branches (unchanged-open / closed / reopened /
    // inserted). Null-safe value compare (IS NOT DISTINCT FROM) matches
    // the engine's injective-token hash equality.
    "q_scd2_merge" ->
      (s"WITH o AS (SELECT o_orderkey, o_orderstatus AS status, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "n AS (SELECT o_orderkey, CASE WHEN o_orderkey % 13 = 0 THEN 'X' ELSE status END AS status, " +
        "CASE WHEN o_orderkey % 7 = 0 THEN cents + 500 ELSE cents END AS cents FROM o WHERE o_orderkey % 97 <> 0 " +
        "UNION ALL SELECT o_orderkey + 100000000, status, cents FROM o WHERE o_orderkey % 101 = 0), " +
        "j AS (SELECT o.o_orderkey AS kd, n.o_orderkey AS kn, o.status AS ds, o.cents AS dc, n.status AS ns, n.cents AS nc, " +
        "(o.status IS NOT DISTINCT FROM n.status AND o.cents IS NOT DISTINCT FROM n.cents) AS same " +
        "FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey) " +
        "SELECT kd AS o_orderkey, ds AS status, dc AS cents, CAST(0 AS BIGINT) AS valid_from_ms, CAST(-1 AS BIGINT) AS valid_to_ms, CAST(1 AS BIGINT) AS version " +
        "FROM j WHERE kd IS NOT NULL AND kn IS NOT NULL AND same " +
        s"UNION ALL SELECT kd, ds, dc, 0, ${Delta.MergeT1} - 1, 1 FROM j WHERE kd IS NOT NULL AND (kn IS NULL OR NOT same) " +
        s"UNION ALL SELECT kn, ns, nc, ${Delta.MergeT1}, -1, 2 FROM j WHERE kd IS NOT NULL AND kn IS NOT NULL AND NOT same " +
        s"UNION ALL SELECT kn, ns, nc, ${Delta.MergeT1}, -1, 1 FROM j WHERE kd IS NULL"),
    // Gap-fill twin: the spine is generate_series over each key's own
    // month bounds — same per-key span, same zero fill.
    "q_gap_fill" ->
      ("WITH om AS (SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS month, count(*) AS n_orders, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents FROM orders WHERE o_custkey <= 200 GROUP BY 1, 2), " +
        "b AS (SELECT o_custkey, min(month) AS lo, max(month) AS hi FROM om GROUP BY 1), " +
        "spine AS (SELECT o_custkey, CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS month FROM b) " +
        "SELECT s.o_custkey, s.month, coalesce(n_orders, 0) AS n_orders, coalesce(cents, 0) AS cents " +
        "FROM spine s LEFT JOIN om USING (o_custkey, month)"),
    // Map-family twin: the engine's map_concat + explode rows, stated as
    // one UNION ALL branch per key.
    "f13_maps" ->
      ("SELECT event_id, 'k' AS key, json_extract_string(props, '$.k') AS value FROM events " +
        "UNION ALL SELECT event_id, 'et' AS key, event_type AS value FROM events"),
    // quantile_cont interpolates exactly like Spark's percentile (the
    // a10-proven pairing); all ratio outputs are integer div.
    "q_skew_profile" ->
      ("WITH k AS (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1) " +
        "SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows, min(cnt) AS min_cnt, max(cnt) AS max_cnt, " +
        "quantile_cont(cnt, 0.5) AS p50_cnt, quantile_cont(cnt, 0.99) AS p99_cnt, " +
        "CAST((max(cnt) * 1000 * count(*)) // CAST(sum(cnt) AS BIGINT) AS BIGINT) AS skew_milli FROM k"),
    "q_scalar_subquery" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)",
    // Correlated subqueries on the oracle side; the engine's window
    // formulation computes the identical integers in one pass.
    "q_correlated_scalar" ->
      ("WITH spend AS (SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents FROM orders GROUP BY o_custkey), " +
        "cs AS (SELECT c_custkey, c_nationkey, coalesce(cents, 0) AS cents FROM customer LEFT JOIN spend ON c_custkey = o_custkey) " +
        "SELECT c_custkey, cents, " +
        "(SELECT CAST(sum(b.cents) AS BIGINT) FROM cs b WHERE b.c_nationkey = a.c_nationkey) AS nation_total_cents, " +
        "(SELECT count(*) FROM cs b WHERE b.c_nationkey = a.c_nationkey) AS n_in_nation " +
        "FROM cs a WHERE cents * (SELECT count(*) FROM cs b WHERE b.c_nationkey = a.c_nationkey) > " +
        "(SELECT sum(b.cents) FROM cs b WHERE b.c_nationkey = a.c_nationkey)"),
    "a7_grouping_sets" ->
      ("SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE coalesce(o_orderstatus, 'NULL') END AS order_status, " +
        "CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE coalesce(o_orderpriority, 'NULL') END AS order_priority, " +
        "count(*) AS n_orders FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"),
    "a10_percentile" ->
      ("SELECT o_orderstatus, quantile_cont(o_orderkey, 0.5) AS median_key, " +
        "quantile_cont(o_orderkey, 0.9) AS p90_key, count(*) AS n FROM orders GROUP BY o_orderstatus"),
    "a8_pivot" ->
      ("SELECT o_orderpriority, count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f, " +
        "count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o, " +
        "count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p FROM orders GROUP BY o_orderpriority"),
    "a9_unpivot" ->
      ("WITH c AS (SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY 1), " +
        "s AS (SELECT s_nationkey, count(*) AS n_suppliers FROM supplier GROUP BY 1), " +
        "j AS (SELECT coalesce(c_nationkey, s_nationkey) AS nation_key, coalesce(n_customers, 0) AS n_customers, " +
        "coalesce(n_suppliers, 0) AS n_suppliers FROM c FULL JOIN s ON c_nationkey = s_nationkey) " +
        "SELECT nation_key, 'n_customers' AS metric, n_customers AS value FROM j " +
        "UNION ALL SELECT nation_key, 'n_suppliers' AS metric, n_suppliers AS value FROM j"),
    "k5_slice" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer ORDER BY c_custkey LIMIT 498 OFFSET 1",
    "q_topk_global" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "set_union" ->
      "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING' UNION SELECT o_custkey FROM orders ORDER BY custkey",
    "set_intersect" ->
      "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING' INTERSECT SELECT o_custkey FROM orders ORDER BY custkey",
    "set_except" ->
      "SELECT DISTINCT o_custkey AS custkey FROM orders EXCEPT SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY custkey",
    "f1_age_label" ->
      s"SELECT CASE WHEN o_orderdate IS NULL THEN '' ELSE CAST($ageExpr AS VARCHAR) || ' years' END AS age_label, count(*) AS n_orders FROM orders GROUP BY age_label ORDER BY age_label",
    "f2_grade_label" ->
      "SELECT CASE WHEN c_nationkey IS NULL OR c_nationkey = 0 THEN '' ELSE 'Grade ' || CAST(c_nationkey AS VARCHAR) END AS grade_label, count(*) AS n_customers FROM customer GROUP BY grade_label ORDER BY grade_label",
    "f6_json_extract" ->
      "SELECT event_type, round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 2) AS avg_k, round(sum(value), 2) AS total_value, count(*) AS n_events FROM events GROUP BY event_type ORDER BY event_type",
    "f7_from_json" ->
      "SELECT event_id, coalesce(CAST(json_extract_string(props, '$.k') AS INTEGER), -1) AS k FROM events",
    "f8_datetime" ->
      (s"SELECT o_orderkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month, " +
        s"datediff('day', CAST(o_orderdate AS DATE), DATE '$asOf') AS days_ago, " +
        "CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS due_month, " +
        "dayofweek(o_orderdate) + 1 AS dow, quarter(o_orderdate) AS qtr FROM orders"),
    "f9_strings" ->
      ("SELECT c_custkey, " +
        "upper(substr(lower(c_mktsegment), 1, 1)) || substr(lower(c_mktsegment), 2) AS segment_label, " +
        "lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key, " +
        "replace(c_name, '#', '-') AS clean_name, " +
        "levenshtein(c_mktsegment, 'BUILDING') AS seg_dist FROM customer"),
    "f10_arrays" ->
      ("SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tokens, " +
        "array_to_string(tok[1:3], ' ') AS first3, " +
        "list_sort(tok)[1] AS min_token, " +
        "CASE WHEN list_contains(tok, 'the') THEN 1 ELSE 0 END AS has_the " +
        "FROM (SELECT doc_id, string_split(text, ' ') AS tok FROM documents)"),
    "s5_parse_source" ->
      // CAST(sum() AS BIGINT): DuckDB sum(INTEGER) returns HUGEINT, which
      // pandas reads back as float64 — the typed hash compare then fails
      // against Spark's bigint even though values match (round-2 finding).
      ("""SELECT event_type, count(*) AS n_rows, min(k) AS min_k, max(k) AS max_k, CAST(sum(k) AS BIGINT) AS sum_k FROM """ +
        """(SELECT event_type, CAST(nullif(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS INTEGER) AS k FROM events) GROUP BY event_type"""),
    // Mirrors PaginatedSource's fake fetch: row k = (k, 'list_<k>',
    // (7k+3) mod 100) over 12 pages × 25 rows.
    "s6_paginated_rest" ->
      ("SELECT r % 4 AS grp, count(*) AS n_lists, CAST(sum((7 * r + 3) % 100) AS BIGINT) AS total_members " +
        "FROM range(0, 300) t(r) GROUP BY 1"),
    "p7_rename_lookup" ->
      ("WITH fmt(lang, csv_name) AS (VALUES ('en', 'english_docs'), ('de', 'german_docs'), ('fr', 'french_docs')) " +
        "SELECT doc_id, d.lang AS lang, csv_name FROM documents d JOIN fmt ON d.lang = fmt.lang"),
    "j4_pick_first_supplier" ->
      ("WITH cheapest AS (SELECT l_partkey, l_suppkey AS cheapest_suppkey, l_extendedprice AS cheapest_price FROM " +
        "(SELECT l_partkey, l_suppkey, l_extendedprice, row_number() OVER (PARTITION BY l_partkey ORDER BY l_extendedprice, l_suppkey) AS rn FROM lineitem) WHERE rn = 1) " +
        "SELECT p_partkey, coalesce(cheapest_suppkey, -1) AS cheapest_suppkey, coalesce(cheapest_price, 0.0) AS cheapest_price " +
        "FROM part LEFT JOIN cheapest ON p_partkey = l_partkey"),
    "j8_full_outer" ->
      ("WITH c AS (SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY 1), " +
        "s AS (SELECT s_nationkey, count(*) AS n_suppliers FROM supplier GROUP BY 1) " +
        "SELECT coalesce(c_nationkey, s_nationkey) AS nation_key, coalesce(n_customers, 0) AS n_customers, " +
        "coalesce(n_suppliers, 0) AS n_suppliers FROM c FULL JOIN s ON c_nationkey = s_nationkey"),
    // As-of twin: row_number over (ts DESC, event_id DESC) = 1 is the same
    // row as Spark's max(struct(ts, event_id, event_type)) argmax.
    "q_asof_join" ->
      ("WITH err AS (SELECT event_id AS error_id, user_id, CAST(ts AS TIMESTAMP) AS error_ts FROM events WHERE event_type = 'error'), " +
        "oth AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type FROM events WHERE event_type != 'error') " +
        "SELECT error_id, user_id, error_ts, ts AS prev_ts, event_id AS prev_event_id, event_type AS prev_event_type FROM (" +
        "SELECT err.error_id, err.user_id, err.error_ts, oth.ts, oth.event_id, oth.event_type, " +
        "row_number() OVER (PARTITION BY err.error_id ORDER BY oth.ts DESC, oth.event_id DESC) AS rn " +
        "FROM err JOIN oth ON err.user_id = oth.user_id AND oth.ts <= err.error_ts) WHERE rn = 1"),
    // The native AsOfJoinExec path must produce the identical rows.
    "q_asof_native" ->
      ("WITH err AS (SELECT event_id AS error_id, user_id, CAST(ts AS TIMESTAMP) AS error_ts FROM events WHERE event_type = 'error'), " +
        "oth AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type FROM events WHERE event_type != 'error') " +
        "SELECT error_id, user_id, error_ts, ts AS prev_ts, event_id AS prev_event_id, event_type AS prev_event_type FROM (" +
        "SELECT err.error_id, err.user_id, err.error_ts, oth.ts, oth.event_id, oth.event_type, " +
        "row_number() OVER (PARTITION BY err.error_id ORDER BY oth.ts DESC, oth.event_id DESC) AS rn " +
        "FROM err JOIN oth ON err.user_id = oth.user_id AND oth.ts <= err.error_ts) WHERE rn = 1"),
    "q_data_quality" ->
      ("WITH w AS (SELECT " +
        "CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey, " +
        "CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_price, " +
        "CAST(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END) AS BIGINT) AS bad_status, " +
        "CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_o_orderkey FROM orders) " +
        "SELECT rule, n_violations, CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS pass FROM (" +
        "SELECT 'null_custkey' AS rule, null_custkey AS n_violations FROM w " +
        "UNION ALL SELECT 'nonpositive_price', nonpositive_price FROM w " +
        "UNION ALL SELECT 'bad_status', bad_status FROM w " +
        "UNION ALL SELECT 'dup_o_orderkey', dup_o_orderkey FROM w)"),
    "q_flagship" ->
      (s"WITH dims AS (SELECT n_nationkey, n_name FROM nation JOIN region ON n_regionkey = r_regionkey WHERE r_name LIKE '%A%'), " +
        s"joined AS (SELECT n_name, $ageExpr AS order_age, o_totalprice FROM customer JOIN dims ON c_nationkey = n_nationkey JOIN orders ON c_custkey = o_custkey), " +
        "actual AS (SELECT n_name, count(*) AS n_orders, round(avg(order_age), 2) AS avg_order_age, round(sum(o_totalprice), 2) AS total_price FROM joined GROUP BY n_name), " +
        "expected AS (SELECT n_name, count(*) AS n_customers FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name) " +
        "SELECT a.n_name, a.n_orders, a.avg_order_age, a.total_price, coalesce(e.n_customers, 0) AS n_customers, " +
        "CASE WHEN a.n_orders > 0 AND e.n_customers > 0 THEN 1 ELSE 0 END AS valid " +
        "FROM actual a LEFT JOIN expected e ON a.n_name = e.n_name ORDER BY a.n_name"),
  )

  // -- LLM-pipeline oracles -------------------------------------------
  // DuckDB mirrors of the LlmOps expressions. Hashes are md5 hex (same
  // function both engines); ratios are integer `*_milli` columns via
  // round-half-up(1000x) = (2000*num + den) // (2*den) — no float
  // rounding anywhere in the comparison surface.

  private val duckShingles =
    "CASE WHEN len(tok) < 3 THEN [] ELSE list_distinct(list_transform(range(1, len(tok) - 1), i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])) END"

  private val duckTok = "SELECT doc_id, source, text, string_split(text, ' ') AS tok FROM documents"

  /** Shared CTE chain for the d9b/d9_degree_stats twins: the PPJoin
    * candidate pipeline (rarest-first prefix cut, prefix self-join,
    * length + positional filters) plus each doc's surviving-candidate
    * degree — DuckDB walking LlmOps.d9Prefix/d9Grouped/d9LengthFilter/
    * d9PositionFilter step for step.
    */
  private val duckD9Cand = {
    import LlmOps.{PrefixJaccardDen => den, PrefixJaccardNum => num}
    "WITH tokd AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents), " +
      s"shl AS (SELECT doc_id, unnest($duckShingles) AS shingle FROM tokd WHERE len(tok) >= 3), " +
      "sizes AS (SELECT doc_id, count(*) AS s FROM shl GROUP BY doc_id), " +
      "dfs AS (SELECT shingle, count(*) AS df FROM shl GROUP BY shingle), " +
      "ranked AS (SELECT shl.doc_id, shl.shingle, " +
      "row_number() OVER (PARTITION BY shl.doc_id ORDER BY df, shl.shingle) AS rn, sizes.s " +
      "FROM shl JOIN dfs USING (shingle) JOIN sizes USING (doc_id)), " +
      s"pref AS (SELECT * FROM ranked WHERE rn <= s - (($num * s + ${den - 1}) // $den) + 1), " +
      "cand0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.s AS sa, b.s AS sb, " +
      "max(least(a.s - a.rn, b.s - b.rn) + 1) AS ub " +
      "FROM pref a JOIN pref b ON a.shingle = b.shingle AND a.doc_id < b.doc_id " +
      "GROUP BY 1, 2, 3, 4), " +
      s"cand AS (SELECT * FROM cand0 WHERE least(sa, sb) * $den >= greatest(sa, sb) * $num " +
      s"AND ub * ${num + den} >= $num * (sa + sb)), " +
      "deg AS (SELECT doc_id, count(*) AS n_candidates FROM " +
      "(SELECT doc_a AS doc_id FROM cand UNION ALL SELECT doc_b AS doc_id FROM cand) GROUP BY doc_id)"
  }

  /** 16-bit md5 doc bucket in [0, 100) — token-for-token twin of
    * LlmOps.docBucketExpr (4 nibbles; the old 8-bit form had a visible
    * 3/256-vs-2/256 modulo bias on the split proportions).
    */
  private def duckBucketOn(column: String): String = {
    val nib = (i: Int) =>
      s"(strpos('0123456789abcdef', substr(md5($column::VARCHAR), $i, 1)) - 1)"
    s"((((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)}) % 100)"
  }

  private val duckBucket = duckBucketOn("doc_id")

  /** 60-bit shingle hash — token-for-token twin of LlmOps.shingleHash60
    * (first 15 md5 hex chars, big-endian nibbles; the q_table_checksum
    * encoding). The d5-family verify runs on hashed DISTINCT sets in
    * both engines, so the int64 transformation is part of the checked
    * semantics, never an engine-side assumption.
    */
  private def duckHash60(c: String): String =
    s"CAST(list_sum(list_transform(range(0, 15), i -> " +
      s"(strpos('0123456789abcdef', substr(md5($c), CAST(i + 1 AS INTEGER), 1)) - 1)::BIGINT * " +
      s"(1::BIGINT << (4 * (14 - CAST(i AS INTEGER)))))) AS BIGINT)"

  /** r15 seeded-family twin: the engine's native mix64 restated as exact
    * HUGEINT mod-2^64 arithmetic — ((a_h·v + b_h) mod 2^64) // 16, with
    * the constants read from the SAME LlmOps.MixA/MixB tables the Spark
    * side binds (a_h < 2^63 keeps the HUGEINT product in range;
    * Mix64Spec asserts value equality, every banded-family oracle
    * asserts it end-to-end).
    */
  private val duckMixA = LlmOps.MixA.mkString("[", ", ", "]")
  private val duckMixB = LlmOps.MixB.mkString("[", ", ", "]")
  private def duckMix(v: String, h: String): String =
    s"CAST(((CAST($duckMixA[$h + 1] AS HUGEINT) * ($v) + $duckMixB[$h + 1]) " +
      s"% 18446744073709551616::HUGEINT) // 16 AS BIGINT)"

  /** The full 8-seed MinHash signature over a (string) shingle list `s`:
    * hash60 once per shingle, then the eight multiply-shift minima —
    * token-for-token the engine's minhashBandsOf/perRowMinExprs family.
    */
  private def duckSeededSig: String =
    s"list_transform(range(0, ${LlmOps.NumHashes}), h -> " +
      s"list_min(list_transform(list_transform(s, x -> ${duckHash60("x")}), " +
      s"v -> ${duckMix("v", "h")})))"

  /** Shared by d5_dedup_incremental and d5b_index_ingest: the index path
    * is a pure optimization, so both queries grade against the identical
    * full-recompute twin.
    */
  private lazy val d5DedupSql =
    s"WITH tokd AS ($duckTok), " +
      s"sh AS (SELECT doc_id, $duckShingles AS s FROM tokd WHERE len(tok) >= 3), " +
      s"shh AS (SELECT doc_id, list_distinct(list_transform(s, x -> ${duckHash60("x")})) AS s FROM sh), " +
      s"sig AS (SELECT doc_id, ${duckSeededSig} AS g FROM sh), " +
      s"bands AS (SELECT sig.doc_id, d.source, b, md5(array_to_string(g[b*${LlmOps.RowsPerBand}+1 : b*${LlmOps.RowsPerBand}+${LlmOps.RowsPerBand}], '|')) AS bkey " +
      "FROM sig JOIN documents d ON sig.doc_id = d.doc_id CROSS JOIN (VALUES (0),(1),(2),(3)) AS t(b)), " +
      // Corpus-side skew cap mirrored from capBandBuckets (batch side
      // uncapped, matching the Spark plan).
      "corp AS (SELECT * FROM bands WHERE source != 'src0'), " +
      s"corpk AS (SELECT * FROM corp WHERE (b, bkey) IN (SELECT (b, bkey) FROM corp GROUP BY b, bkey HAVING count(*) <= ${LlmOps.LshBucketCap})), " +
      "cand AS (SELECT DISTINCT n.doc_id AS new_doc, c.doc_id AS existing_doc FROM bands n JOIN corpk c " +
      "ON n.b = c.b AND n.bkey = c.bkey AND n.source = 'src0') " +
      "SELECT new_doc, existing_doc, (2000*i + u) // (2*u) AS jaccard_milli FROM (" +
      "SELECT new_doc, existing_doc, len(list_intersect(sa.s, sb.s)) AS i, len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS u " +
      "FROM cand JOIN shh sa ON cand.new_doc = sa.doc_id JOIN shh sb ON cand.existing_doc = sb.doc_id)"

  /** t30 twin: the learn loop unrolled as [[LlmOps.BpeLearnRounds]] CTE
    * stages — per round, pair counts over the current symbolization, a
    * LIMIT-1 argmax with the identical (count desc, a, b) tie order, and
    * the same leftmost-non-overlapping fold t28's twin uses with the
    * elected pair bound by a cross join.
    */
  private lazy val t30LearnSql: String = {
    val rounds = LlmOps.BpeLearnRounds
    val sb = new StringBuilder
    sb ++= s"WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents), "
    sb ++= "w AS (SELECT tok, count(*) AS freq FROM toks WHERE length(tok) >= 1 GROUP BY tok), "
    sb ++= "e0 AS (SELECT tok, freq, array_to_string(list_transform(range(1, length(tok) + 1), " +
      "i -> substr(tok, CAST(i AS INT), 1)), ' ') AS sym FROM w)"
    for (r <- 1 to rounds) {
      val prev = s"e${r - 1}"
      sb ++= s", p$r AS (SELECT string_split(sym, ' ')[CAST(i AS INT)] AS a, " +
        s"string_split(sym, ' ')[CAST(i AS INT) + 1] AS b, freq " +
        s"FROM (SELECT sym, freq, unnest(range(1, len(string_split(sym, ' ')))) AS i FROM $prev))"
      sb ++= s", c$r AS (SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM p$r GROUP BY a, b)"
      sb ++= s", b$r AS (SELECT a, b, cnt FROM c$r ORDER BY cnt DESC, a, b LIMIT 1)"
      sb ++= s", e$r AS (SELECT tok, freq, list_reduce(string_split(sym, ' '), (acc, x) -> " +
        s"CASE WHEN regexp_extract(acc, '[^ ]+$$') = b$r.a AND x = b$r.b " +
        s"THEN regexp_replace(acc, '[^ ]+$$', '') || b$r.a || b$r.b " +
        s"ELSE acc || ' ' || x END) AS sym FROM $prev CROSS JOIN b$r)"
    }
    sb ++= " " + (1 to rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS merge_rank, a, b, cnt AS pair_count FROM b$r")
      .mkString(" UNION ALL ")
    sb.toString
  }

  /** st14 twin: d5's ingest pipeline with the candidate DISTINCT removed
    * and the band index kept — one alert row per (new, existing, band)
    * collision, the stream's stateless at-least-once contract.
    */
  private lazy val st14NeardupSql: String =
    s"WITH tokd AS ($duckTok), " +
      s"sh AS (SELECT doc_id, $duckShingles AS s FROM tokd WHERE len(tok) >= 3), " +
      s"shh AS (SELECT doc_id, list_distinct(list_transform(s, x -> ${duckHash60("x")})) AS s FROM sh), " +
      s"sig AS (SELECT doc_id, ${duckSeededSig} AS g FROM sh), " +
      s"bands AS (SELECT sig.doc_id, d.source, b, md5(array_to_string(g[b*${LlmOps.RowsPerBand}+1 : b*${LlmOps.RowsPerBand}+${LlmOps.RowsPerBand}], '|')) AS bkey " +
      "FROM sig JOIN documents d ON sig.doc_id = d.doc_id CROSS JOIN (VALUES (0),(1),(2),(3)) AS t(b)), " +
      "corp AS (SELECT * FROM bands WHERE source != 'src0'), " +
      s"corpk AS (SELECT * FROM corp WHERE (b, bkey) IN (SELECT (b, bkey) FROM corp GROUP BY b, bkey HAVING count(*) <= ${LlmOps.LshBucketCap})), " +
      "cand AS (SELECT n.doc_id AS new_doc, c.doc_id AS existing_doc, n.b AS band FROM bands n JOIN corpk c " +
      "ON n.b = c.b AND n.bkey = c.bkey AND n.source = 'src0') " +
      "SELECT new_doc, existing_doc, CAST(band AS BIGINT) AS band, (2000*i + u) // (2*u) AS jaccard_milli FROM (" +
      "SELECT new_doc, existing_doc, band, len(list_intersect(sa.s, sb.s)) AS i, len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS u " +
      "FROM cand JOIN shh sa ON cand.new_doc = sa.doc_id JOIN shh sb ON cand.existing_doc = sb.doc_id)"

  private def duckOcc(p: String): String =
    s"(length(text) - length(replace(text, '$p', ''))) // ${p.length}"

  // One triangle oracle, three physical forms: q_triangles (wedge join),
  // q_triangles_idx (bucketed index), q_triangles_adj (adjacency
  // merge-count) all bind THIS string, so a correction here reaches all
  // three twins at once (reviewer finding: the text used to be pasted
  // per query and could silently diverge).
  private lazy val duckTriangleSql: String =
    "WITH e0 AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v " +
      "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey " +
      "WHERE a.l_partkey < b.l_partkey), " +
      "e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0), " +
      "deg AS (SELECT u AS node, count(*) AS d FROM e GROUP BY u), " +
      "o AS (SELECT e.u AS src, e.v AS dst, dv.d AS d_dst FROM e " +
      "JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v " +
      "WHERE du.d < dv.d OR (du.d = dv.d AND e.u < e.v)) " +
      "SELECT (SELECT count(*) FROM deg) AS n_nodes, " +
      "(SELECT count(*) FROM e0) AS n_edges, " +
      "count(*) AS n_triangles " +
      "FROM o o1 " +
      "JOIN o o2 ON o1.src = o2.src " +
      "AND (o1.d_dst < o2.d_dst OR (o1.d_dst = o2.d_dst AND o1.dst < o2.dst)) " +
      "JOIN o o3 ON o3.src = o1.dst AND o3.dst = o2.dst"

  // Connected-components prefix shared by d7 and d12: recursive transitive
  // closure over the symmetrized near-dup edges (UNION dedups, so cycles
  // terminate); `reach(a, b)` = b reachable from a, canonical = min(b).
  private lazy val duckCcCte =
    s"WITH RECURSIVE tokd AS ($duckTok), " +
      s"sh AS (SELECT doc_id, $duckShingles AS s FROM tokd WHERE len(tok) >= 3), " +
      s"sig AS (SELECT doc_id, ${duckSeededSig} AS g FROM sh), " +
      s"bands0 AS (SELECT doc_id, b, md5(array_to_string(g[b*${LlmOps.RowsPerBand}+1 : b*${LlmOps.RowsPerBand}+${LlmOps.RowsPerBand}], '|')) AS bkey FROM sig CROSS JOIN (VALUES (0),(1),(2),(3)) AS t(b)), " +
      s"bands AS (SELECT * FROM bands0 WHERE (b, bkey) IN (SELECT (b, bkey) FROM bands0 GROUP BY b, bkey HAVING count(*) <= ${LlmOps.LshBucketCap})), " +
      "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id), " +
      "jac AS (SELECT doc_a, doc_b, (2000*i + u) // (2*u) AS jaccard_milli FROM (" +
      "SELECT doc_a, doc_b, len(list_intersect(sa.s, sb.s)) AS i, len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS u " +
      "FROM cand JOIN sh sa ON cand.doc_a = sa.doc_id JOIN sh sb ON cand.doc_b = sb.doc_id)), " +
      s"edges AS (SELECT doc_a, doc_b FROM jac WHERE jaccard_milli >= ${LlmOps.ResolveThreshold} " +
      s"UNION ALL SELECT doc_b, doc_a FROM jac WHERE jaccard_milli >= ${LlmOps.ResolveThreshold}), " +
      "reach(a, b) AS (SELECT doc_id, doc_id FROM documents UNION SELECT r.a, e.doc_b FROM reach r JOIN edges e ON r.b = e.doc_a)"

  private lazy val d7ResolveSql: String =
    duckCcCte + " SELECT a AS doc_id, min(b) AS canonical_id FROM reach GROUP BY a"

  private lazy val d13SplitSql: String =
    duckCcCte + ", cc AS (SELECT a AS doc_id, min(b) AS canonical_id FROM reach GROUP BY a), " +
      s"bk AS (SELECT doc_id, canonical_id, ${duckBucketOn("canonical_id")} AS bucket FROM cc) " +
      "SELECT doc_id, canonical_id, CAST(bucket AS BIGINT) AS bucket, " +
      "CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split FROM bk"

  private lazy val d12QualitySql: String =
    duckCcCte + ", cc AS (SELECT a AS doc_id, min(b) AS canonical_id FROM reach GROUP BY a), " +
      "c AS (SELECT doc_id, len(tok)::BIGINT AS n, len(list_distinct(tok))::BIGINT AS u, " +
      "len(list_filter(tok, t -> t IN ('the', 'a')))::BIGINT AS stop FROM tokd), " +
      // COALESCE(-1) mirrors the Spark side's null-quality pin (see
      // LlmOps.withPinnedQuality): without it a NULL-text doc's group
      // vanishes here (window-max ignores NULLs, `quality = mq` then
      // filters the whole group) while the engine keeps the row.
      "q AS (SELECT doc_id, coalesce((400*(n - stop)) // n + least(3*n, 300) + (300*u) // n, -1) AS quality_milli FROM c), " +
      "j AS (SELECT cc.doc_id, cc.canonical_id, q.quality_milli FROM cc JOIN q USING (doc_id)), " +
      "w AS (SELECT canonical_id, min(doc_id) AS keep_id FROM (" +
      "SELECT doc_id, canonical_id, quality_milli, max(quality_milli) OVER (PARTITION BY canonical_id) AS mq FROM j) " +
      "WHERE quality_milli = mq GROUP BY canonical_id) " +
      "SELECT j.doc_id, j.canonical_id, w.keep_id, CAST(j.doc_id = w.keep_id AS BIGINT) AS is_kept " +
      "FROM j JOIN w USING (canonical_id)"

  /** The near-dup curation manifest twin, split CTEs-vs-select so the
    * coverage-gated variant (q_curation_coverage) can extend the same
    * chain with the t31 coverage CTEs and one more drop rule.
    */
  private lazy val curationNeardupCtes: String =
    duckCcCte + ", cc AS (SELECT a AS doc_id, min(b) AS canonical_id FROM reach GROUP BY a), " +
      "c AS (SELECT doc_id, len(tok)::BIGINT AS n, len(list_distinct(tok))::BIGINT AS u, " +
      "len(list_filter(tok, t -> t IN ('the', 'a')))::BIGINT AS stop FROM tokd), " +
      "q AS (SELECT doc_id, coalesce((400*(n - stop)) // n + least(3*n, 300) + (300*u) // n, -1) AS quality_milli FROM c), " +
      "j AS (SELECT cc.doc_id, cc.canonical_id, q.quality_milli FROM cc JOIN q USING (doc_id)), " +
      "w AS (SELECT canonical_id, min(doc_id) AS keep_id FROM (" +
      "SELECT doc_id, canonical_id, quality_milli, max(quality_milli) OVER (PARTITION BY canonical_id) AS mq FROM j) " +
      "WHERE quality_milli = mq GROUP BY canonical_id), " +
      "kept AS (SELECT j.doc_id FROM j JOIN w USING (canonical_id) WHERE j.doc_id = w.keep_id), " +
      "quality_ok AS (SELECT doc_id FROM q WHERE quality_milli >= 400), " +
      "shr AS (SELECT doc_id, unnest(s) AS shingle FROM sh), " +
      s"bench AS (SELECT DISTINCT shingle FROM shr WHERE doc_id < ${LlmOps.BenchmarkDocs}), " +
      s"cont AS (SELECT DISTINCT shr.doc_id FROM shr JOIN bench USING (shingle) WHERE shr.doc_id >= ${LlmOps.BenchmarkDocs}), " +
      "samp AS (SELECT doc_id, source, " +
      "" + duckBucket + " AS bucket, " +
      "CASE WHEN source = 'src0' THEN 100 WHEN source IN ('src1', 'src2', 'src3') THEN 50 ELSE 20 END AS rate_pct " +
      "FROM documents), " +
      "spl AS (SELECT doc_id, CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split " +
      "FROM (SELECT doc_id, " + duckBucket + " AS bucket FROM documents))"

  /** The manifest select over [[curationNeardupCtes]]; extra join/where
    * hooks carry the coverage gate (empty for the base manifest).
    */
  private def curationSelect(extraJoin: String, extraWhere: String): String =
    "SELECT s.doc_id, s.source, CAST(s.bucket AS BIGINT) AS bucket, spl.split " +
      "FROM samp s " +
      "JOIN kept ON s.doc_id = kept.doc_id " +
      "JOIN quality_ok ON s.doc_id = quality_ok.doc_id " +
      "LEFT JOIN cont ON s.doc_id = cont.doc_id " +
      "JOIN spl ON s.doc_id = spl.doc_id " + extraJoin +
      s"WHERE s.bucket < s.rate_pct AND s.doc_id >= ${LlmOps.BenchmarkDocs} " +
      s"AND cont.doc_id IS NULL$extraWhere"

  private lazy val curationNeardupSql: String =
    curationNeardupCtes + " " + curationSelect("", "")

  /** q_curation_coverage twin: the near-dup manifest chain + the t31
    * coverage CTEs + the ceiling drop rule — the oracle recomputes the
    * labels and the rolling hashes in full; the engine's stored label
    * index and pinned rolled scan are pure optimizations under this
    * statement.
    */
  private lazy val curationCoverageSql: String =
    curationNeardupCtes + ", " + spanCoverageCtes +
      ", covbad AS (SELECT pw.doc_id FROM pw LEFT JOIN dw USING (doc_id) " +
      "WHERE (2000 * coalesce(dw.n_dup_windows, 0) + pw.n_windows) // (2 * pw.n_windows) > " +
      s"${LlmOps.CoverageCeilingMilli}) " +
      curationSelect("LEFT JOIN covbad ON s.doc_id = covbad.doc_id ",
        " AND covbad.doc_id IS NULL")

  private val llmOracle: Map[String, String] = Map(
    "d1_dedup_exact" ->
      "SELECT md5(text) AS text_hash, min(doc_id) AS canonical_doc_id, count(*) AS n_copies FROM documents GROUP BY md5(text)",
    // d10 twin: the same normalization fold, token for token — DuckDB's
    // regexp_replace needs the explicit 'g' flag for global semantics
    // (Spark's is global by default).
    "d10_norm_dedup" ->
      ("SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_hash, " +
        "min(doc_id) AS canonical_doc_id, count(*) AS n_copies FROM documents " +
        "GROUP BY 1"),
    // d10b twin: DuckDB's nfc_normalize is the same UAX #15 canonical
    // composition the engine's native expression wraps; the rest of the
    // fold is the d10 pattern minus the ASCII flattening.
    "d10b_nfc_dedup" ->
      ("SELECT md5(trim(regexp_replace(lower(nfc_normalize(text)), ' +', ' ', 'g'))) AS norm_hash, " +
        "min(doc_id) AS canonical_doc_id, count(*) AS n_copies FROM documents " +
        "GROUP BY 1"),
    // Band-skew monitor twin: identical banding pipeline to d2, reduced
    // to per-bucket occupancy with the same LshBucketCap drop flag.
    "d11_band_stats" ->
      (s"WITH tokd AS ($duckTok), " +
        s"sh AS (SELECT doc_id, $duckShingles AS s FROM tokd WHERE len(tok) >= 3), " +
        s"sig AS (SELECT doc_id, ${duckSeededSig} AS g FROM sh), " +
        s"bands0 AS (SELECT doc_id, b, md5(array_to_string(g[b*${LlmOps.RowsPerBand}+1 : b*${LlmOps.RowsPerBand}+${LlmOps.RowsPerBand}], '|')) AS bkey FROM sig CROSS JOIN (VALUES (0),(1),(2),(3)) AS t(b)) " +
        "SELECT b AS band, bkey, CAST(count(*) AS BIGINT) AS n_docs, " +
        s"count(*) > ${LlmOps.LshBucketCap} AS dropped FROM bands0 GROUP BY b, bkey"),
    "d2_dedup_minhash" ->
      (s"WITH tokd AS ($duckTok), " +
        s"sh AS (SELECT doc_id, $duckShingles AS s FROM tokd WHERE len(tok) >= 3), " +
        s"sig AS (SELECT doc_id, ${duckSeededSig} AS g FROM sh), " +
        s"bands0 AS (SELECT doc_id, b, md5(array_to_string(g[b*${LlmOps.RowsPerBand}+1 : b*${LlmOps.RowsPerBand}+${LlmOps.RowsPerBand}], '|')) AS bkey FROM sig CROSS JOIN (VALUES (0),(1),(2),(3)) AS t(b)), " +
        // Band-skew ceiling mirrored from capBandBuckets: over-cap
        // buckets are degenerate clusters, not near-dup candidates.
        s"bands AS (SELECT * FROM bands0 WHERE (b, bkey) IN (SELECT (b, bkey) FROM bands0 GROUP BY b, bkey HAVING count(*) <= ${LlmOps.LshBucketCap})), " +
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id) " +
        "SELECT doc_a, doc_b, (2000*i + u) // (2*u) AS jaccard_milli FROM (" +
        "SELECT doc_a, doc_b, len(list_intersect(sa.s, sb.s)) AS i, len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS u " +
        "FROM cand JOIN sh sa ON cand.doc_a = sa.doc_id JOIN sh sb ON cand.doc_b = sb.doc_id)"),
    "d3_simhash" ->
      (s"WITH tokd AS ($duckTok), " +
        "t8 AS (SELECT doc_id, list_transform(tok, t -> substr(md5(t), 1, 8)) AS tok8 FROM tokd) " +
        "SELECT doc_id, CAST(list_sum(list_transform(range(0, 32), b -> " +
        "CASE WHEN list_sum(list_transform(tok8, t -> " +
        "(((strpos('0123456789abcdef', substr(t, (b // 4) + 1, 1)) - 1 >> (b % 4)) & 1) * 2 - 1))) > 0 " +
        "THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash FROM t8"),
    "d4_ngram_jaccard" ->
      ("WITH tokd AS (SELECT doc_id, source, n_chars // 100 AS len_bucket, text, string_split(text, ' ') AS tok FROM documents), " +
        // len(tok) >= 3 mirrors Spark: docs too short to shingle emit no
        // rows at all, so they can never form candidate pairs (advisor
        // finding — without this, short docs all band-key to md5('')).
        // Shingle ROWS (not per-doc lists) so the same df-ceiling rule as
        // Spark applies: drop shingles with df > n_docs/D4DfDropDiv
        // before sizes and intersections (boilerplate/skew ceiling).
        // The shingle is hashed to the SAME 60-bit int64 the Spark side
        // shuffles (r17, ADVICE r16): d4's df counts, df-drop ceiling,
        // and block intersections are GLOBAL aggregates, so at corpus
        // scale a hash collision merges df counts / adds intersections —
        // both engines must therefore see identical collisions, which
        // sharing the duckHash60 transformation guarantees by
        // construction (the d5-family verify-set precedent), instead of
        // resting on a corpus-wide injectivity assumption.
        s"shl0 AS (SELECT doc_id, source, len_bucket, unnest($duckShingles) AS sh_s FROM tokd WHERE len(tok) >= 3), " +
        s"shl AS (SELECT doc_id, source, len_bucket, ${duckHash60("sh_s")} AS shingle FROM shl0), " +
        "dfs AS (SELECT shingle, count(*) AS df FROM shl GROUP BY 1), " +
        "nd AS (SELECT count(*) AS n_docs FROM documents), " +
        s"kept AS (SELECT shl.* FROM shl JOIN dfs USING (shingle) CROSS JOIN nd WHERE df * ${LlmOps.D4DfDropDiv} <= n_docs), " +
        "sizes AS (SELECT doc_id, count(*) AS nsh FROM kept GROUP BY 1), " +
        "inter AS (SELECT a.source AS source, a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i " +
        "FROM kept a JOIN kept b ON a.source = b.source AND a.len_bucket = b.len_bucket " +
        "AND a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2, 3) " +
        "SELECT source, doc_a, doc_b, (2000*i + u) // (2*u) AS jaccard_milli FROM (" +
        "SELECT source, doc_a, doc_b, i, na.nsh + nb.nsh - i AS u " +
        "FROM inter JOIN sizes na ON doc_a = na.doc_id JOIN sizes nb ON doc_b = nb.doc_id) " +
        "WHERE (2000*i + u) // (2*u) > 0"),
    "d5_dedup_incremental" -> d5DedupSql,
    "d5b_index_ingest" -> d5DedupSql,
    "d6_simhash_neardup" ->
      (s"WITH tokd AS ($duckTok), " +
        "t8 AS (SELECT doc_id, list_transform(tok, t -> substr(md5(t), 1, 8)) AS tok8 FROM tokd), " +
        "s AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 32), b -> " +
        "CASE WHEN list_sum(list_transform(tok8, t -> " +
        "(((strpos('0123456789abcdef', substr(t, (b // 4) + 1, 1)) - 1 >> (b % 4)) & 1) * 2 - 1))) > 0 " +
        "THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash FROM t8), " +
        "bands0 AS (SELECT doc_id, b, (simhash >> (b * 16)) & 65535 AS bkey FROM s CROSS JOIN (VALUES (0),(1)) t(b)), " +
        s"bands AS (SELECT * FROM bands0 WHERE (b, bkey) IN (SELECT (b, bkey) FROM bands0 GROUP BY b, bkey HAVING count(*) <= ${LlmOps.LshBucketCap})), " +
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id) " +
        "SELECT doc_a, doc_b, CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT) AS hamming " +
        "FROM cand JOIN s sa ON doc_a = sa.doc_id JOIN s sb ON doc_b = sb.doc_id " +
        s"WHERE bit_count(xor(sa.simhash, sb.simhash)) <= ${LlmOps.SimhashMaxHamming}"),
    // Connected-components twin: see duckCcCte.
    "d7_dedup_resolve" -> d7ResolveSql,
    // Label-INDEX variants: the stored bucketed labels and the
    // incremental contracted-graph ingest are pure optimizations, so all
    // three grade against the identical full-recompute twins.
    "d7b_resolve_idx" -> d7ResolveSql,
    "d7c_resolve_ingest" -> d7ResolveSql,
    "d12b_quality_idx" -> d12QualitySql,
    "d13b_split_idx" -> d13SplitSql,
    // d13 = d7's components + t8's hash split keyed on the GROUP id, so
    // near-dup members can never straddle train/test (leakage guard).
    "d13_group_split" -> d13SplitSql,
    // d12 = d7's components + t3's quality, survivor = max quality with a
    // min-doc_id tie-break (window-max + min, not arg_max, so ties are
    // deterministic in both engines).
    "d12_quality_resolve" -> d12QualitySql,
    "t1_text_stats" ->
      (s"WITH tokd AS ($duckTok) " +
        "SELECT doc_id, len(tok)::BIGINT AS n_tokens, len(list_distinct(tok))::BIGINT AS n_uniq_tokens, " +
        "length(text)::BIGINT AS n_chars, " +
        "(2000*(length(text) - (len(tok) - 1)) + len(tok)) // (2*len(tok)) AS avg_token_len_milli, " +
        "(2000*len(list_distinct(tok)) + len(tok)) // (2*len(tok)) AS ttr_milli FROM tokd"),
    "t2_lang_id" ->
      (s"WITH s AS (SELECT doc_id, lang, ${duckOcc("th")} + ${duckOcc("he")} AS s_en, " +
        s"${duckOcc("ch")} + ${duckOcc("ei")} AS s_de, ${duckOcc("le")} + ${duckOcc("es")} AS s_fr, " +
        s"${duckOcc("os")} + ${duckOcc("la")} AS s_es FROM documents) " +
        "SELECT doc_id, lang, s_en, s_de, s_fr, s_es, " +
        "CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en' " +
        "WHEN s_de >= s_fr AND s_de >= s_es THEN 'de' " +
        "WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS predicted_lang FROM s"),
    "t3_quality_score" ->
      (s"WITH tokd AS ($duckTok), " +
        "c AS (SELECT doc_id, len(tok)::BIGINT AS n, len(list_distinct(tok))::BIGINT AS u, " +
        "len(list_filter(tok, t -> t IN ('the', 'a')))::BIGINT AS stop FROM tokd), " +
        "q AS (SELECT doc_id, n, stop, (400*(n - stop)) // n + least(3*n, 300) + (300*u) // n AS quality_milli FROM c) " +
        "SELECT doc_id, n AS n_tokens, stop AS n_stopwords, quality_milli, " +
        "CASE WHEN quality_milli >= 600 THEN 'high' WHEN quality_milli >= 400 THEN 'medium' ELSE 'low' END AS tier FROM q"),
    "t4_fingerprint" ->
      ("SELECT doc_id, md5(text) AS doc_md5, " +
        "CASE WHEN length(text) < 5 THEN md5(text) ELSE list_min(list_transform(range(1, length(text) - 3), i -> md5(substr(text, i, 5)))) END AS min_shingle_hash " +
        "FROM documents"),
    "t5_token_estimate" ->
      (s"WITH tokd AS ($duckTok) " +
        "SELECT doc_id, len(tok)::BIGINT AS n_ws_tokens, " +
        "CAST(list_sum(list_transform(tok, t -> (length(t) + 3) // 4)) AS BIGINT) AS n_subword_est FROM tokd"),
    "t6_pii_scrub" ->
      // Counts audit actual replacements: each stage counts on the text
      // it scrubbed (emails on raw, URLs post-email, digits post-both).
      ("""WITH st AS (SELECT doc_id, text, """ +
        """regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1 FROM documents), """ +
        """st2 AS (SELECT doc_id, text, t1, regexp_replace(t1, 'https?://[^\s]+', '<URL>', 'g') AS t2 FROM st) """ +
        """SELECT doc_id, md5(regexp_replace(t2, '[0-9]{3,}', '<NUM>', 'g')) AS scrubbed_md5, """ +
        """len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails, """ +
        """len(regexp_extract_all(t1, 'https?://[^\s]+'))::BIGINT AS n_urls, """ +
        """len(regexp_extract_all(t2, '[0-9]{3,}'))::BIGINT AS n_digit_runs FROM st2"""),
    "t7_token_freq" ->
      (s"WITH tokd AS ($duckTok) " +
        "SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df FROM " +
        "(SELECT doc_id, unnest(tok) AS tok FROM tokd) GROUP BY tok"),
    "t8_hash_split" ->
      ("WITH b AS (SELECT doc_id, source, " +
        "" + duckBucket + " AS bucket " +
        "FROM documents) " +
        "SELECT doc_id, source, CAST(bucket AS BIGINT) AS bucket, " +
        "CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split FROM b"),
  )

  // Rabin-Karp window-hash constants shared with RollingMinHash: the
  // oracle brute-forces Σ code·B^(w−1−j) mod M per window; the engine's
  // rolling update computes the identical polynomial.
  /** Shared dHash pipeline CTE (WITH ... ph(doc_id, phash)) — m5's twin
    * SELECTs from it directly; m6's twin appends the banded-candidate
    * join. One string so the two can never de-sync.
    */
  private val duckPhashCte: String = {
    import graft.operators.Multimodal.{GridH, GridW}
    def gray(gx: Int, gy: Int): String = {
      val idx = s"((($gy * h) // $GridH) * w + (($gx * w) // ${GridW + 1}))"
      val at = (k: Int) => s"ord(substr(pix, CAST($idx * 3 + $k AS INTEGER), 1))"
      s"((${at(1)} + ${at(2)} + ${at(3)}) // 3)"
    }
    val bits = (for { gy <- 0 until GridH; gx <- 0 until GridW } yield
      s"(CASE WHEN ${gray(gx, gy)} > ${gray(gx + 1, gy)} " +
        s"THEN ${1L << (gy * GridW + gx)} ELSE 0 END)").mkString(" + ")
    "WITH g AS (SELECT doc_id, CAST(1 + n_chars % 16 AS INTEGER) AS w, " +
      "CAST(1 + n_chars % 12 AS INTEGER) AS h, text FROM documents), " +
      "p AS (SELECT doc_id, w, h, rpad(substr(text, 1, w * h * 3), w * h * 3, 'x') AS pix FROM g), " +
      s"ph AS (SELECT doc_id, $bits AS phash FROM p)"
  }

  // Winnowed-dup twin: the same rolling-hash polynomial brute-forced per
  // position, the same packed (hash · 2^20 + reversed-pos) frame min —
  // so hash ties resolve to the identical rightmost position — then
  // t19's pipeline tail replayed on the selected subset.
  private val winnowDupSql: String = {
    import graft.functions.RollingMinHash.{Base, Mod}
    val w = LlmOps.SpanWindow
    val ww = LlmOps.WinnowWindow
    val pk = LlmOps.WinnowPosPack
    val pows = (0 until w).map { j =>
      (0 until (w - 1 - j)).foldLeft(1L)((p, _) => p * Base % Mod)
    }
    val terms = pows.zipWithIndex
      .map { case (p, j) => s"CAST(ord(substr(text, i + $j, 1)) AS BIGINT) * $p" }.mkString(" + ")
    // r15 pre-chunk replay (the engine's preChunkSegments, token for
    // token): ≥ 2^20-char docs are cut into ≤ (2^20 − 1)-char segments
    // overlapping by SpanWindow + WinnowWindow − 1, winnowed per
    // segment with LOCAL positions (which fit the packed encoding by
    // construction), mapped back to global positions via the segment
    // offset. Sub-2^20 docs produce exactly one whole-text segment, so
    // the common case is byte-identical to the unchunked pipeline.
    val maxLen = pk - 1
    val overlap = w + ww - 1
    val stride = maxLen - overlap
    s"WITH seg AS (SELECT doc_id, k * $stride AS off, substr(text, CAST(k * $stride + 1 AS BIGINT), $maxLen) AS text FROM " +
      s"(SELECT doc_id, text, unnest(range(0, CASE WHEN length(text) <= $maxLen THEN 1 " +
      s"ELSE (length(text) - $maxLen + $stride - 1) // $stride + 1 END)) AS k " +
      s"FROM documents WHERE length(text) >= $w)), " +
      s"hs AS (SELECT doc_id, off, i, ($terms) % $Mod AS hash FROM " +
      s"(SELECT doc_id, off, text, unnest(range(1, length(text) - ${w - 2})) AS i FROM seg WHERE length(text) >= $w)), " +
      s"sw AS (SELECT doc_id, off, count(*) OVER win AS nw, " +
      s"min(hash * $pk + ($pk - 1 - (i - 1))) OVER win AS sel FROM hs " +
      s"WINDOW win AS (PARTITION BY doc_id, off ORDER BY i ROWS BETWEEN CURRENT ROW AND ${ww - 1} FOLLOWING)), " +
      s"selected AS (SELECT DISTINCT doc_id, off + $pk - 1 - (sel % $pk) AS pos, sel // $pk AS hash FROM sw WHERE nw = $ww), " +
      "pd AS (SELECT doc_id, hash, min(pos) AS pos FROM selected GROUP BY 1, 2), " +
      "cd AS (SELECT hash FROM pd GROUP BY hash HAVING count(*) >= 2), " +
      s"ver AS (SELECT md5(substr(d.text, CAST(pd.pos + 1 AS INTEGER), $w)) AS span_md5 " +
      "FROM pd JOIN cd USING (hash) JOIN documents d USING (doc_id)) " +
      "SELECT span_md5, CAST(count(*) AS BIGINT) AS n_docs FROM ver GROUP BY 1 HAVING count(*) >= 2"
  }

  private val rkSql: String = {
    import graft.functions.RollingMinHash.{Base, Mod}
    val w = LlmOps.RollingWindow
    val pows = (0 until w).map { j =>
      (0 until (w - 1 - j)).foldLeft(1L)((p, _) => p * Base % Mod)
    }
    val terms = pows.zipWithIndex
      .map { case (p, j) => s"CAST(ord(substr(text, i + $j, 1)) AS BIGINT) * $p" }.mkString(" + ")
    s"SELECT doc_id, CAST(list_min(list_transform(range(1, length(text) - ${w - 2}), " +
      s"i -> ($terms) % $Mod)) AS BIGINT) AS rk_fingerprint FROM documents " +
      s"WHERE length(text) >= $w"
  }

  // CDC twin: the same Rabin-Karp polynomial brute-forced per position,
  // the same mod-64 boundary rule, spans via lead, md5 per chunk.
  private val cdcSql: String = {
    import graft.functions.RollingMinHash.{Base, Mod}
    val w = LlmOps.CdcWindow
    val pows = (0 until w).map { j =>
      (0 until (w - 1 - j)).foldLeft(1L)((p, _) => p * Base % Mod)
    }
    val terms = pows.zipWithIndex
      .map { case (p, j) => s"CAST(ord(substr(text, i + $j, 1)) AS BIGINT) * $p" }.mkString(" + ")
    s"WITH hs AS (SELECT doc_id, i, ($terms) % $Mod AS hash FROM " +
      s"(SELECT doc_id, text, unnest(range(1, length(text) - $w + 2)) AS i FROM documents WHERE length(text) >= $w)), " +
      s"b AS (SELECT doc_id, 0 AS pos FROM documents UNION SELECT doc_id, i - 1 FROM hs WHERE hash % ${LlmOps.CdcModulus} = 0 AND i > 1), " +
      "c AS (SELECT doc_id, pos, lead(pos) OVER win AS next_pos, " +
      "CAST(row_number() OVER win - 1 AS BIGINT) AS chunk_idx FROM b " +
      "WINDOW win AS (PARTITION BY doc_id ORDER BY pos)) " +
      "SELECT c.doc_id, chunk_idx, CAST(pos AS BIGINT) AS chunk_start, " +
      "CAST(coalesce(next_pos, length(text)) - pos AS BIGINT) AS chunk_len, " +
      "md5(substr(text, pos + 1, coalesce(next_pos, length(text)) - pos)) AS chunk_md5 " +
      "FROM c JOIN documents d ON c.doc_id = d.doc_id"
  }

  // Duplicated-span twin: the same rolling-hash polynomial brute-forced
  // per position, then the ENGINE'S pipeline replayed — per-doc min-pos
  // per hash, cross-doc hash gate, md5 verify — so hash-collision
  // behavior is mirrored exactly (a direct substring group-by would
  // diverge whenever two spans in one doc collide).
  private val dupSpanSql: String = {
    import graft.functions.RollingMinHash.{Base, Mod}
    val w = LlmOps.SpanWindow
    val pows = (0 until w).map { j =>
      (0 until (w - 1 - j)).foldLeft(1L)((p, _) => p * Base % Mod)
    }
    val terms = pows.zipWithIndex
      .map { case (p, j) => s"CAST(ord(substr(text, i + $j, 1)) AS BIGINT) * $p" }.mkString(" + ")
    s"WITH hs AS (SELECT doc_id, i, ($terms) % $Mod AS hash FROM " +
      s"(SELECT doc_id, text, unnest(range(1, length(text) - ${w - 2})) AS i FROM documents WHERE length(text) >= $w)), " +
      "pd AS (SELECT doc_id, hash, min(i) AS i FROM hs GROUP BY 1, 2), " +
      "cd AS (SELECT hash FROM pd GROUP BY hash HAVING count(*) >= 2), " +
      s"ver AS (SELECT md5(substr(d.text, pd.i, $w)) AS span_md5 FROM pd JOIN cd USING (hash) JOIN documents d USING (doc_id)) " +
      "SELECT span_md5, CAST(count(*) AS BIGINT) AS n_docs FROM ver GROUP BY 1 HAVING count(*) >= 2"
  }

  // Coverage twin: the same per-position polynomial, then the engine's
  // pipeline replayed — per-doc window count, distinct-(doc,hash)
  // cross-doc gate, position-counting dup join — so hash-collision
  // behavior is mirrored exactly.
  /** t31's CTE chain (hs/pw/xd/dw), shared with the q_curation_coverage
    * twin — the rolling-hash replay, per-doc window counts, the ≥2-doc
    * cross-doc gate, and per-doc duplicated-window counts.
    */
  private lazy val spanCoverageCtes: String = {
    import graft.functions.RollingMinHash.{Base, Mod}
    val w = LlmOps.SpanWindow
    val pows = (0 until w).map { j =>
      (0 until (w - 1 - j)).foldLeft(1L)((p, _) => p * Base % Mod)
    }
    val terms = pows.zipWithIndex
      .map { case (p, j) => s"CAST(ord(substr(text, i + $j, 1)) AS BIGINT) * $p" }.mkString(" + ")
    s"hs AS (SELECT doc_id, i, ($terms) % $Mod AS hash FROM " +
      s"(SELECT doc_id, text, unnest(range(1, length(text) - ${w - 2})) AS i FROM documents WHERE length(text) >= $w)), " +
      "pw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows FROM hs GROUP BY 1), " +
      "xd AS (SELECT hash FROM (SELECT DISTINCT doc_id, hash FROM hs) GROUP BY hash HAVING count(*) >= 2), " +
      "dw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows FROM hs JOIN xd USING (hash) GROUP BY 1)"
  }

  private lazy val spanCoverageSql: String =
    s"WITH $spanCoverageCtes " +
      "SELECT pw.doc_id, pw.n_windows, CAST(coalesce(dw.n_dup_windows, 0) AS BIGINT) AS n_dup_windows, " +
      "(2000 * coalesce(dw.n_dup_windows, 0) + pw.n_windows) // (2 * pw.n_windows) AS dup_coverage_milli " +
      "FROM pw LEFT JOIN dw USING (doc_id)"

  private val llmOracle2: Map[String, String] = Map(
    "t13_rolling_fp" -> rkSql,
    "t18_cdc_chunks" -> cdcSql,
    "t19_dup_spans" -> dupSpanSql,
    "t31_span_coverage" -> spanCoverageSql,
    "t29_winnow_dups" -> winnowDupSql,
    // Span-index ingest: pure optimization, identical twin (winnowing is
    // per-document, so stored ∪ batch fingerprints = full recompute's).
    "t29b_winnow_ingest" -> winnowDupSql,
    // Stored-index read path (r14): the whole-corpus fingerprint table
    // IS the recompute's fingerprint set — same oracle again.
    "t19b_dup_spans_idx" -> winnowDupSql,
    "t30_bpe_learn" -> t30LearnSql,
    "st14_stream_neardup" -> st14NeardupSql,
    // Inverted-index twin: distinct (shingle, doc) rows, df band filter,
    // posting truncation via row_number — the engine's collect/sort/slice
    // must produce the identical comma string.
    "t17_inverted_index" ->
      (s"WITH tokd AS ($duckTok), " +
        s"sh AS (SELECT DISTINCT doc_id, shingle FROM (SELECT doc_id, unnest($duckShingles) AS shingle FROM tokd WHERE len(tok) >= 3)), " +
        "d AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle HAVING count(*) BETWEEN 2 AND 50), " +
        "r AS (SELECT sh.shingle, d.df, sh.doc_id, row_number() OVER (PARTITION BY sh.shingle ORDER BY sh.doc_id) AS rn FROM sh JOIN d USING (shingle)) " +
        "SELECT shingle, df, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings " +
        "FROM r WHERE rn <= 8 GROUP BY shingle, df"),
    "t12_stopwords" ->
      (s"WITH tokd AS ($duckTok), " +
        "v AS (SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df FROM " +
        "(SELECT doc_id, unnest(tok) AS tok FROM tokd) GROUP BY tok) " +
        "SELECT tok, tf, df FROM v WHERE df * 2 > (SELECT count(*) FROM documents)"),
    // Offset-based sequence packing: identical integer prefix-sum + div;
    // CAST on every windowed/summed integer (DuckDB promotes to HUGEINT).
    "t14_pack" ->
      (s"WITH d AS (SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents), " +
        "c AS (SELECT source, n_tokens, CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens FROM d), " +
        s"b AS (SELECT source, n_tokens, (cum_tokens - n_tokens) // ${LlmOps.PackBudget} AS bin, " +
        s"CASE WHEN (cum_tokens - 1) // ${LlmOps.PackBudget} > (cum_tokens - n_tokens) // ${LlmOps.PackBudget} THEN 1 ELSE 0 END AS straddles FROM c) " +
        "SELECT source, bin, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens, " +
        "CAST(sum(straddles) AS BIGINT) AS n_straddling FROM b GROUP BY source, bin"),
    // Sliding-window chunking: DuckDB's 1-based inclusive list slice
    // tok[a:b] clamps exactly like Spark's slice(tok, a, n).
    "t15_chunk" ->
      (s"WITH d AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents), " +
        s"s AS (SELECT doc_id, tok, unnest(generate_series(0, len(tok) - 1, ${LlmOps.ChunkStride})) AS start FROM d) " +
        s"SELECT doc_id, CAST(start // ${LlmOps.ChunkStride} AS BIGINT) AS chunk_idx, " +
        s"CAST(len(tok[start + 1 : start + ${LlmOps.ChunkSize}]) AS BIGINT) AS chunk_tokens, " +
        s"md5(array_to_string(tok[start + 1 : start + ${LlmOps.ChunkSize}], ' ')) AS chunk_md5 FROM s"),
    // Fixed-point tf-idf: rarity = (n_docs * 1e6) div df — pure integer
    // weighting, so no log/float parity trap exists by construction.
    "t16_tfidf" ->
      ("WITH tokd AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents), " +
        "vocab AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tokd GROUP BY tok), " +
        "n AS (SELECT count(*) AS n_docs FROM documents), " +
        "r AS (SELECT tok, CAST((n_docs * 1000000) // df AS BIGINT) AS rarity FROM vocab, n), " +
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM tokd GROUP BY doc_id, tok) " +
        "SELECT doc_id, CAST(sum(tf * rarity) AS BIGINT) AS tfidf_score, " +
        "CAST(max(rarity) AS BIGINT) AS max_rarity, count(*) AS n_terms " +
        "FROM tf JOIN r USING (tok) GROUP BY doc_id"),
    "t9_repetition" ->
      ("WITH tokd AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents), " +
        "bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tok)), i -> tok[i] || ' ' || tok[i+1])) AS bigram FROM tokd WHERE len(tok) >= 2), " +
        "c AS (SELECT doc_id, bigram, count(*) AS tf FROM bg GROUP BY doc_id, bigram) " +
        "SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams, CAST(max(tf) AS BIGINT) AS max_tf, " +
        "CAST((2000 * max(tf) + sum(tf)) // (2 * sum(tf)) AS BIGINT) AS top_bigram_milli " +
        "FROM c GROUP BY doc_id"),
    "t10_mixture_sample" ->
      ("WITH b AS (SELECT doc_id, source, " +
        "" + duckBucket + " AS bucket, " +
        "CASE WHEN source = 'src0' THEN 100 WHEN source IN ('src1', 'src2', 'src3') THEN 50 ELSE 20 END AS rate_pct " +
        "FROM documents) " +
        "SELECT doc_id, source, CAST(bucket AS BIGINT) AS bucket FROM b WHERE bucket < rate_pct"),
    "t11_decontaminate" ->
      (s"WITH tokd AS ($duckTok), " +
        s"sh AS (SELECT doc_id, unnest($duckShingles) AS shingle FROM tokd WHERE len(tok) >= 3), " +
        s"bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < ${LlmOps.BenchmarkDocs}) " +
        s"SELECT doc_id, count(*) AS n_shared_shingles FROM sh JOIN bench USING (shingle) " +
        s"WHERE doc_id >= ${LlmOps.BenchmarkDocs} GROUP BY doc_id"),
    // The composed curation pass: every CTE is the corresponding
    // component oracle; the final SELECT applies the same keep rules.
    "q_curation_pipeline" ->
      (s"WITH tokd AS ($duckTok), " +
        "canon AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)), " +
        "c AS (SELECT doc_id, len(tok)::BIGINT AS n, len(list_distinct(tok))::BIGINT AS u, " +
        "len(list_filter(tok, t -> t IN ('the', 'a')))::BIGINT AS stop FROM tokd), " +
        "q AS (SELECT doc_id, (400*(n - stop)) // n + least(3*n, 300) + (300*u) // n AS quality_milli FROM c), " +
        "quality_ok AS (SELECT doc_id FROM q WHERE quality_milli >= 400), " +
        s"sh AS (SELECT doc_id, unnest($duckShingles) AS shingle FROM tokd WHERE len(tok) >= 3), " +
        s"bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < ${LlmOps.BenchmarkDocs}), " +
        s"cont AS (SELECT DISTINCT sh.doc_id FROM sh JOIN bench USING (shingle) WHERE sh.doc_id >= ${LlmOps.BenchmarkDocs}), " +
        "samp AS (SELECT doc_id, source, " +
        "" + duckBucket + " AS bucket, " +
        "CASE WHEN source = 'src0' THEN 100 WHEN source IN ('src1', 'src2', 'src3') THEN 50 ELSE 20 END AS rate_pct " +
        "FROM documents), " +
        "spl AS (SELECT doc_id, CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split " +
        "FROM (SELECT doc_id, " + duckBucket + " AS bucket FROM documents)) " +
        "SELECT s.doc_id, s.source, CAST(s.bucket AS BIGINT) AS bucket, spl.split " +
        "FROM samp s " +
        "JOIN canon ON s.doc_id = canon.doc_id " +
        "JOIN quality_ok ON s.doc_id = quality_ok.doc_id " +
        "LEFT JOIN cont ON s.doc_id = cont.doc_id " +
        "JOIN spl ON s.doc_id = spl.doc_id " +
        s"WHERE s.bucket < s.rate_pct AND s.doc_id >= ${LlmOps.BenchmarkDocs} AND cont.doc_id IS NULL"),
    // Near-dup-aware curation twin: the d12 chain (CC components +
    // quality election) supplies stage 1's keep set — `kept` is exactly
    // d12's is_kept = 1 rows — and the remaining stages replay the
    // q_curation_pipeline CTEs. duckCcCte's `sh` holds per-doc shingle
    // LISTS, so the contamination stage unnests it (shr) instead of
    // rebuilding shingles.
    "q_curation_neardup" -> curationNeardupSql,
    // Same pipeline with resolution read from the maintained label index
    // — a pure optimization, identical twin.
    "q_curation_neardup_idx" -> curationNeardupSql,
    "q_curation_coverage" -> curationCoverageSql,
    // BPE-encode twin: the same ranked merge list (count desc, a, b —
    // row_number here, the struct-sort trick on the Spark side) and the
    // same nested fold — DuckDB's list_reduce seeds the accumulator with
    // the FIRST list element, so the word state is prepended to the
    // merge list and the inner fold's accumulator starts at the word's
    // first symbol, exactly like Spark's explicit zero argument. The
    // coalesce([]) keeps a merge-free degenerate corpus folding to the
    // initial state instead of NULL (DuckDB's list() over zero rows).
    "t28_bpe_encode" ->
      ("WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents), " +
        "w AS (SELECT tok, count(*) AS freq FROM toks WHERE length(tok) >= 1 GROUP BY tok), " +
        "p AS (SELECT substr(tok, CAST(i AS INT), 1) AS a, substr(tok, CAST(i AS INT) + 1, 1) AS b, freq " +
        "FROM (SELECT tok, freq, unnest(range(1, length(tok))) AS i FROM w WHERE length(tok) >= 2)), " +
        "pc AS (SELECT a, b, CAST(sum(freq) AS BIGINT) AS pair_count FROM p GROUP BY a, b), " +
        "rk AS (SELECT a, b, row_number() OVER (ORDER BY pair_count DESC, a, b) AS rn FROM pc), " +
        s"ml AS (SELECT coalesce(list(a || ' ' || b ORDER BY rn), []) AS merges FROM rk WHERE rn <= ${LlmOps.NumMerges}), " +
        "enc AS (SELECT tok, freq, list_reduce(list_prepend(" +
        "array_to_string(list_transform(range(1, length(tok) + 1), i -> substr(tok, CAST(i AS INT), 1)), ' '), merges), " +
        "(wd, m) -> list_reduce(string_split(wd, ' '), (acc, x) -> " +
        "CASE WHEN regexp_extract(acc, '[^ ]+$') = string_split(m, ' ')[1] AND x = string_split(m, ' ')[2] " +
        "THEN regexp_replace(acc, '[^ ]+$', '') || string_split(m, ' ')[1] || string_split(m, ' ')[2] " +
        "ELSE acc || ' ' || x END)) AS encoded FROM w CROSS JOIN ml), " +
        "sym AS (SELECT tok, freq, unnest(string_split(encoded, ' ')) AS symbol FROM enc) " +
        "SELECT symbol, CAST(sum(freq) AS BIGINT) AS token_count, " +
        "count(DISTINCT tok) AS n_words FROM sym GROUP BY symbol"),
  )

  // -- Similarity oracles ---------------------------------------------
  // Vector math in double; cosines exported as floor(1000x + 0.5) ints;
  // rank key (cos_milli DESC, vec_id) matches the Spark window exactly.

  private def cosOf(a: String, b: String): String =
    s"CAST(floor(1000 * (list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))) + 0.5) AS BIGINT)"

  /** One IVF top-k twin, two physical forms (sim_ivf_topk recomputes the
    * assignment, sim_ivf_idx reads the stored inverted lists) — the
    * triangle lesson: never paste an oracle pipeline twice.
    */
  private lazy val duckIvfTopkSql: String =
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
      s"pv AS (SELECT vec_id AS p, emb AS pe FROM e WHERE vec_id < ${Similarity.NumIvfPivots}), " +
      // inverted lists: nearest pivot per vector (max cos, ties to lowest p)
      s"asg AS (SELECT vec_id, emb, pvt FROM (SELECT e.vec_id, e.emb, pv.p AS pvt, " +
      s"row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cosOf("e.emb", "pv.pe")} DESC, pv.p) AS rn " +
      "FROM e CROSS JOIN pv) WHERE rn = 1), " +
      // queries probe their 2 nearest pivots
      s"pr AS (SELECT query_id, qe, pvt FROM (SELECT e.vec_id AS query_id, e.emb AS qe, pv.p AS pvt, " +
      s"row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cosOf("e.emb", "pv.pe")} DESC, pv.p) AS rn " +
      s"FROM e CROSS JOIN pv WHERE e.vec_id < ${Similarity.IvfQueries}) WHERE rn <= ${Similarity.IvfProbes}) " +
      "SELECT query_id, rank, vec_id AS neighbor_id, cos_milli FROM (" +
      s"SELECT pr.query_id, asg.vec_id, ${cosOf("pr.qe", "asg.emb")} AS cos_milli, " +
      s"row_number() OVER (PARTITION BY pr.query_id ORDER BY ${cosOf("pr.qe", "asg.emb")} DESC, asg.vec_id) AS rank " +
      "FROM pr JOIN asg ON pr.pvt = asg.pvt WHERE asg.vec_id != pr.query_id) " +
      s"WHERE rank <= ${Similarity.IvfTopK}"

  /** One recall-curve twin for both sim_ivf_recall forms: the SAME
    * candidate pipeline as sim_ivf_topk (df-for-df), then each sweep
    * point is a filter over the shared candidate CTE — the nesting /
    * one-list arguments that make the Spark side a single build hold
    * identically in SQL.
    */
  private lazy val duckIvfRecallSql: String = {
    import Similarity.{NumIvfPivots => npv, IvfQueries => nq, IvfTopK => k}
    val head =
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
        s"pv AS (SELECT vec_id AS p, emb AS pe FROM e WHERE vec_id < $npv), " +
        s"asg AS (SELECT vec_id, emb, pvt FROM (SELECT e.vec_id, e.emb, pv.p AS pvt, " +
        s"row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cosOf("e.emb", "pv.pe")} DESC, pv.p) AS rn " +
        "FROM e CROSS JOIN pv) WHERE rn = 1), " +
        s"prq AS (SELECT e.vec_id AS query_id, e.emb AS qe, pv.p AS pvt, " +
        s"row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cosOf("e.emb", "pv.pe")} DESC, pv.p) AS pr " +
        s"FROM e CROSS JOIN pv WHERE e.vec_id < $nq), " +
        s"cand AS (SELECT prq.query_id, asg.vec_id, ${cosOf("prq.qe", "asg.emb")} AS cm, prq.pr " +
        "FROM prq JOIN asg ON prq.pvt = asg.pvt WHERE asg.vec_id != prq.query_id), " +
        "exact AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY cm DESC, vec_id) AS rk FROM cand) " +
        s"WHERE rk <= $k), " +
        "exn AS (SELECT count(*) AS n_expected FROM exact)"
    val parts = Similarity.IvfProbeSweep.map { p =>
      s"SELECT CAST($p AS BIGINT) AS probes, h.n_hits, exn.n_expected, " +
        "CASE WHEN exn.n_expected = 0 THEN CAST(0 AS BIGINT) " +
        "ELSE (2000 * h.n_hits + exn.n_expected) // (2 * exn.n_expected) END AS recall_milli " +
        "FROM (SELECT count(*) AS n_hits FROM (SELECT query_id, vec_id FROM " +
        "(SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id ORDER BY cm DESC, vec_id) AS rk " +
        s"FROM cand WHERE pr <= $p) WHERE rk <= $k) t " +
        "JOIN exact USING (query_id, vec_id)) h CROSS JOIN exn"
    }
    head + " " + parts.mkString(" UNION ALL ")
  }

  private val simOracle: Map[String, String] = Map(
    "sim_topk" ->
      ("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
        s"q AS (SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < ${Similarity.NumQueries}), " +
        s"pairs AS (SELECT query_id, vec_id, ${cosOf("qe", "emb")} AS cos_milli FROM e CROSS JOIN q WHERE vec_id != query_id), " +
        "r AS (SELECT query_id, vec_id, cos_milli, row_number() OVER (PARTITION BY query_id ORDER BY cos_milli DESC, vec_id) AS rank FROM pairs) " +
        s"SELECT query_id, rank, vec_id AS neighbor_id, cos_milli FROM r WHERE rank <= ${Similarity.TopK}"),
    "sim_lsh_pairs" ->
      ("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
        s"planes AS (SELECT vec_id AS p, emb AS pe FROM e WHERE vec_id < ${Similarity.NumLshPlanes}), " +
        "buck AS (SELECT vec_id, CAST(sum(CASE WHEN list_dot_product(emb, pe) > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket FROM e CROSS JOIN planes GROUP BY vec_id), " +
        "be AS (SELECT e.vec_id, bucket, emb FROM buck JOIN e ON buck.vec_id = e.vec_id) " +
        "SELECT bucket, vec_a, vec_b, cos_milli FROM (" +
        s"SELECT a.bucket AS bucket, a.vec_id AS vec_a, b.vec_id AS vec_b, ${cosOf("a.emb", "b.emb")} AS cos_milli " +
        "FROM be a JOIN be b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) " +
        s"WHERE cos_milli >= ${Similarity.LshThreshold}"),
    "sim_ivf_topk" -> duckIvfTopkSql,
    // Stored-index twins (r13): IDENTICAL SQL — the index changes where
    // the assignment work happens, never the answer.
    "sim_ivf_idx" -> duckIvfTopkSql,
    // Ingest twin: the same nearest-pivot assignment, restricted to the
    // batch (vec_id ≡ mod−1) — exactly the rows an index append adds.
    "sim_ivf_ingest" ->
      ("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
        s"pv AS (SELECT vec_id AS p, emb AS pe FROM e WHERE vec_id < ${Similarity.NumIvfPivots}), " +
        s"asg AS (SELECT vec_id, pvt FROM (SELECT e.vec_id, pv.p AS pvt, " +
        s"row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cosOf("e.emb", "pv.pe")} DESC, pv.p) AS rn " +
        s"FROM e CROSS JOIN pv WHERE e.vec_id % ${Similarity.IvfIngestMod} = ${Similarity.IvfIngestMod - 1}) WHERE rn = 1) " +
        "SELECT vec_id, pvt AS pivot FROM asg"),
    // Same bucketed-pair CTE as sim_lsh_pairs at the dedup threshold,
    // then the one-hop canonical election over ALL documents.
    "d8_embed_neardup" ->
      ("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
        s"planes AS (SELECT vec_id AS p, emb AS pe FROM e WHERE vec_id < ${Similarity.NumLshPlanes}), " +
        "buck AS (SELECT vec_id, CAST(sum(CASE WHEN list_dot_product(emb, pe) > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket FROM e CROSS JOIN planes GROUP BY vec_id), " +
        "be AS (SELECT e.vec_id, bucket, emb FROM buck JOIN e ON buck.vec_id = e.vec_id), " +
        s"np AS (SELECT vec_a, vec_b FROM (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, ${cosOf("a.emb", "b.emb")} AS cos_milli " +
        "FROM be a JOIN be b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) " +
        s"WHERE cos_milli >= ${Similarity.EmbedDedupThreshold}), " +
        "sym AS (SELECT vec_a AS doc_id, vec_b AS nb FROM np UNION ALL SELECT vec_b, vec_a FROM np), " +
        "neigh AS (SELECT doc_id, min(nb) AS min_nb, count(*) AS n_neardups FROM sym GROUP BY doc_id) " +
        "SELECT d.doc_id, coalesce(n_neardups, 0) AS n_neardups, " +
        "least(d.doc_id, coalesce(min_nb, d.doc_id)) AS canonical_id " +
        "FROM documents d LEFT JOIN neigh ON d.doc_id = neigh.doc_id"),
    // PQ/ADC twin: elements quantized to integer millis first (floor of
    // an exact double product), then EVERY distance is integer-summed
    // squared L2 — order-independent on both engines by construction.
    "sim_pq_topk" ->
      ("WITH raw AS (SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i FROM embeddings), " +
        "e AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim, CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS xm FROM raw), " +
        s"c AS (SELECT vec_id AS c, dim // ${Similarity.PqSubDim} AS m, dim, xm AS cx FROM e WHERE vec_id < ${Similarity.PqCentroids}), " +
        "dist AS (SELECT e.vec_id, c.m, c.c, CAST(sum((e.xm - c.cx) * (e.xm - c.cx)) AS BIGINT) AS d " +
        "FROM e JOIN c ON e.dim = c.dim GROUP BY 1, 2, 3), " +
        "codes AS (SELECT vec_id, m, c FROM (SELECT vec_id, m, c, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, c) AS rn FROM dist) WHERE rn = 1), " +
        s"qd AS (SELECT vec_id AS query_id, m, c, d FROM dist WHERE vec_id < ${Similarity.PqQueries}), " +
        "adc AS (SELECT query_id, codes.vec_id, CAST(sum(d) AS BIGINT) AS adist " +
        "FROM codes JOIN qd ON codes.m = qd.m AND codes.c = qd.c " +
        "WHERE codes.vec_id <> qd.query_id GROUP BY 1, 2) " +
        "SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id, adist " +
        "FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist, vec_id) AS rank FROM adc) " +
        s"WHERE rank <= ${Similarity.PqTopK}"),
    // Identical double expression (127·x/s + 0.5, floor) on both sides —
    // same IEEE ops on the same exact inputs, so floor never diverges.
    "sim_quantize_q8" ->
      ("WITH idx AS (SELECT vec_id, embedding, unnest(range(1, len(embedding) + 1)) AS i FROM embeddings), " +
        "e AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim, CAST(embedding[i] AS DOUBLE) AS x FROM idx), " +
        "s AS (SELECT vec_id, max(abs(x)) AS scale FROM e GROUP BY vec_id) " +
        "SELECT e.vec_id, e.dim, CASE WHEN scale = 0 THEN 0 " +
        "ELSE CAST(floor(CAST(127 AS DOUBLE) * x / scale + 0.5) AS BIGINT) END AS q, scale " +
        "FROM e JOIN s ON e.vec_id = s.vec_id"),
    // Recall-curve twins: the SAME candidate pipelines as sim_ivf_topk /
    // sim_lsh_pairs (df-for-df), then each sweep point is a filter over
    // the shared candidate CTE — the nesting/one-list arguments that make
    // the Spark side a single build hold identically in SQL.
    "sim_ivf_recall" -> duckIvfRecallSql,
    "sim_ivf_recall_idx" -> duckIvfRecallSql,
    "sim_lsh_sweep" -> {
      val ns = Similarity.LshPlaneSweep
      val coarse = ns.min
      val thr = Similarity.LshThreshold
      val bcols = ns.map(n =>
        s"CAST(sum(CASE WHEN d > 0 AND p < $n THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS b$n")
        .mkString(", ")
      val head =
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
          s"pl AS (SELECT vec_id AS p, emb AS pe FROM e WHERE vec_id < ${ns.max}), " +
          "dots AS (SELECT e.vec_id, pl.p, list_dot_product(e.emb, pl.pe) AS d FROM e CROSS JOIN pl), " +
          s"buck AS (SELECT vec_id, $bcols FROM dots GROUP BY vec_id), " +
          "be AS (SELECT buck.*, e.emb FROM buck JOIN e USING (vec_id)), " +
          // Coarse-bucket cap mirror (Similarity.LshSweepBucketCap):
          // over-cap coarse buckets are dropped and counted.
          s"bek AS (SELECT be.* FROM be JOIN (SELECT b$coarse FROM be GROUP BY b$coarse " +
          s"HAVING count(*) <= ${Similarity.LshSweepBucketCap}) k USING (b$coarse)), " +
          "drp AS (SELECT (SELECT count(*) FROM be) - count(*) AS n_dropped_vecs FROM bek), " +
          s"cand AS (SELECT ${ns.map(n => s"a.b$n = b.b$n AS coll$n").mkString(", ")}, " +
          s"${cosOf("a.emb", "b.emb")} AS cm " +
          s"FROM bek a JOIN bek b ON a.b$coarse = b.b$coarse AND a.vec_id < b.vec_id), " +
          s"base AS (SELECT count(*) AS n_base FROM cand WHERE coll$coarse AND cm >= $thr)"
      val parts = ns.map { n =>
        s"SELECT CAST($n AS BIGINT) AS n_planes, c.n_candidates, c.n_pairs, " +
          "CASE WHEN base.n_base = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (2000 * c.n_pairs + base.n_base) // (2 * base.n_base) END AS retention_milli, " +
          "drp.n_dropped_vecs " +
          "FROM (SELECT count(*) AS n_candidates, " +
          s"CAST(coalesce(sum(CASE WHEN cm >= $thr THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_pairs " +
          s"FROM cand WHERE coll$n) c CROSS JOIN base CROSS JOIN drp"
      }
      head + " " + parts.mkString(" UNION ALL ")
    },
  )

  // -- Streaming oracles (batch twins) --------------------------------
  // events.ts is TIMESTAMP_NS in DuckDB; CAST(ts AS TIMESTAMP) truncates
  // to micros exactly like the engine's nanos→micros conversion.
  // Session twin: gap-islands with `>= 30 minutes` starting a new
  // session — matching Spark's session_window merge rule (next event
  // joins the session iff ts < previous ts + gap).

  private val streamingOracle: Map[String, String] = Map(
    // Integer millis (per-event round, then sum) — a 2-dp double sum is
    // order-dependent in its last ULP and the compare is exact-float.
    "st1_tumbling_window" ->
      ("SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type, " +
        "count(*) AS n_events, CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS total_value_milli " +
        "FROM events GROUP BY 1, 2"),
    // Upsert-sink twin: the maintained table equals the batch tumbling
    // count — partition-scoped overwrite is exactly-once maintenance.
    "st8_stream_upsert" ->
      ("SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type, " +
        "count(*) AS n_events FROM events GROUP BY 1, 2"),
    // Custom-state sessionizer twin: same gaps-and-islands SQL as st3 —
    // flatMapGroupsWithState must reproduce session_window exactly.
    "st9_sessionize_custom" ->
      ("WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts2 FROM events), " +
        "x AS (SELECT user_id, ts2, CASE WHEN lag(ts2) OVER w IS NULL OR ts2 - lag(ts2) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts2)), " +
        "y AS (SELECT user_id, ts2, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts2 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM x) " +
        "SELECT min(ts2) AS session_start, max(ts2) + INTERVAL '30 minutes' AS session_end, user_id, count(*) AS n_events " +
        "FROM y GROUP BY user_id, sid"),
    "st2_sliding_window" ->
      ("WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts2, event_type FROM events) " +
        "SELECT ws AS window_start, event_type, count(*) AS n_events FROM (" +
        "SELECT time_bucket(INTERVAL '30 minutes', ts2) - (k * INTERVAL '30 minutes') AS ws, event_type " +
        "FROM e CROSS JOIN (VALUES (0), (1)) t(k)) GROUP BY 1, 2"),
    "st3_session_window" ->
      ("WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts2 FROM events), " +
        "x AS (SELECT user_id, ts2, CASE WHEN lag(ts2) OVER w IS NULL OR ts2 - lag(ts2) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts2)), " +
        "y AS (SELECT user_id, ts2, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts2 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM x) " +
        "SELECT min(ts2) AS session_start, max(ts2) + INTERVAL '30 minutes' AS session_end, user_id, count(*) AS n_events " +
        "FROM y GROUP BY user_id, sid"),
    "st4_stream_join" ->
      ("WITH s AS (SELECT event_id AS signup_id, user_id, CAST(ts AS TIMESTAMP) AS s_ts FROM events WHERE event_type = 'signup'), " +
        "p AS (SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts FROM events WHERE event_type = 'purchase') " +
        "SELECT signup_id, purchase_id, s.user_id AS user_id, s_ts, p_ts FROM s JOIN p ON s.user_id = p.user_id " +
        "AND p_ts >= s_ts AND p_ts <= s_ts + INTERVAL 7 DAY"),
    // Left-outer adds the watermark-eviction contract to st4's twin: an
    // unmatched signup emits (with -1 sentinels) only once the global
    // watermark — min(max s_ts, max p_ts) − 10 min — passes its whole
    // 7-day match window. Younger unmatched signups emit nothing.
    "st7_stream_left_join" ->
      ("WITH s AS (SELECT event_id AS signup_id, user_id, CAST(ts AS TIMESTAMP) AS s_ts FROM events WHERE event_type = 'signup'), " +
        "p AS (SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts FROM events WHERE event_type = 'purchase'), " +
        "gw AS (SELECT least((SELECT max(s_ts) FROM s), (SELECT max(p_ts) FROM p)) - INTERVAL 10 MINUTE AS wm) " +
        "SELECT signup_id, s.user_id AS user_id, s_ts, purchase_id, epoch_ms(p_ts) AS p_ms FROM s JOIN p ON s.user_id = p.user_id " +
        "AND p_ts >= s_ts AND p_ts <= s_ts + INTERVAL 7 DAY " +
        "UNION ALL " +
        "SELECT signup_id, user_id, s_ts, -1 AS purchase_id, -1 AS p_ms FROM s " +
        "WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = s.user_id AND p_ts >= s_ts AND p_ts <= s_ts + INTERVAL 7 DAY) " +
        "AND s_ts + INTERVAL 7 DAY < (SELECT wm FROM gw)"),
    // Stream-static join + AvailableNow ≡ the plain batch enrichment join.
    "st6_stream_static" ->
      ("SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start, " +
        "c_mktsegment AS segment, event_type, count(*) AS n_events " +
        "FROM events JOIN customer ON user_id = c_custkey GROUP BY 1, 2, 3"),
    // Single-batch AvailableNow run → dropDuplicatesWithinWatermark
    // equals a global DISTINCT over the key columns (see streamDedup).
    "st5_stream_dedup" ->
      ("SELECT DISTINCT event_type, user_id, " +
        "date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute FROM events"),
  )

  // -- Multimodal oracles ---------------------------------------------
  // DuckDB 1.0 has no md5(BLOB)/substring(BLOB): the checksum compares
  // via md5(text) (same UTF-8 bytes as the engine's md5(binary)), and
  // frame slices are char-based (fixture payloads are ASCII).

  private val multimodalOracle: Map[String, String] = Map(
    // PPM twin: the oracle reconstructs the same P6 payload (geometry
    // from n_chars, ASCII pixel bytes) and states the header fields the
    // engine must PARSE back out of the binary — byte-identical payload
    // (chr(10) = the header newlines), so checksum and n_bytes pin the
    // construction and width/height/maxval/channels pin the parse.
    "m1_media_meta" ->
      ("WITH g AS (SELECT doc_id, CAST(1 + n_chars % 16 AS INTEGER) AS w, CAST(1 + n_chars % 12 AS INTEGER) AS h, text FROM documents), " +
        "p AS (SELECT doc_id, w, h, 'P6' || chr(10) || w || ' ' || h || chr(10) || '255' || chr(10) || " +
        "rpad(substr(text, 1, w * h * 3), w * h * 3, 'x') AS payload FROM g) " +
        "SELECT doc_id, 'image/x-portable-pixmap' AS media_type, CAST(length(payload) AS BIGINT) AS n_bytes, " +
        "md5(payload) AS checksum, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height, " +
        "CAST(255 AS BIGINT) AS maxval, CAST(3 AS BIGINT) AS channels FROM p"),
    "m2_frame_sample" ->
      ("WITH f AS (SELECT doc_id, text, unnest(range(0, (length(text) + 99) // 100)) AS frame_idx FROM documents) " +
        "SELECT doc_id, frame_idx, length(substr(text, frame_idx * 100 + 1, 100))::BIGINT AS frame_len, " +
        "md5(substr(text, frame_idx * 100 + 1, 100)) AS frame_checksum FROM f"),
    // AU twin: the oracle rebuilds the same payload as an (uppercase on
    // both engines) HEX string — '.snd' magic + five big-endian uint32
    // fields + sample bytes — and states the header values the engine
    // must parse back out of the binary. Hashing the hex form keeps the
    // compare off binary-typed md5.
    "m4_audio_meta" ->
      ("WITH g AS (SELECT doc_id, CAST(2 * least(n_chars // 2, 256) AS INTEGER) AS dsz, " +
        "CAST(1 + n_chars % 2 AS INTEGER) AS ch, text FROM documents), " +
        "p AS (SELECT doc_id, dsz, ch, '2E736E64' || lpad(hex(24), 8, '0') || lpad(hex(dsz), 8, '0') || " +
        "lpad(hex(3), 8, '0') || lpad(hex(8000), 8, '0') || lpad(hex(ch), 8, '0') || " +
        "upper(hex(rpad(substr(text, 1, dsz), dsz, 'x'))) AS payload_hex FROM g) " +
        "SELECT doc_id, 'audio/basic' AS media_type, CAST(24 + dsz AS BIGINT) AS n_bytes, " +
        "md5(payload_hex) AS checksum, '.snd' AS magic, CAST(dsz AS BIGINT) AS data_size, " +
        "CAST(3 AS BIGINT) AS encoding, CAST(8000 AS BIGINT) AS sample_rate, CAST(ch AS BIGINT) AS channels, " +
        "CAST(dsz // 2 AS BIGINT) AS n_samples, CAST((dsz // 2) * 1000 // (8000 * ch) AS BIGINT) AS duration_ms FROM p"),
    // Audio fingerprint twins: the oracle rebuilds the PCM section from
    // the same construction (text bytes, 'x'-padded), states the window
    // energies as 256·hi + lo byte sums, and replays the delta packing —
    // the engine must reach the identical longs by PARSING the binary.
    // The m8 twin then replays m6's banded-candidate shape on them.
    "m7_audio_fingerprint" ->
      (duckAudioFpCte + " SELECT doc_id, n_windows, fingerprint FROM fp"),
    // PNG chunk-walk twin: the oracle rebuilds the same structural PNG
    // as hex (checksum pins the construction byte-for-byte) and STATES
    // the fields the engine must WALK back out of the binary — geometry
    // through the IHDR chunk, chunk count and IEND through the
    // variable-length TLV list (the tEXt chunk's data-dependent length
    // is what makes a fixed-slice cheat impossible).
    "m9_png_meta" ->
      ("WITH g AS (SELECT doc_id, CAST(1 + n_chars % 16 AS INTEGER) AS w, " +
        "CAST(1 + n_chars % 12 AS INTEGER) AS h, CAST(1 + n_chars % 64 AS INTEGER) AS tlen, text FROM documents), " +
        "p AS (SELECT doc_id, w, h, '89504E470D0A1A0A' || '0000000D' || '49484452' || " +
        "lpad(hex(w), 8, '0') || lpad(hex(h), 8, '0') || '08' || '00' || '00' || '00' || '00' || 'DEADBEEF' || " +
        "lpad(hex(tlen), 8, '0') || '74455874' || upper(hex(rpad(substr(text, 1, tlen), tlen, 'x'))) || 'DEADBEEF' || " +
        "'00000000' || '49454E44' || 'AE426082' AS payload_hex FROM g) " +
        "SELECT doc_id, CAST(length(payload_hex) // 2 AS BIGINT) AS n_bytes, md5(payload_hex) AS checksum, " +
        "TRUE AS sig_ok, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height, " +
        "CAST(8 AS BIGINT) AS bit_depth, CAST(0 AS BIGINT) AS color_type, " +
        // crc_ok: DuckDB has no crc32 built-in, so the twin states the
        // expectation from its own construction — it wrote the spec
        // constant crc32('IEND') = 0xAE426082 into the IEND chunk, so
        // the engine's real crc32-over-walked-span check must read TRUE
        // (corrupted-CRC rejection is spec-gated on the real PNG
        // fixture, where every chunk carries a genuine CRC).
        "CAST(3 AS BIGINT) AS n_chunks, TRUE AS iend_found, TRUE AS crc_ok FROM p"),
    "m8_audio_neardup" -> {
      import graft.operators.Multimodal.{AudioFpMaxHamming => maxHam}
      duckAudioFpCte + ", " +
        "bands0 AS (SELECT doc_id, b, CASE b WHEN 0 THEN fingerprint % 256 " +
        "WHEN 1 THEN (fingerprint // 256) % 256 WHEN 2 THEN (fingerprint // 65536) % 256 " +
        "ELSE (fingerprint // 16777216) % 256 END AS bkey " +
        "FROM fp CROSS JOIN (VALUES (0), (1), (2), (3)) t(b)), " +
        "bands AS (SELECT * FROM bands0 WHERE (b, bkey) IN " +
        s"(SELECT (b, bkey) FROM bands0 GROUP BY b, bkey HAVING count(*) <= ${LlmOps.LshBucketCap})), " +
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a " +
        "JOIN bands b ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id) " +
        "SELECT doc_a, doc_b, CAST(bit_count(xor(fa.fingerprint, fb.fingerprint)) AS BIGINT) AS hamming " +
        "FROM cand JOIN fp fa ON doc_a = fa.doc_id JOIN fp fb ON doc_b = fb.doc_id " +
        s"WHERE bit_count(xor(fa.fingerprint, fb.fingerprint)) <= $maxHam"
    },
  )

  /** Shared audio-fingerprint CTE chain ending at `fp(doc_id, n_windows,
    * fingerprint)` — one string for the m7/m8 twins (the triangle
    * lesson: never paste an oracle pipeline twice).
    */
  private lazy val duckAudioFpCte: String = {
    import graft.operators.Multimodal.{FpWinSamples => ws}
    val energy = (0 until ws)
      .map(j => s"(256 * ord(substr(pcm, (win * $ws + $j) * 2 + 1, 1)) + ord(substr(pcm, (win * $ws + $j) * 2 + 2, 1)))")
      .mkString("(", " + ", ")")
    "WITH g AS (SELECT doc_id, CAST(2 * least(n_chars // 2, 256) AS INTEGER) AS dsz, text FROM documents), " +
      s"p AS (SELECT doc_id, (dsz // 2) // $ws AS n_win, rpad(substr(text, 1, dsz), dsz, 'x') AS pcm " +
      s"FROM g WHERE (dsz // 2) // $ws >= 2), " +
      // Window budget mirror (Multimodal.FpMaxWindows): the fingerprint
      // covers the first 32 windows only; n_windows reports the full count.
      s"wrows AS (SELECT doc_id, n_win, pcm, unnest(range(0, least(n_win, ${graft.operators.Multimodal.FpMaxWindows}))) AS win FROM p), " +
      s"e AS (SELECT doc_id, n_win, win, $energy AS energy FROM wrows), " +
      "d AS (SELECT doc_id, n_win, win, energy, lag(energy) OVER (PARTITION BY doc_id ORDER BY win) AS prev FROM e), " +
      "fp AS (SELECT doc_id, CAST(max(n_win) AS BIGINT) AS n_windows, " +
      "CAST(coalesce(sum(CASE WHEN energy > prev THEN (1::BIGINT << CAST(win - 1 AS INTEGER)) ELSE 0 END), 0) AS BIGINT) AS fingerprint " +
      "FROM d GROUP BY doc_id)"
  }

  private val multimodalOracle2: Map[String, String] = Map(
    // Same nearest-neighbor index arithmetic on whole RGB triplets, all
    // integer division; pix is the same 'x'-padded pixel section the
    // engine slices back out of the P6 payload.
    "m3_resize" ->
      (s"WITH g AS (SELECT doc_id, CAST(1 + n_chars % 16 AS INTEGER) AS w, CAST(1 + n_chars % 12 AS INTEGER) AS h, text FROM documents), " +
        "p AS (SELECT doc_id, w, h, rpad(substr(text, 1, w * h * 3), w * h * 3, 'x') AS pix, " +
        s"least(w * h, ${graft.operators.Multimodal.ResizeTarget}) AS n_out FROM g) " +
        "SELECT doc_id, CAST(w AS BIGINT) AS orig_w, CAST(h AS BIGINT) AS orig_h, " +
        "CAST(n_out AS BIGINT) AS resized_px, " +
        "md5(array_to_string(list_transform(range(0, n_out), " +
        "i -> substr(pix, CAST((i * w * h) // n_out AS INTEGER) * 3 + 1, 3)), '')) AS resized_md5 " +
        "FROM p"),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  // -- Round-7 oracles -------------------------------------------------

  /** The unrolled integer-Lloyd CTE chain (shared by the q_kmeans and
    * q_semdedup twins): ends at `a3`, the third-iteration assignment
    * with columns (vec_id, cid, dist).
    */
  private lazy val kmeansCtes: String = {
    def assignFrom(c: String, d: String, a: String) =
      s"$d AS (SELECT v.vec_id, c.cid, sum((v.val - c.c) * (v.val - c.c)) AS dist " +
        s"FROM v JOIN $c c ON v.dim = c.dim GROUP BY v.vec_id, c.cid), " +
        s"$a AS (SELECT vec_id, cid, dist FROM (SELECT vec_id, cid, dist, " +
        "row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn " +
        s"FROM $d) WHERE rn = 1)"
    def updateFrom(a: String, c: String) =
      s"$c AS (SELECT cid, dim, (2 * sum(val) + count(*)) // (2 * count(*)) AS c " +
        s"FROM $a JOIN v USING (vec_id) GROUP BY cid, dim)"
    "v AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim, " +
      "CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) + 1000 AS val " +
      "FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)), " +
      "init AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid " +
      "FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)), " +
      "c0 AS (SELECT cid, dim, val AS c FROM init JOIN v USING (vec_id)), " +
      assignFrom("c0", "d1", "a1") + ", " + updateFrom("a1", "c1") + ", " +
      assignFrom("c1", "d2", "a2") + ", " + updateFrom("a2", "c2") + ", " +
      assignFrom("c2", "d3", "a3")
  }

  private val round7Oracle: Map[String, String] = Map(
    // TPC-H twins (near-verbatim like Q3/Q5): integer cents/micro sums,
    // count already BIGINT in DuckDB; milli-ratio via the shared
    // round-half-up primitive.
    "q_tpch_q1" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty, " +
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents, " +
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents, " +
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents, " +
        "CAST((2000 * sum(CAST(round(l_discount * 1000) AS BIGINT)) + count(1)) // (2 * count(1)) AS BIGINT) AS avg_disc_micro, " +
        "count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
        "GROUP BY l_returnflag, l_linestatus"),
    "q_tpch_q6" ->
      ("SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents, " +
        "count(*) AS n_rows FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"),
    // Recursive-closure twin: verbatim UNION ALL recursion with the
    // same hop bound and outer min-hop dedup.
    "q_rec_closure" ->
      ("WITH RECURSIVE r(node, hop) AS (" +
        "SELECT CAST(4 AS BIGINT) AS node, 0 AS hop " +
        "UNION ALL " +
        "SELECT e.dst, r.hop + 1 FROM r " +
        "JOIN (SELECT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
        "UNION ALL " +
        "SELECT l_partkey * 2 + 1 AS src, o_custkey * 2 AS dst " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey) e " +
        "ON e.src = r.node WHERE r.hop < 2) " +
        "SELECT node, CAST(min(hop) AS BIGINT) AS hops FROM r GROUP BY node"),
    // Funnel-steps twin: the same iterated conditional minima; DuckDB's
    // TIMESTAMP cast truncates ns→us like the engine's micros
    // conversion, and date_trunc weeks align (Monday) in both engines.
    "q_funnel_steps" ->
      ("WITH s1 AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id), " +
        "s2 AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2 FROM events e JOIN s1 ON e.user_id = s1.user_id " +
        "WHERE e.event_type = 'view' AND CAST(e.ts AS TIMESTAMP) > s1.t1 GROUP BY e.user_id), " +
        "s3 AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3 FROM events e JOIN s2 ON e.user_id = s2.user_id " +
        "WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t2 GROUP BY e.user_id) " +
        "SELECT CAST(date_trunc('week', t1) AS DATE) AS cohort_week, " +
        "count(*) AS n_signup, count(t2) AS n_viewed, count(t3) AS n_purchased " +
        "FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id) " +
        "GROUP BY 1"),
    // Q10/Q18 twins: near-verbatim; integer cents/quantities and total
    // ORDER BY keys make both LIMIT sets deterministic.
    "q_tpch_q10" ->
      ("SELECT c_custkey, c_name, n_name, " +
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "AND l_returnflag = 'R' " +
        "GROUP BY c_custkey, c_name, n_name " +
        "ORDER BY revenue_cents DESC, c_custkey LIMIT 20"),
    "q_tpch_q18" ->
      ("SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, big.sum_qty " +
        "FROM (SELECT l_orderkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty " +
        "FROM lineitem GROUP BY l_orderkey " +
        "HAVING CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) > 210) big " +
        "JOIN orders ON o_orderkey = big.l_orderkey " +
        "JOIN customer ON c_custkey = o_custkey " +
        "ORDER BY big.sum_qty DESC, o_orderkey LIMIT 10"),
    // m5 twin: identical grid/gray/bit arithmetic with ord() and //
    // over the same text-reconstructed pixel section as m3's twin.
    // The phash CTE is ONE string shared with m6's twin (the triangle
    // lesson: never paste an oracle pipeline twice).
    "m5_image_phash" ->
      (duckPhashCte +
        " SELECT doc_id, CAST(phash AS BIGINT) AS phash, " +
        "CAST(phash // 256 AS BIGINT) AS band_hi, CAST(phash % 256 AS BIGINT) AS band_lo FROM ph"),
    // m6 twin: the shared phash CTE, then d6's banded-candidate shape —
    // two 8-bit bands, the same bucket cap, xor popcount verify.
    "m6_phash_neardup" ->
      (duckPhashCte + ", " +
        "bands0 AS (SELECT doc_id, b, CASE WHEN b = 0 THEN phash // 256 ELSE phash % 256 END AS bkey " +
        "FROM ph CROSS JOIN (VALUES (0), (1)) t(b)), " +
        s"bands AS (SELECT * FROM bands0 WHERE (b, bkey) IN (SELECT (b, bkey) FROM bands0 GROUP BY b, bkey HAVING count(*) <= ${LlmOps.LshBucketCap})), " +
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id) " +
        "SELECT doc_a, doc_b, CAST(bit_count(xor(pa.phash, pb.phash)) AS BIGINT) AS hamming " +
        "FROM cand JOIN ph pa ON doc_a = pa.doc_id JOIN ph pb ON doc_b = pb.doc_id " +
        s"WHERE bit_count(xor(pa.phash, pb.phash)) <= ${graft.operators.Multimodal.PhashMaxHamming}"),
    // t22 twin: the bounded-heap sample equals the window form stated
    // directly — rank by the same 48-bit md5 prefix (hex via 0x-cast),
    // keep rn <= k.
    "t22_group_sample" ->
      ("SELECT source, CAST(rn AS BIGINT) AS sample_rank, doc_id FROM (" +
        "SELECT source, doc_id, row_number() OVER (PARTITION BY source " +
        "ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT), doc_id) AS rn " +
        "FROM documents) WHERE rn <= 5"),
    // w9 twin: the identical integer recurrence replayed as a recursive
    // CTE over the same (ts, event_id) ordering.
    "w9_ewma" ->
      ("WITH RECURSIVE ev AS (SELECT user_id, CAST(round(value * 1000) AS BIGINT) AS x, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn FROM events), " +
        "cnt AS (SELECT user_id, max(rn) AS n FROM ev GROUP BY user_id), " +
        "s AS (SELECT user_id, rn, x AS s FROM ev WHERE rn = 1 " +
        "UNION ALL SELECT ev.user_id, ev.rn, (2 * (200 * ev.x + 800 * s.s) + 1000) // 2000 " +
        "FROM s JOIN ev ON ev.user_id = s.user_id AND ev.rn = s.rn + 1) " +
        "SELECT s.user_id, CAST(c.n AS BIGINT) AS n_events, CAST(s.s AS BIGINT) AS ewma_milli " +
        "FROM s JOIN cnt c ON s.user_id = c.user_id AND s.rn = c.n"),
    // PageRank twin: same nano-mass floor-div power iterations unrolled;
    // HUGEINT sums cast back at the end.
    "q_pagerank" -> {
      def iter(rPrev: String, c: String, r: String) =
        s"$c AS (SELECT e.dst AS node, sum((850 * (r.rank // r.deg)) // 1000) AS s " +
          s"FROM $rPrev r JOIN e ON r.node = e.src GROUP BY e.dst), " +
          s"$r AS (SELECT d.node, d.deg, 150000000 // nn.n + $c.s AS rank " +
          s"FROM deg d JOIN $c USING (node), nn)"
      "WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
        "e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0), " +
        "deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY src), " +
        "nn AS (SELECT count(*) AS n FROM deg), " +
        "r0 AS (SELECT node, deg, 1000000000 // nn.n AS rank FROM deg, nn), " +
        iter("r0", "c1", "r1") + ", " + iter("r1", "c2", "r2") + ", " +
        iter("r2", "c3", "r3") + " " +
        "SELECT node, CAST(rank AS BIGINT) AS rank_nano FROM r3"
    },
    // st11 twin: with one AvailableNow batch the per-user processing
    // order is the explicit (ts, event_id) sort, so milestones are the
    // rn % Step == 0 rows of a plain event-time ranking. The TIMESTAMP
    // cast truncates ns→us exactly like the engine's micros conversion.
    "st11_milestones" ->
      ("SELECT user_id, CAST(rn AS BIGINT) AS milestone, event_id FROM (" +
        "SELECT user_id, event_id, row_number() OVER (" +
        "PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn " +
        s"FROM events) WHERE rn % ${graft.streaming.Milestones.Step} = 0"),
    // st12 twin: the final AvailableNow watermark settles at
    // max(ts) − 10 min, so exactly the users whose (last event + 30 min)
    // alarm lies strictly before it have fired.
    "st12_inactivity" ->
      ("WITH mx AS (SELECT max(CAST(ts AS TIMESTAMP)) AS m FROM events), " +
        "u AS (SELECT user_id, max(CAST(ts AS TIMESTAMP)) AS last_ts, count(*) AS n FROM events GROUP BY user_id) " +
        "SELECT user_id, epoch_ms(last_ts) AS last_ms, CAST(n AS BIGINT) AS n_events " +
        "FROM u, mx WHERE last_ts + INTERVAL 30 MINUTE < m - INTERVAL 10 MINUTE"),
    // st13 twin: one Trigger.Once batch delivers every row of a key in a
    // single invocation against fresh state, so the output is the plain
    // per-user count with had_prior=false for all; the TTL/cross-run
    // semantics are proven separately by TtlProbeSpec.
    "st13_ttl_state" ->
      ("SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, " +
        "CAST(0 AS BOOLEAN) AS had_prior FROM events GROUP BY user_id"),
    // BM25 twin: identical fixed-point derivation (rational ln-free idf,
    // fifths-scaled k1/b, round-half-up at each step — // floors =
    // truncates, all operands non-negative).
    "t21_bm25" ->
      ("WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents), " +
        "dlen AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id), " +
        "corpus AS (SELECT count(*) AS n_docs, " +
        "(2000 * sum(len) + count(*)) // (2 * count(*)) AS avglen_milli FROM dlen), " +
        "tfs AS (SELECT doc_id, tok, count(*) AS tf FROM toks " +
        "WHERE tok IN ('join', 'filter', 'hash') GROUP BY doc_id, tok), " +
        "dfs AS (SELECT tok, count(*) AS df FROM tfs GROUP BY tok), " +
        "sc AS (SELECT t.doc_id, " +
        "(2000 * (c.n_docs - d.df) + (d.df + 1)) // (2 * (d.df + 1)) AS idf_milli, " +
        "250 + (2 * 750000 * l.len + c.avglen_milli) // (2 * c.avglen_milli) AS norm_milli, " +
        "t.tf FROM tfs t JOIN dfs d USING (tok) JOIN dlen l USING (doc_id), corpus c) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits, " +
        "CAST(sum((2000 * (idf_milli * 11 * tf) + (5000 * tf + 6 * norm_milli)) " +
        "// (2 * (5000 * tf + 6 * norm_milli))) AS BIGINT) AS score_milli " +
        "FROM sc GROUP BY doc_id"),
    // K-means twin: the SAME three unrolled Lloyd iterations in integer
    // arithmetic — shifted milli values, HUGEINT-safe sums, // floor-div
    // centroid means (operands non-negative by the +1000 shift), and the
    // (dist, cid) row_number tie-break mirroring the engine's struct-min.
    "q_kmeans" ->
      (s"WITH $kmeansCtes " +
        "SELECT vec_id, CAST(cid AS BIGINT) AS cluster, CAST(dist AS BIGINT) AS dist2 FROM a3"),
    // SemDeDup twin: the k-means CTEs feed a same-cluster pair join with
    // the exact-cosine verify; a vector is a dup when any smaller-id
    // cluster-mate clears the threshold.
    "q_semdedup" ->
      (s"WITH $kmeansCtes, " +
        "we AS (SELECT a3.vec_id, a3.cid, e.emb FROM a3 " +
        "JOIN (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings) e USING (vec_id)), " +
        "dropped AS (SELECT DISTINCT b.vec_id FROM we a JOIN we b " +
        "ON a.cid = b.cid AND a.vec_id < b.vec_id " +
        s"WHERE ${cosOf("a.emb", "b.emb")} >= ${graft.operators.Similarity.SemDedupCosMilli}) " +
        "SELECT a3.vec_id, CAST(a3.cid AS BIGINT) AS cluster, " +
        "CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup " +
        "FROM a3 LEFT JOIN dropped d ON a3.vec_id = d.vec_id"),
    // The sketch pass is a pure candidate generator (superset guarantee
    // + exact recount), so the oracle is the plain count-and-threshold.
    "t20_heavy_hitters" ->
      ("WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents), " +
        "g AS (SELECT toks[i] || ' ' || toks[i + 1] AS sh " +
        "FROM t, unnest(range(1, len(toks))) AS u(i)), " +
        "tot AS (SELECT count(*) AS n FROM g) " +
        "SELECT sh, CAST(count(*) AS BIGINT) AS tf, " +
        "CAST((SELECT n FROM tot) AS BIGINT) AS n_bigrams " +
        "FROM g GROUP BY sh " +
        s"HAVING count(*) * ${LlmOps.FrequentCapacity + 1} > (SELECT n FROM tot)"),
    // Event-ngram twin: same (ts, event_id) total order; DuckDB's
    // TIMESTAMP cast truncates ns→us like the engine's micros loader.
    "q_event_ngrams" ->
      ("WITH s AS (SELECT user_id, event_type, " +
        "lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS p1, " +
        "lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS p2 " +
        "FROM events WHERE event_type IS NOT NULL) " +
        "SELECT p2 || ' > ' || p1 || ' > ' || event_type AS pattern, count(*) AS n " +
        "FROM s WHERE p2 IS NOT NULL GROUP BY 1"),
    // d9 twin: BRUTE-FORCE all-pairs Jaccard — no prefix machinery at
    // all, which is exactly the point: matching it proves the prefix
    // filter admits no false negatives. Same shingle set as d4's twin.
    "d9_prefix_join" -> {
      import LlmOps.{PrefixJaccardDen => den, PrefixJaccardNum => num}
      ("WITH tokd AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents), " +
        s"sh AS (SELECT doc_id, unnest($duckShingles) AS shingle FROM tokd WHERE len(tok) >= 3), " +
        "sizes AS (SELECT doc_id, count(*) AS s FROM sh GROUP BY doc_id), " +
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i " +
        "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id " +
        "GROUP BY 1, 2) " +
        "SELECT doc_a, doc_b, " +
        "CAST((2000 * CAST(i AS BIGINT) + CAST(sa.s + sb.s - i AS BIGINT)) " +
        "// (2 * CAST(sa.s + sb.s - i AS BIGINT)) AS BIGINT) AS jaccard_milli " +
        "FROM inter JOIN sizes sa ON sa.doc_id = doc_a " +
        "JOIN sizes sb ON sb.doc_id = doc_b " +
        s"WHERE i * $den >= $num * (sa.s + sb.s - i)")
    },
    // d9b / d9_degree_stats twins: unlike d9's brute-force twin, these
    // replicate the FULL candidate pipeline (df ranking, prefix cut,
    // length + positional filters, then the D9DegreeCap clique guard) —
    // the guard is defined over the candidate set, so the oracle must
    // walk the same set to check the same contract. The prefix ranking
    // is deterministic on both engines: row_number over (df, shingle)
    // within a doc is a total order because (doc, shingle) rows are
    // distinct.
    "d9b_prefix_guarded" -> {
      import LlmOps.{PrefixJaccardDen => den, PrefixJaccardNum => num}
      (duckD9Cand +
        s", over_cap AS (SELECT doc_id FROM deg WHERE n_candidates > ${LlmOps.D9DegreeCap}), " +
        "kept AS (SELECT * FROM cand WHERE doc_a NOT IN (SELECT doc_id FROM over_cap) " +
        "AND doc_b NOT IN (SELECT doc_id FROM over_cap)), " +
        "inter AS (SELECT doc_a, doc_b, kept.sa, kept.sb, count(*) AS i " +
        "FROM kept JOIN shl a ON a.doc_id = kept.doc_a " +
        "JOIN shl b ON b.doc_id = kept.doc_b AND b.shingle = a.shingle " +
        "GROUP BY 1, 2, 3, 4) " +
        "SELECT doc_a, doc_b, " +
        "CAST((2000 * CAST(i AS BIGINT) + CAST(sa + sb - i AS BIGINT)) " +
        "// (2 * CAST(sa + sb - i AS BIGINT)) AS BIGINT) AS jaccard_milli " +
        s"FROM inter WHERE i * $den >= $num * (sa + sb - i)")
    },
    "d9_degree_stats" ->
      (duckD9Cand +
        " SELECT doc_id, CAST(n_candidates AS BIGINT) AS n_candidates, " +
        s"n_candidates > ${LlmOps.D9DegreeCap} AS dropped FROM deg"),
    // Winsorize twin: verbatim but for DuckDB's `//`; rank-based bounds
    // (not interpolated quantiles) keep both engines integer-exact.
    "q_winsorize" ->
      ("WITH t AS (SELECT o_orderkey, o_orderstatus, " +
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "ranked AS (SELECT o_orderstatus, cents, " +
        "row_number() OVER (PARTITION BY o_orderstatus ORDER BY cents, o_orderkey) AS rn, " +
        "count(*) OVER (PARTITION BY o_orderstatus) AS n FROM t), " +
        "bounds AS (SELECT o_orderstatus, " +
        "max(CASE WHEN rn = greatest(1, (n * 5) // 100) THEN cents END) AS lo, " +
        "max(CASE WHEN rn = least(n, (n * 95) // 100 + 1) THEN cents END) AS hi " +
        "FROM ranked GROUP BY o_orderstatus) " +
        "SELECT o_orderkey, t.o_orderstatus, cents, " +
        "least(greatest(cents, lo), hi) AS clipped_cents " +
        "FROM t JOIN bounds ON t.o_orderstatus = bounds.o_orderstatus"),
    // Triangle twin: verbatim — the degree-oriented wedge join is plain
    // ANSI SQL; DuckDB counts the same once-per-triangle orientation.
    "q_triangles" -> duckTriangleSql,
    // Indexed-triangle twin: IDENTICAL SQL to q_triangles — the index
    // changes where the work happens, never the answer.
    "q_triangles_idx" -> duckTriangleSql,
    // Adjacency-intersection triangle twin: IDENTICAL SQL again — the
    // edge-iterator form changes the physical shape (merge-counted
    // sorted adjacency arrays instead of a wedge-row join), never the
    // count.
    "q_triangles_adj" -> duckTriangleSql,
    // Bucketed-snapshot adjacency twin: same SQL a fourth time — the
    // stored layout moves the build cost, never the answer.
    "q_triangles_adj_idx" -> duckTriangleSql,
    // Incremental-maintenance twin (r13): same SQL a FIFTH time — the
    // ingest folds the batch orders' edges into the stored snapshot, and
    // corpus ∪ batch pairs IS the full co-purchase edge set, so the
    // maintained totals must equal the full rebuild exactly.
    "q_triangles_adj_ingest" -> duckTriangleSql,
    // t23 twin: same bigram construction as t20's; the head set is the
    // df-threshold filter, rare = total − frequent by subtraction.
    "t23_rare_bigrams" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "g AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS sh " +
        "FROM t, unnest(range(1, len(toks))) AS u(i)), " +
        "nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM g), " +
        "freq AS (SELECT sh FROM (SELECT sh, count(DISTINCT doc_id) AS df FROM g GROUP BY sh) " +
        s"WHERE df >= 2 AND df * ${LlmOps.NovelDocShare} >= (SELECT n_docs FROM nd)) " +
        "SELECT doc_id, count(*) AS n_bigrams, " +
        "CAST(sum(CASE WHEN f.sh IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_freq, " +
        "CAST((2000 * CAST(count(*) - sum(CASE WHEN f.sh IS NULL THEN 0 ELSE 1 END) AS BIGINT) " +
        "+ CAST(count(*) AS BIGINT)) // (2 * CAST(count(*) AS BIGINT)) AS BIGINT) AS novelty_milli " +
        "FROM g LEFT JOIN freq f ON g.sh = f.sh " +
        "GROUP BY doc_id"),
    // BPE-pair twin: distinct-word frequencies, then per-character pair
    // explosion over the word table — range(1, len) is 1..len-1 on both
    // engines; words under two chars drop on both sides.
    "t24_bpe_pairs" ->
      ("WITH w AS (SELECT tok, count(*) AS freq FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS tok FROM documents) " +
        "WHERE length(tok) >= 2 GROUP BY tok), " +
        "p AS (SELECT substr(tok, CAST(i AS INT), 1) AS left_sym, " +
        "substr(tok, CAST(i AS INT) + 1, 1) AS right_sym, freq " +
        "FROM (SELECT tok, freq, unnest(range(1, length(tok))) AS i FROM w)) " +
        "SELECT left_sym, right_sym, CAST(sum(freq) AS BIGINT) AS pair_count " +
        "FROM p GROUP BY 1, 2"),
    // Classifier twin: same df / df_pos vocabulary, same integer milli
    // weights, same milli-average score; empty tokens filtered and the
    // prior cut derived as milli(1, count(distinct source)) — both
    // mirroring the Spark plan, so the oracle defines identical
    // semantics on ANY corpus, not just the 20-source fixture.
    "t25_classifier" ->
      ("WITH toks AS (SELECT doc_id, source, tok FROM " +
        "(SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok FROM documents) " +
        "WHERE length(tok) >= 1), " +
        "v AS (SELECT tok, count(DISTINCT doc_id) AS df, " +
        "count(DISTINCT CASE WHEN source = 'src0' THEN doc_id END) AS df_pos FROM toks GROUP BY tok), " +
        "w AS (SELECT tok, CAST((2000 * CAST(df_pos AS BIGINT) + CAST(df AS BIGINT)) // " +
        "(2 * CAST(df AS BIGINT)) AS BIGINT) AS w_milli FROM v), " +
        "prior AS (SELECT CAST((2000 * 1 + CAST(count(DISTINCT source) AS BIGINT)) // " +
        "(2 * CAST(count(DISTINCT source) AS BIGINT)) AS BIGINT) AS prior_milli FROM documents), " +
        "s AS (SELECT doc_id, count(*) AS n_toks, CAST(sum(w_milli) AS BIGINT) AS w_sum " +
        "FROM toks JOIN w USING (tok) GROUP BY doc_id) " +
        "SELECT doc_id, n_toks, score_milli, " +
        "CAST(CASE WHEN score_milli > prior_milli THEN 1 ELSE 0 END AS BIGINT) AS is_pos " +
        "FROM (SELECT doc_id, n_toks, CAST((2000 * w_sum + 1000 * n_toks) // " +
        "(2 * 1000 * n_toks) AS BIGINT) AS score_milli FROM s), prior"),
    // Bigram-LM twin: context counts over bigram rows (so per-context
    // rates sum to 1000), integer conditional rates, milli-average score.
    "t26_bigram_lm" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "g AS (SELECT doc_id, toks[i] AS a, toks[i + 1] AS b " +
        "FROM t, unnest(range(1, len(toks))) AS u(i)), " +
        "c AS (SELECT a, count(*) AS c_a FROM g GROUP BY a), " +
        "m AS (SELECT a, b, CAST((2000 * CAST(count(*) AS BIGINT) + CAST(c_a AS BIGINT)) // " +
        "(2 * CAST(c_a AS BIGINT)) AS BIGINT) AS p_milli FROM g JOIN c USING (a) GROUP BY a, b, c_a), " +
        "s AS (SELECT doc_id, count(*) AS n_bigrams, CAST(sum(p_milli) AS BIGINT) AS p_sum " +
        "FROM g JOIN m USING (a, b) GROUP BY doc_id) " +
        "SELECT doc_id, n_bigrams, CAST((2000 * p_sum + 1000 * n_bigrams) // " +
        "(2 * 1000 * n_bigrams) AS BIGINT) AS avg_p_milli FROM s"),
    // Pruned-broadcast LM twin: identical model, ranked to top-5
    // successors per context (count desc, successor asc tie-break —
    // deterministic on both engines) before scoring; only covered
    // bigrams count.
    "t27_bigram_topk" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "g AS (SELECT doc_id, toks[i] AS a, toks[i + 1] AS b " +
        "FROM t, unnest(range(1, len(toks))) AS u(i)), " +
        "c AS (SELECT a, count(*) AS c_a FROM g GROUP BY a), " +
        "r AS (SELECT a, b, count(*) AS c_ab, " +
        "row_number() OVER (PARTITION BY a ORDER BY count(*) DESC, b ASC) AS rk " +
        "FROM g GROUP BY a, b), " +
        "m AS (SELECT r.a, r.b, CAST((2000 * CAST(c_ab AS BIGINT) + CAST(c_a AS BIGINT)) // " +
        "(2 * CAST(c_a AS BIGINT)) AS BIGINT) AS p_milli FROM r JOIN c USING (a) WHERE rk <= 5), " +
        "s AS (SELECT doc_id, count(*) AS n_bigrams, CAST(sum(p_milli) AS BIGINT) AS p_sum " +
        "FROM g JOIN m USING (a, b) GROUP BY doc_id) " +
        "SELECT doc_id, n_bigrams, CAST((2000 * p_sum + 1000 * n_bigrams) // " +
        "(2 * 1000 * n_bigrams) AS BIGINT) AS avg_p_milli FROM s"),
    // Q4 twin: same 60-day-late EXISTS; DuckDB's INTERVAL addition on
    // TIMESTAMP matches Spark's day-interval arithmetic exactly.
    "q_tpch_q4" ->
      ("SELECT o_orderpriority, count(*) AS order_count FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01' " +
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey " +
        "AND l_shipdate > o_orderdate + INTERVAL 60 DAY) " +
        "GROUP BY o_orderpriority"),
    // Q12 twin: conditional counts cast back from DuckDB's HUGEINT.
    "q_tpch_q12" ->
      ("SELECT l_returnflag, " +
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count, " +
        "CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY l_returnflag"),
    // Q14 twin: identical conditional cent-sums; the milli ratio via the
    // shared round-half-up form (// floors = truncates, sums positive).
    "q_tpch_q14" ->
      ("SELECT CAST((2000 * sum(CASE WHEN p_type = 'PROMO' THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) ELSE 0 END) " +
        "+ sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))) " +
        "// (2 * sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))) AS BIGINT) AS promo_milli, " +
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'"),
    // The bloom pre-filter is a pure shuffle reduction — false positives
    // die in the exact join — so the oracle is the PLAIN join.
    "j10_bloom_prejoin" ->
      ("SELECT o_orderkey, o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "WHERE c_mktsegment = 'BUILDING'"),
    // Same first-occurrence-flag trick stated in SQL: rank each
    // (user, type) stream, running-sum the rank-1 flags.
    "w8_running_distinct" ->
      ("WITH f AS (SELECT event_id, user_id, ts, event_type, " +
        "CASE WHEN row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS is_first " +
        "FROM events) " +
        "SELECT event_id, user_id, " +
        "CAST(sum(is_first) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_types_so_far FROM f"),
    // Mode twin: explicit (count DESC, lang) window — the tie order the
    // engine's min(struct(-cnt, lang)) argmax encodes.
    "a13_mode" ->
      ("SELECT source, lang AS mode_lang, cnt AS n_docs FROM (" +
        "SELECT source, lang, count(*) AS cnt, " +
        "row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, lang) AS rn " +
        "FROM documents GROUP BY source, lang) t WHERE rn = 1"),
    // Regression twin: identical integer moments; DuckDB's HUGEINT
    // intermediates cast back to BIGINT.
    "q_group_regression" ->
      ("WITH daily AS (SELECT CAST(c_nationkey AS BIGINT) AS nation, " +
        "CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS x, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y " +
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2) " +
        "SELECT nation, count(*) AS n_days, " +
        "CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS slope_num, " +
        "CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS slope_den " +
        "FROM daily GROUP BY nation"),
    // Lambda-HOF twin: DuckDB list lambdas; float→double widening before
    // the per-element round on both sides, so both engines fold the same
    // integer sequences.
    "f16_hof" ->
      ("SELECT vec_id, " +
        "CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos, " +
        "CAST(len(list_filter(embedding, x -> x > 0.5)) > 0 AS BIGINT) AS has_big, " +
        "CAST(list_sum(list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS sum_milli, " +
        "CAST(list_sum(list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) * CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS norm2_milli2 " +
        "FROM embeddings"),
    // Full-outer adds BOTH eviction contracts to st7's twin: unmatched
    // signups cut at s_ts + 7d < wm (their match window), unmatched
    // purchases at p_ts < wm (no signup ≤ p_ts can still arrive).
    "st10_stream_full_outer" ->
      ("WITH s AS (SELECT event_id AS signup_id, user_id, CAST(ts AS TIMESTAMP) AS s_ts FROM events WHERE event_type = 'signup'), " +
        "p AS (SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts FROM events WHERE event_type = 'purchase'), " +
        "gw AS (SELECT least((SELECT max(s_ts) FROM s), (SELECT max(p_ts) FROM p)) - INTERVAL 10 MINUTE AS wm) " +
        "SELECT signup_id, purchase_id, s.user_id AS user_id, epoch_ms(s_ts) AS s_ms, epoch_ms(p_ts) AS p_ms " +
        "FROM s JOIN p ON s.user_id = p.user_id AND p_ts >= s_ts AND p_ts <= s_ts + INTERVAL 7 DAY " +
        "UNION ALL " +
        "SELECT signup_id, -1 AS purchase_id, user_id, epoch_ms(s_ts) AS s_ms, -1 AS p_ms FROM s " +
        "WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = s.user_id AND p_ts >= s_ts AND p_ts <= s_ts + INTERVAL 7 DAY) " +
        "AND s_ts + INTERVAL 7 DAY < (SELECT wm FROM gw) " +
        "UNION ALL " +
        "SELECT -1 AS signup_id, purchase_id, user_id, -1 AS s_ms, epoch_ms(p_ts) AS p_ms FROM p " +
        "WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.user_id = p.user_id AND p_ts >= s_ts AND p_ts <= s_ts + INTERVAL 7 DAY) " +
        "AND p_ts < (SELECT wm FROM gw)"),
  )

  /** Twins for the [[Tpch]] suite-completion queries. Near-verbatim —
    * the only divergences are DuckDB's `//` for Spark's `div` (Q8's
    * milli ratio) and `INTERVAL 60 DAY` for `interval 60 days` (Q21,
    * like Q4's twin). Every money column is integer cents on both
    * sides; HUGEINT sums are cast back to BIGINT at the projection.
    */
  private val tpchOracle: Map[String, String] = Map(
    "q_tpch_q2" ->
      ("WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) " +
        "SELECT CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents, " +
        "s_name, n_name, p_partkey, p_name " +
        "FROM part JOIN ps ON p_partkey = ps.l_partkey " +
        "JOIN supplier ON s_suppkey = ps.l_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE p_size = 25 AND p_type = 'LARGE' AND r_name = 'EUROPE' " +
        "AND round(s_acctbal * 100) = (" +
        "SELECT min(round(s2.s_acctbal * 100)) FROM ps ps2 " +
        "JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey " +
        "JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey " +
        "JOIN region r2 ON n2.n_regionkey = r2.r_regionkey " +
        "WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE') " +
        "ORDER BY acctbal_cents DESC, s_name, p_partkey LIMIT 20"),
    "q_tpch_q7" ->
      ("SELECT supp_nation, cust_nation, l_year, CAST(sum(cents) AS BIGINT) AS revenue_cents " +
        "FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
        "CAST(year(l_shipdate) AS BIGINT) AS l_year, " +
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents " +
        "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey " +
        "JOIN orders ON o_orderkey = l_orderkey " +
        "JOIN customer ON c_custkey = o_custkey " +
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
        "WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7') " +
        "OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')) " +
        "AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01') shipping " +
        "GROUP BY supp_nation, cust_nation, l_year"),
    "q_tpch_q8" ->
      ("SELECT o_year, " +
        "CAST((2000 * CAST(sum(CASE WHEN supp_nation = 'NATION_9' THEN cents ELSE 0 END) AS BIGINT) " +
        "+ CAST(sum(cents) AS BIGINT)) // (2 * CAST(sum(cents) AS BIGINT)) AS BIGINT) AS mkt_share_milli, " +
        "CAST(sum(cents) AS BIGINT) AS total_cents " +
        "FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents, " +
        "n2.n_name AS supp_nation " +
        "FROM part JOIN lineitem ON p_partkey = l_partkey " +
        "JOIN supplier ON s_suppkey = l_suppkey " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
        "JOIN region ON n1.n_regionkey = r_regionkey " +
        "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
        "WHERE r_name = 'ASIA' AND p_type = 'STANDARD' " +
        "AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01') all_nations " +
        "GROUP BY o_year"),
    "q_tpch_q9" ->
      ("SELECT nation, o_year, CAST(sum(profit_cents) AS BIGINT) AS profit_cents " +
        "FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) " +
        "- CAST(round(p_retailprice * l_quantity * 100) AS BIGINT) AS profit_cents " +
        "FROM part JOIN lineitem ON p_partkey = l_partkey " +
        "JOIN supplier ON s_suppkey = l_suppkey " +
        "JOIN orders ON o_orderkey = l_orderkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "WHERE p_name LIKE '%red%') profit " +
        "GROUP BY nation, o_year"),
    "q_tpch_q11" ->
      ("WITH val AS (SELECT l_partkey AS partkey, " +
        "sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS v " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "WHERE s_nationkey = 3 GROUP BY l_partkey) " +
        "SELECT partkey, CAST(v AS BIGINT) AS value_cents FROM val " +
        "WHERE v * 1000 > (SELECT sum(v) FROM val)"),
    "q_tpch_q13" ->
      ("SELECT c_count, count(*) AS custdist " +
        "FROM (SELECT c_custkey, count(o_orderkey) AS c_count " +
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
        "AND o_orderpriority <> '1-URGENT' " +
        "GROUP BY c_custkey) c_orders " +
        "GROUP BY c_count"),
    "q_tpch_q15" ->
      ("WITH revenue AS (SELECT l_suppkey AS supplier_no, " +
        "sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS total " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' " +
        "AND l_shipdate < TIMESTAMP '1997-04-01' GROUP BY l_suppkey) " +
        "SELECT s_suppkey, s_name, CAST(total AS BIGINT) AS total_cents " +
        "FROM supplier JOIN revenue ON s_suppkey = supplier_no " +
        "WHERE total = (SELECT max(total) FROM revenue)"),
    "q_tpch_q16" ->
      ("SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt " +
        "FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem) ps " +
        "JOIN part ON p_partkey = ps_partkey " +
        "WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO' " +
        "AND p_size IN (1, 4, 9, 16, 25, 36, 49) " +
        "AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
        "GROUP BY p_brand, p_type, p_size"),
    "q_tpch_q17" ->
      ("SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents, " +
        "count(*) AS n_rows " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey " +
        "WHERE p_brand = 'Brand#3' AND p_size <= 10 " +
        "AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) " +
        "FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"),
    "q_tpch_q19" ->
      ("SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents, " +
        "count(*) AS n_rows " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey " +
        "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11) " +
        "OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20) " +
        "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"),
    "q_tpch_q20" ->
      ("SELECT s_suppkey, s_name, n_name " +
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
        "WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3') " +
        "AND s_suppkey IN (" +
        "SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey " +
        "WHERE p_name LIKE 'red%' " +
        "AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY l_suppkey, l_partkey " +
        "HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 50)"),
    "q_tpch_q21" ->
      ("SELECT s_name, count(*) AS numwait " +
        "FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey " +
        "JOIN orders ON o_orderkey = l1.l_orderkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "WHERE o_orderstatus = 'F' AND n_name IN ('NATION_4', 'NATION_5') " +
        "AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY " +
        "AND EXISTS (SELECT 1 FROM lineitem l2 " +
        "WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) " +
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 " +
        "WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey " +
        "AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY) " +
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"),
    "q_tpch_q22" ->
      ("WITH pos AS (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS s, count(*) AS n " +
        "FROM customer WHERE c_acctbal > 0 AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7)) " +
        "SELECT c_nationkey AS nationkey, count(*) AS numcust, " +
        "CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_cents " +
        "FROM customer " +
        "WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7) " +
        "AND CAST(round(c_acctbal * 100) AS BIGINT) * (SELECT n FROM pos) > (SELECT s FROM pos) " +
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_orderdate >= TIMESTAMP '2000-01-01') " +
        "GROUP BY c_nationkey"),
  )

  def oracleSql: Map[String, String] =
    relationalOracle ++ llmOracle ++ llmOracle2 ++ simOracle ++ streamingOracle ++
      multimodalOracle ++ multimodalOracle2 ++ round7Oracle ++ tpchOracle
}
