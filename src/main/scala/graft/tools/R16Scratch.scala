package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{PersistScope, Sessions, Tables}

/** r16 optimization scratchpad: candidate rewrites of hot queries, timed
  * side by side with the shipped form (interleaved, same session) before
  * any of them lands in the operator. Usage:
  *   runMain graft.tools.R16Scratch <variant1,variant2,...> [reps]
  * Not part of the library surface; deleted or kept as evidence only.
  */
object R16Scratch {

  /** Shipped pagerank (copy of Graph.qPagerank) — the A side. */
  def pagerankA(spark: SparkSession, dir: String): DataFrame = {
    val e0 = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .localCheckpoint(true)
    PersistScope.register(() => PersistScope.releaseCheckpointBlocks(edges))
    val deg = PersistScope.persisted(
      edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")))
    val nDf = deg.agg(count(lit(1)).as("n"))
    var ranks = deg.crossJoin(broadcast(nDf))
      .select(col("node"), col("deg"), col("n"),
        expr("1000000000L div n").as("rank"))
    for (_ <- 1 to 3) {
      val contribs = ranks
        .join(edges, col("node") === col("src"))
        .select(col("dst"), expr("(850 * (rank div deg)) div 1000").as("c"))
        .groupBy(col("dst").as("node"))
        .agg(sum("c").as("s"))
      ranks = deg.crossJoin(broadcast(nDf)).join(contribs, "node")
        .select(col("node"), col("deg"), col("n"),
          (expr("150000000L div n") + col("s")).as("rank"))
    }
    ranks.select(col("node"), col("rank").as("rank_nano"))
  }

  /** B: ranks side SHUFFLE_HASH-hinted in the per-iteration join (no sort
    * of the edge stream; edges exchange still AQE-reused across rounds).
    */
  def pagerankB(spark: SparkSession, dir: String): DataFrame = {
    val e0 = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .localCheckpoint(true)
    PersistScope.register(() => PersistScope.releaseCheckpointBlocks(edges))
    val deg = PersistScope.persisted(
      edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")))
    val nDf = deg.agg(count(lit(1)).as("n"))
    var ranks = deg.crossJoin(broadcast(nDf))
      .select(col("node"), col("deg"), col("n"),
        expr("1000000000L div n").as("rank"))
    for (_ <- 1 to 3) {
      val contribs = ranks.hint("shuffle_hash")
        .join(edges, col("node") === col("src"))
        .select(col("dst"), expr("(850 * (rank div deg)) div 1000").as("c"))
        .groupBy(col("dst").as("node"))
        .agg(sum("c").as("s"))
      ranks = deg.crossJoin(broadcast(nDf)).join(contribs, "node")
        .select(col("node"), col("deg"), col("n"),
          (expr("150000000L div n") + col("s")).as("rank"))
    }
    ranks.select(col("node"), col("rank").as("rank_nano"))
  }

  /** C: per-iteration join keeps sort-merge but the final ranks join is
    * also shuffle-hash; additionally deg join keyed broadcast. Variant to
    * probe where the time actually sits.
    */
  def pagerankC(spark: SparkSession, dir: String): DataFrame = {
    val e0 = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .localCheckpoint(true)
    PersistScope.register(() => PersistScope.releaseCheckpointBlocks(edges))
    val deg = PersistScope.persisted(
      edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")))
    val nDf = deg.agg(count(lit(1)).as("n"))
    var ranks = deg.crossJoin(broadcast(nDf))
      .select(col("node"), col("deg"), col("n"),
        expr("1000000000L div n").as("rank"))
    for (_ <- 1 to 3) {
      val contribs = ranks.hint("shuffle_hash")
        .join(edges, col("node") === col("src"))
        .select(col("dst"), expr("(850 * (rank div deg)) div 1000").as("c"))
        .groupBy(col("dst").as("node"))
        .agg(sum("c").as("s"))
      ranks = deg.crossJoin(broadcast(nDf))
        .join(contribs.hint("shuffle_hash"), "node")
        .select(col("node"), col("deg"), col("n"),
          (expr("150000000L div n") + col("s")).as("rank"))
    }
    ranks.select(col("node"), col("rank").as("rank_nano"))
  }

  /** m7/m8 OLD formulation (lag window) for the interleaved A/B against
    * the shipped direct-prev form.
    */
  private def audioFingerprintLag(au: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Multimodal.{FpWinSamples, FpMaxWindows}
    val energy = (0 until FpWinSamples)
      .map(j => s"cast(conv(hex(substring(media, 25 + 2 * (win * $FpWinSamples + $j), 2)), 16, 10) as bigint)")
      .mkString("(", " + ", ")")
    val w = Window.partitionBy("doc_id").orderBy("win")
    au
      .withColumn("data_size", expr("cast(conv(hex(substring(media, 9, 4)), 16, 10) as bigint)"))
      .withColumn("n_win", expr(s"(data_size div 2) div $FpWinSamples"))
      .filter(col("n_win") >= 2)
      .select(col("doc_id"), col("media"), col("n_win"),
        posexplode(expr(s"sequence(0L, least(n_win, ${FpMaxWindows}L) - 1)"))
          .as(Seq("p", "win")))
      .select(col("doc_id"), col("n_win"), col("win"), expr(energy).as("energy"))
      .withColumn("prev", lag("energy", 1).over(w))
      .groupBy("doc_id")
      .agg(
        max("n_win").as("n_windows"),
        coalesce(
          sum(when(col("energy") > col("prev"),
            expr("shiftleft(1L, cast(win - 1 as int))")).otherwise(0L)),
          lit(0L)).as("fingerprint"))
      .select(col("doc_id"), col("n_windows"), col("fingerprint"))
  }

  def m8Lag(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{LlmOps, Multimodal}
    val fp = PersistScope.persisted(
      audioFingerprintLag(Multimodal.auTable(spark, dir))
        .select(col("doc_id"), col("fingerprint")))
    val bands = LlmOps.capBandBuckets(fp.select(
      col("doc_id"),
      posexplode(expr(
        "array(fingerprint % 256, (fingerprint div 256) % 256, " +
          "(fingerprint div 65536) % 256, (fingerprint div 16777216) % 256)"))
        .as(Seq("band", "bkey"))))
    LlmOps.d6Candidates(bands)
      .join(fp.select(col("doc_id").as("doc_a"), col("fingerprint").as("fa")), "doc_a")
      .join(fp.select(col("doc_id").as("doc_b"), col("fingerprint").as("fb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr("cast(bit_count(fa ^ fb) as bigint)").as("hamming"))
      .filter(col("hamming") <= graft.operators.Multimodal.AudioFpMaxHamming)
  }

  def m8New(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.m8AudioNeardup(spark, dir)

  def m7Lag(spark: SparkSession, dir: String): DataFrame =
    audioFingerprintLag(graft.operators.Multimodal.auTable(spark, dir))

  def m7New(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.m7AudioFingerprint(spark, dir)

  def d4A(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LlmOps.d4NgramJaccard(spark, dir)

  /** d4 with shingles HASHED to int64 (the shingleHash60 encoding the
    * d2/d9 verify sets already standardize) before the distinct and the
    * block self-join: the shuffled key drops from a ~20-byte string to 8
    * bytes and every equality compare is a long compare. Output identical
    * given hash injectivity on the corpus (the repo-wide argument).
    */
  def d4B(spark: SparkSession, dir: String): DataFrame = {
    val h60 = (c: String) => s"cast(conv(substring(md5($c), 1, 15), 16, 10) as bigint)"
    val meta = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), expr("n_chars div 100").as("len_bucket"))
    val raw = PersistScope.persisted(
      graft.operators.LlmOps.shingleRows(spark, dir)
        .select(col("doc_id"), expr(h60("shingle")).as("sh"))
        .distinct().join(meta, "doc_id"))
    val nDocs = broadcast(Tables.documents(spark, dir).agg(count("*").as("n_docs")))
    val dfs = raw.groupBy("sh").agg(count("*").as("df"))
    val rows = PersistScope.persisted(
      raw.join(dfs, "sh").crossJoin(nDocs)
        .filter(col("df") * lit(graft.operators.LlmOps.D4DfDropDiv) <= col("n_docs"))
        .select("doc_id", "sh", "source", "len_bucket"))
    val sizes = rows.groupBy("doc_id").agg(count("*").as("nsh"))
    val inter = rows.toDF("doc_a", "sh", "source", "len_bucket")
      .join(rows.toDF("doc_b", "sh", "source", "len_bucket"),
        Seq("source", "len_bucket", "sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("source", "doc_a", "doc_b")
      .agg(count("*").as("i"))
    inter
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .select(
        col("source"), col("doc_a"), col("doc_b"),
        expr(graft.operators.LlmOps.milli("i", "na + nb - i")).as("jaccard_milli"))
      .filter(col("jaccard_milli") > 0)
  }

  /** d9 family with the candidate/verify JOINS keyed on the 60-bit
    * shingle hash while the prefix ORDER stays on (df, shingle string) —
    * the oracle's order — so candidates and output are unchanged.
    */
  private def d9PrefixH(toks: DataFrame): DataFrame = {
    import graft.operators.LlmOps
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("s"))
    val dfs = toks.groupBy("shingle").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("shingle"))
    toks.join(dfs, "shingle")
      .withColumn("rn", row_number().over(w))
      .join(sizes, "doc_id")
      .filter(col("rn") <= col("s") -
        expr(s"(${LlmOps.PrefixJaccardNum} * s + ${LlmOps.PrefixJaccardDen - 1}) div ${LlmOps.PrefixJaccardDen}") + 1)
      .select(col("doc_id"), col("sh"), col("rn"), col("s"))
  }

  private def d9CandH(toksH: DataFrame): DataFrame = {
    import graft.operators.LlmOps
    val prefix = PersistScope.persisted(d9PrefixH(toksH))
    val raw = prefix.toDF("doc_a", "sh", "rn_a", "sa")
      .join(prefix.toDF("doc_b", "sh", "rn_b", "sb"), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
    val grouped = raw.groupBy("doc_a", "doc_b", "sa", "sb")
      .agg(max(least(col("sa") - col("rn_a"), col("sb") - col("rn_b")) + 1).as("ub"))
    val lf = grouped.filter(least(col("sa"), col("sb")) * LlmOps.PrefixJaccardDen >=
      greatest(col("sa"), col("sb")) * LlmOps.PrefixJaccardNum)
    lf.filter(col("ub") * (LlmOps.PrefixJaccardNum + LlmOps.PrefixJaccardDen) >=
      lit(LlmOps.PrefixJaccardNum) * (col("sa") + col("sb")))
  }

  private def toksH(spark: SparkSession, dir: String): DataFrame =
    PersistScope.persisted(
      graft.operators.LlmOps.shingleRows(spark, dir).distinct()
        .withColumn("sh", expr("cast(conv(substring(md5(shingle), 1, 15), 16, 10) as bigint)")))

  def d9sA(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LlmOps.d9DegreeStats(spark, dir)

  def d9sB(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.LlmOps
    val cand = d9CandH(toksH(spark, dir))
    cand.select(col("doc_a").as("doc_id"))
      .unionAll(cand.select(col("doc_b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
      .withColumn("dropped", col("n_candidates") > LlmOps.D9DegreeCap)
  }

  def d9bA(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LlmOps.d9bPrefixGuarded(spark, dir)

  def d9bB(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.LlmOps
    val tk = toksH(spark, dir)
    val cand = PersistScope.persisted(d9CandH(tk))
    val over = cand.select(col("doc_a").as("doc_id"))
      .unionAll(cand.select(col("doc_b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
      .filter(col("n_candidates") > LlmOps.D9DegreeCap).select("doc_id")
    val kept = cand
      .join(over.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_anti")
      .join(over.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_anti")
    val inter = kept
      .join(tk.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(tk.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b", "sa", "sb").agg(count(lit(1)).as("i"))
    inter
      .filter(col("i") * LlmOps.PrefixJaccardDen >=
        lit(LlmOps.PrefixJaccardNum) * (col("sa") + col("sb") - col("i")))
      .select(col("doc_a"), col("doc_b"),
        expr(LlmOps.milli("i", "sa + sb - i")).as("jaccard_milli"))
  }

  /** Streaming fixed-cost probe as a variant: wall time IS the metric. */
  def stProbe(spark: SparkSession, dir: String): DataFrame = {
    val n = graft.streaming.Streaming.stSetupProbe(spark, dir)
    spark.range(1).select(lit(n).as("n"))
  }

  def st4(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.streamStreamJoin(spark, dir)

  /** st4 replicated with a configurable stream shuffle-partition count
    * (the shipped withStreamPartitions pins 8).
    */
  private def st4With(spark: SparkSession, dir: String, parts: Int): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val file = java.nio.file.Paths.get(s"$dir/events.parquet")
    val streamDir =
      if (java.nio.file.Files.isDirectory(file)) file.toString
      else {
        val d = java.nio.file.Files.createTempDirectory("graft_r16_events")
        java.nio.file.Files.createSymbolicLink(
          d.resolve("events.parquet"), file.toAbsolutePath)
        d.toString
      }
    val rawSchema = spark.read.parquet(file.toString).schema
    def ev() = graft.Tables.normalizeEventTs(
      spark.readStream.schema(rawSchema).parquet(streamDir))
    val signups = ev().filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "10 minutes")
    val purchases = ev().filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val joined = signups.join(purchases,
      col("s_user") === col("p_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 7 DAYS"))
    val outDir = java.nio.file.Files.createTempDirectory("graft_r16_st4").toString
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, parts.toString)
    try {
      val q = joined.writeStream
        .outputMode("append")
        .option("checkpointLocation", java.nio.file.Files.createTempDirectory("graft_r16_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .start()
      q.awaitTermination()
    } finally spark.conf.set(key, prev)
    spark.read.schema(joined.schema).parquet(outDir)
      .select(col("signup_id"), col("purchase_id"),
        col("s_user").as("user_id"), col("s_ts"), col("p_ts"))
  }

  def st4p2(spark: SparkSession, dir: String): DataFrame = st4With(spark, dir, 2)
  def st4p4(spark: SparkSession, dir: String): DataFrame = st4With(spark, dir, 4)
  def st4p8(spark: SparkSession, dir: String): DataFrame = st4With(spark, dir, 8)
  def st4p16(spark: SparkSession, dir: String): DataFrame = st4With(spark, dir, 16)
  def st4p32(spark: SparkSession, dir: String): DataFrame = st4With(spark, dir, 32)

  /** Run a named streaming catalog query under an explicit
    * spark.graft.stream.partitions value (A/B harness for the default).
    */
  private def stAt(q: String, parts: Int)(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.graft.stream.partitions", parts.toString)
    try graft.SparkEntry.queries(q)(spark, dir)
    finally spark.conf.unset("spark.graft.stream.partitions")
  }

  private def stVariants: Map[String, (SparkSession, String) => DataFrame] =
    (for {
      q <- Seq("st1_tumbling_window", "st2_sliding_window", "st3_session_window",
        "st4_stream_join", "st7_stream_left_join", "st10_stream_full_outer",
        "st5_stream_dedup", "st6_stream_static", "st8_stream_upsert",
        "st11_milestones", "st12_inactivity", "st13_ttl_state", "st14_stream_neardup")
      parts <- Seq(4, 8)
    } yield s"${q.split('_').head}p$parts" -> (stAt(q, parts) _)).toMap

  def t19A(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LlmOps.t19DupSpans(spark, dir)

  /** t19 with perDoc PINNED so the rolling-hash generate + (doc,hash)
    * aggregate run once instead of twice (the plan splits the unpinned
    * subtree into two full scan+generate passes).
    */
  def t19B(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.LlmOps
    val docs = Tables.documentsSpread(spark, dir)
      .filter(length(col("text")) >= LlmOps.SpanWindow)
      .select(col("doc_id"), col("text"))
    val perDoc = PersistScope.persisted(docs
      .select(col("doc_id"), expr(s"rolling_hashes(text, ${LlmOps.SpanWindow})"))
      .groupBy("doc_id", "hash").agg(min("pos").as("pos")))
    val crossDoc = perDoc.groupBy("hash")
      .agg(count(lit(1)).as("nd")).filter(col("nd") >= 2).select("hash")
    perDoc.join(crossDoc, "hash")
      .join(docs, "doc_id")
      .select(expr(s"md5(substring(text, pos + 1, ${LlmOps.SpanWindow}))").as("span_md5"))
      .groupBy("span_md5").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
  }

  def d7cA(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LlmOps.d7cResolveIngest(spark, dir)

  /** d7c with ONE PersistScope-pinned batch shingle table shared by the
    * batch->corpus band probe, the batch verify sets, and the
    * batch-internal d2 pipeline (shipped form recomputes it ~3x).
    */
  def d7cB(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.LlmOps
    val newSource = "src0"
    val stored = spark.table(
      s"${LlmOps.ensureLabelIndex(spark, dir, Some(newSource))}_labels")
    val bandPrefix = LlmOps.ensureCorpusIndex(spark, dir, excludeSource = newSource)
    val batchDocs = Tables.documentsSpread(spark, dir)
      .filter(col("source") === newSource)
    val batchShingles = PersistScope.persisted(batchDocs
      .select(col("doc_id"), expr("split(text, ' ')").as("toks"))
      .select(col("doc_id"), col("toks"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .filter(col("pos") <= size(col("toks")) - 3)
      .select(col("doc_id"),
        concat_ws(" ", col("tok"),
          element_at(col("toks"), col("pos") + 2),
          element_at(col("toks"), col("pos") + 3)).as("shingle")))
    val newBands = LlmOps.minhashBandsOf(batchShingles)
      .select(col("doc_id").as("new_doc"), col("band").as("band_n"), col("bkey").as("bkey_n"))
    val corpusBands = spark.table(s"${bandPrefix}_bands")
      .select(col("doc_id").as("existing_doc"), col("band"), col("bkey"))
    val candidates = newBands
      .join(corpusBands, col("band_n") === col("band") && col("bkey_n") === col("bkey"))
      .select("new_doc", "existing_doc")
      .distinct()
    val batchSets = PersistScope.persisted(batchShingles
      .groupBy("doc_id")
      .agg(sort_array(collect_set(expr(
        "cast(conv(substring(md5(shingle), 1, 15), 16, 10) as bigint)"))).as("sa"))
      .withColumnRenamed("doc_id", "new_doc"))
    val batchCorpus = candidates
      .join(batchSets, "new_doc")
      .join(spark.table(s"${bandPrefix}_shingles").toDF("existing_doc", "sb"), "existing_doc")
      .withColumn("i", expr("sorted_intersect_count(sa, sb)"))
      .select(col("new_doc"), col("existing_doc"),
        expr(LlmOps.milli("i", "size(sa) + size(sb) - i")).as("jaccard_milli"))
      .filter(col("jaccard_milli") >= LlmOps.ResolveThreshold)
      .select(col("new_doc").as("doc_a"), col("existing_doc").as("doc_b"))
    val batchInternal = LlmOps.d2DedupMinhashOf(batchShingles, keepZeroOverlap = false)
      .filter(col("jaccard_milli") >= LlmOps.ResolveThreshold)
      .select(col("doc_a"), col("doc_b"))
    val contracted = batchCorpus
      .join(stored.toDF("doc_b", "rep"), "doc_b")
      .select(col("doc_a"), col("rep").as("doc_b"))
      .unionByName(batchInternal)
    val (resolved, converged) = LlmOps.connectedComponents(contracted, LlmOps.MaxResolveRounds)
    val _ = converged
    val corpusNew = stored
      .join(resolved.toDF("canonical_id", "merged"), Seq("canonical_id"), "left")
      .select(col("doc_id"),
        coalesce(col("merged"), col("canonical_id")).as("canonical_id"))
    val batchNew = Tables.documents(spark, dir)
      .filter(col("source") === newSource)
      .select(col("doc_id"), col("doc_id").as("self"))
      .join(resolved.toDF("doc_id", "merged"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("merged"), col("self")).as("canonical_id"))
    corpusNew.unionByName(batchNew)
  }

  def q21A(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Tpch.q21(spark, dir)

  /** q21 with the EXISTS / NOT EXISTS pair folded into per-order
    * aggregates: EXISTS other-supplier == count(distinct supp) >= 2 over
    * ALL lines; NOT EXISTS other-late-supplier == count(distinct supp)
    * == 1 over LATE lines (l1 itself is late). One lineitem aggregate
    * replaces two semi/anti lineitem scans; output identical.
    */
  def q21B(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(spark, dir)
    spark.sql(
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + interval 60 days),
        |ostats AS (
        |  SELECT l_orderkey, count(DISTINCT l_suppkey) AS nsupp
        |  FROM lineitem GROUP BY l_orderkey),
        |lstats AS (
        |  SELECT l_orderkey, count(DISTINCT l_suppkey) AS nlate
        |  FROM late GROUP BY l_orderkey)
        |SELECT s_name, count(*) AS numwait
        |FROM late
        |JOIN ostats USING (l_orderkey)
        |JOIN lstats USING (l_orderkey)
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_4', 'NATION_5')
        |  AND nsupp >= 2 AND nlate = 1
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin)
  }

  val variants: Map[String, (SparkSession, String) => DataFrame] = stVariants ++ Map(
    "q21A" -> q21A _,
    "q21B" -> q21B _,
    "d7cA" -> d7cA _,
    "d7cB" -> d7cB _,
    "t19A" -> t19A _,
    "t19B" -> t19B _,
    "stProbe" -> stProbe _,
    "st4" -> st4 _,
    "st4p2" -> st4p2 _,
    "st4p4" -> st4p4 _,
    "st4p8" -> st4p8 _,
    "st4p16" -> st4p16 _,
    "st4p32" -> st4p32 _,
    "d9sA" -> d9sA _,
    "d9sB" -> d9sB _,
    "d9bA" -> d9bA _,
    "d9bB" -> d9bB _,
    "prA" -> pagerankA _,
    "prB" -> pagerankB _,
    "prC" -> pagerankC _,
    "m7Lag" -> m7Lag _,
    "m7New" -> m7New _,
    "m8Lag" -> m8Lag _,
    "m8New" -> m8New _,
    "d4A" -> d4A _,
    "d4B" -> d4B _)

  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(variants.keys.toSeq.sorted)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // Interleaved A/B: round-robin the variants so host drift hits all
    // sides equally (the r15 mix64 A/B discipline).
    val results = scala.collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector())
    for (r <- 0 to reps; v <- names) {
      val fn = variants(v)
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val el = (System.nanoTime() - t0) / 1e9
      PersistScope.releaseAll()
      spark.catalog.clearCache()
      System.gc()
      if (r > 0) results(v) :+= el // rep 0 = warm-up
      println(f"SCRATCH $v rep=$r ${el}%.3f s rows=$n")
    }
    names.foreach { v =>
      val rs = results(v).sorted
      if (rs.nonEmpty)
        println(f"SCRATCHMED $v median=${rs(rs.size / 2)}%.3f reps=${rs.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
