package graft.tools

import org.apache.spark.sql.functions._

import graft.{PersistScope, Sessions, SparkEntry}
import graft.operators.{Graph, LlmOps}

/** Round-9 scale diagnosis: stage-by-stage row counts and timings for the
  * queries the sf1 sweep flagged superlinear (d2/d6/d9 dedup, d7 resolve,
  * q_triangles_idx, t26/t27), so the superlinearity can be ATTRIBUTED —
  * output/candidate growth inherent to the corpus vs a plan regression —
  * instead of argued. Run at sf0.1 and the ScaleUp sf1 dir and compare.
  * Not part of the library surface.
  */
object ScaleDiag {
  private def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"DIAG $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }
  private def n(name: String, v: Long): Unit = println(f"DIAG $name%-34s rows=$v")

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val which: Set[String] =
      args.headOption.map(_.split(',').toSet)
        .getOrElse(Set("d2", "d6", "d9", "d7", "tri", "t27", "st"))
    println(s"DIAG dir=$dir")
    spark.read.parquet(s"$dir/documents.parquet").count() // warm session

    def reset(): Unit = { PersistScope.releaseAll(); spark.catalog.clearCache(); System.gc() }

    if (which("d2")) {
      val shingles = PersistScope.persisted(LlmOps.shingleRows(spark, dir))
      n("d2.shingle_rows", time("d2.shingle_rows")(shingles.count()))
      val bands = PersistScope.persisted(LlmOps.minhashBandsOf(shingles))
      n("d2.band_rows", time("d2.band_rows")(bands.count()))
      val occ = LlmOps.bandBucketStats(bands).persist()
      val over = occ.filter(col("dropped")).agg(
        coalesce(count(lit(1)), lit(0L)).as("k"),
        coalesce(sum("n_docs"), lit(0L)).as("docs"),
        coalesce(max("n_docs"), lit(0L)).as("mx")).head()
      println(s"DIAG d2.overcap_buckets=${over.getLong(0)} docs_in_overcap=${over.getLong(1)} max_bucket=${over.getLong(2)}")
      // Explicit column order before the positional toDF rename (r10
      // finding: the post-join order is (band, bkey, doc_id), so renaming
      // positionally made doc_a = band and this probe counted 0
      // candidates — round-9's d2 candidate numbers were invalid).
      val kept = bands.join(
        occ.filter(!col("dropped")).select("band", "bkey"), Seq("band", "bkey"))
        .select("doc_id", "band", "bkey")
      val cand = kept.toDF("doc_a", "band_a", "bkey_a")
        .join(kept.toDF("doc_b", "band_b", "bkey_b"),
          col("band_a") === col("band_b") && col("bkey_a") === col("bkey_b"))
        .filter(col("doc_a") < col("doc_b"))
      n("d2.cand_raw", time("d2.cand_raw")(cand.count()))
      n("d2.cand_distinct", time("d2.cand_distinct")(
        cand.select("doc_a", "doc_b").distinct().count()))
      occ.unpersist()
      reset()
      n("d2.out", time("d2.full")(LlmOps.d2DedupMinhash(spark, dir).count()))
      reset()
    }

    if (which("d6")) {
      val sig = PersistScope.persisted(LlmOps.d3Simhash(spark, dir))
      n("d6.sig", time("d6.sig(d3_simhash)")(sig.count()))
      val bands = PersistScope.persisted(LlmOps.d6Bands(sig))
      n("d6.band_rows", time("d6.band_rows")(bands.count()))
      // Half-band occupancy (VERDICT r9 item 3): how dense the 16-bit
      // half buckets get on the near-dup corpus, and whether the
      // LshBucketCap guard engaged (capBandBuckets runs inside d6Bands,
      // so `dropped` here means would-have-dropped occupancy measured on
      // the PRE-cap table).
      val occ = LlmOps.bandBucketStats(
        sig.select(col("doc_id"),
          posexplode(array(expr("simhash & 65535"),
            expr("shiftright(simhash, 16) & 65535"))).as(Seq("band", "bkey")))).persist()
      val st = occ.agg(
        count(lit(1)).as("buckets"),
        max("n_docs").as("max_occ"),
        coalesce(count(when(col("dropped"), 1)), lit(0L)).as("overcap"),
        coalesce(sum(when(col("dropped"), col("n_docs"))), lit(0L)).as("docs_overcap")).head()
      println(s"DIAG d6.buckets=${st.getLong(0)} max_occ=${st.getLong(1)} " +
        s"overcap=${st.getLong(2)} docs_in_overcap=${st.getLong(3)}")
      n("d6.cand_distinct", time("d6.cand_distinct")(LlmOps.d6Candidates(bands).count()))
      occ.unpersist()
      reset()
      n("d6.out", time("d6.full")(LlmOps.d6SimhashNeardup(spark, dir).count()))
      reset()
    }

    if (which("d9")) {
      // Stage builders come from LlmOps itself (advisor finding: this
      // block used to hand-copy the prefix/filter expressions and could
      // silently de-sync from the query it attributes).
      val toks = PersistScope.persisted(LlmOps.shingleRows(spark, dir).distinct())
      n("d9.toks_distinct", time("d9.toks_distinct")(toks.count()))
      val prefix = PersistScope.persisted(LlmOps.d9Prefix(toks))
      n("d9.prefix_rows", time("d9.prefix_rows")(prefix.count()))
      val raw = LlmOps.d9PairsRaw(prefix)
      n("d9.prefix_pairs_raw", time("d9.prefix_pairs_raw")(raw.count()))
      val grouped = LlmOps.d9Grouped(raw)
      n("d9.cand_grouped", time("d9.cand_grouped")(grouped.count()))
      val lenOk = LlmOps.d9LengthFilter(grouped)
      n("d9.cand_len", time("d9.cand_len")(lenOk.count()))
      n("d9.cand_pos", time("d9.cand_pos")(LlmOps.d9PositionFilter(lenOk).count()))
      reset()
      n("d9.out", time("d9.full")(LlmOps.d9PrefixJoin(spark, dir).count()))
      reset()
    }

    if (which("d7")) {
      n("d7.edges", time("d7.edges(d2>=thr)")(
        LlmOps.d2DedupMinhash(spark, dir)
          .filter(col("jaccard_milli") >= LlmOps.ResolveThreshold).count()))
      reset()
      n("d7.out", time("d7.full")(LlmOps.d7DedupResolve(spark, dir).count()))
      reset()
    }

    if (which("tri")) {
      // Same prefix qTrianglesIndexed derives, so the probes below hit
      // the table this build creates instead of rebuilding their own.
      val prefix = "tri_idx_" + java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      time("tri.build_index")(Graph.buildEdgeIndex(spark, dir, prefix))
      reset()
      // Probe only: the table now exists, so qTrianglesIndexed skips the build.
      n("tri.out", time("tri.probe_1")(Graph.qTrianglesIndexed(spark, dir).count()))
      reset()
      time("tri.probe_2")(Graph.qTrianglesIndexed(spark, dir).count())
      reset()
      time("tri.unindexed")(Graph.qTriangles(spark, dir).count())
      reset()
    }

    if (which("st")) {
      // Setup-vs-processing split (VERDICT r9 item 7): the probe is a
      // pass-through stream paying every per-query fixed cost (engine
      // spin-up, fresh checkpoint, source listing, one batch cycle) and
      // none of the stateful work; processing ≈ rep − probe median.
      (1 to 3).foreach { i =>
        time(s"st.setup_probe.rep$i")(
          graft.streaming.Streaming.stSetupProbe(spark, dir))
        reset()
      }
      Seq("st1_tumbling_window", "st4_stream_join", "st7_stream_left_join",
        "st10_stream_full_outer").foreach { q =>
        val fn = SparkEntry.queries(q)
        (1 to 2).foreach { i => time(s"$q.rep$i")(fn(spark, dir).count()); reset() }
      }
    }

    if (which("t27")) {
      Seq("t26_bigram_lm", "t27_bigram_topk").foreach { q =>
        val fn = SparkEntry.queries(q)
        fn(spark, dir).count(); reset() // warm-up
        (1 to 3).foreach { i => time(s"$q.rep$i")(fn(spark, dir).count()); reset() }
      }
    }

    spark.stop()
  }
}
