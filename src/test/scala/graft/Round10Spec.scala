package graft

import org.apache.spark.sql.functions._

import graft.operators.{Delta, LlmOps, Scale}

/** Round-10 additions: quality-aware dedup resolution (d12), the
  * order-independent table checksum, and incremental rollup maintenance.
  */
class Round10Spec extends SparkTestBase {

  // -------------------------------------------------------------------
  // d12: quality-aware survivor election.
  // -------------------------------------------------------------------

  test("d12 elects the highest-quality group member, not the minimum id") {
    import spark.implicits._
    val dir = tempDir("d12")
    // One near-dup pair: doc 20 = doc 10's 12 words plus one extra unique
    // word (shingle Jaccard 10/11 ≈ 909‰ ≥ ResolveThreshold). t3 quality
    // grows with token count below the 100-token cap, so the LONGER doc
    // (20) must win the election while the GROUP key stays min-id (10).
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val docs = Seq(
      (10L, base),
      (20L, base + " mike"),
      (30L, "november oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee"))
      .map { case (id, text) => (id, text, "en", "src0", text.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = LlmOps.d12QualityResolve(spark, dir)
      .select("doc_id", "canonical_id", "keep_id", "is_kept")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (10L, 10L, 20L, 0L),   // grouped under min-id 10, survivor is 20
      (20L, 10L, 20L, 1L),
      (30L, 30L, 30L, 1L)))  // singleton keeps itself
  }

  test("d12 breaks quality ties toward the minimum doc_id") {
    import spark.implicits._
    val dir = tempDir("d12_tie")
    // Identical texts → identical quality; the survivor must then be the
    // smaller id, deterministically.
    val text = "one two three four five six seven eight nine ten eleven twelve"
    Seq((7L, text), (3L, text))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = LlmOps.d12QualityResolve(spark, dir)
      .select("doc_id", "keep_id", "is_kept")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((3L, 3L, 1L), (7L, 3L, 0L)))
  }

  test("d12 keeps a null-text document as its own singleton survivor") {
    import spark.implicits._
    val dir = tempDir("d12_null")
    // Null text → null t3 quality. The election pins that to -1 (below
    // every real score) so the doc still elects itself in its singleton
    // group instead of diverging between engines (the oracle's
    // window-max ignores NULLs and would drop the group entirely).
    Seq((1L, "alpha bravo charlie delta echo foxtrot golf hotel"),
        (2L, null: String))
      .map { case (id, t) =>
        (id, t, "en", "src0", Option(t).map(_.length.toLong).getOrElse(0L)) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = LlmOps.d12QualityResolve(spark, dir)
      .select("doc_id", "canonical_id", "keep_id", "is_kept")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 1L, 1L, 1L), (2L, 2L, 2L, 1L)))
  }

  test("d12 emits exactly one survivor per group on the fixture corpus") {
    val perGroup = LlmOps.d12QualityResolve(spark, Sf)
      .groupBy("canonical_id")
      .agg(sum("is_kept").as("n_kept"))
      .filter(col("n_kept") =!= 1L)
    assert(perGroup.isEmpty, "every component must elect exactly one survivor")
  }

  // -------------------------------------------------------------------
  // Table checksum.
  // -------------------------------------------------------------------

  test("checksum is invariant under row order and partitioning") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, s"v$i", if (i % 7 == 0) null else s"w$i"))
      .toDF("id", "a", "b")
    val cols = Seq("id", "a", "b")
    val direct = Delta.tableChecksum(df, cols).collect()(0)
    val shuffled = Delta.tableChecksum(
      df.repartition(13, col("a")).sortWithinPartitions(desc("id")), cols).collect()(0)
    assert(direct === shuffled)
  }

  test("checksum detects a single changed row and null-vs-value swaps") {
    import spark.implicits._
    val base = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "a")
    val oneOff = (1 to 100).map(i => (i.toLong, if (i == 42) "vX" else s"v$i")).toDF("id", "a")
    val cols = Seq("id", "a")
    val h0 = Delta.tableChecksum(base, cols).collect()(0)
    val h1 = Delta.tableChecksum(oneOff, cols).collect()(0)
    assert(h0.getLong(0) === h1.getLong(0))   // same row count
    assert(h0.getLong(1) !== h1.getLong(1))   // xor catches the flip
    // Prefix-free token encoding: (NULL,"x") and ("x",NULL) must not
    // collide (the concat-naive encoding would).
    val nx = Delta.tableChecksum(Seq((null: String, "x")).toDF("a", "b"), Seq("a", "b")).collect()(0)
    val xn = Delta.tableChecksum(Seq(("x", null: String)).toDF("a", "b"), Seq("a", "b")).collect()(0)
    assert(nx.getLong(1) !== xn.getLong(1))
  }

  // -------------------------------------------------------------------
  // Incremental rollup maintenance.
  // -------------------------------------------------------------------

  test("maintained rollup + tail recompute equals the flat full recompute") {
    val merged = Scale.qIncrementalRollup(spark, Sf)
    val flat = Tables.events(spark, Sf)
      .select(to_date(col("ts")).as("day"), col("event_type"),
        expr("cast(round(value * 1000) as bigint)").as("value_milli"))
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n_events"), sum("value_milli").as("total_value_milli"))
    assert(merged.exceptAll(flat).isEmpty && flat.exceptAll(merged).isEmpty)
    // Both sides of the cutoff must actually contribute, and that has to
    // be CHECKED, not assumed (reviewer finding: merged.count() > 0 stays
    // green even when the fixture shrinks to <= 3 days and the
    // materialized-rollup path runs on zero rows — the equivalence then
    // passes vacuously as tail-only ≡ flat). The fixture must span more
    // days than the 3-day open tail for the partial-aggregate merge to
    // actually be exercised.
    val nDays = Tables.events(spark, Sf)
      .select(to_date(col("ts")).as("day")).distinct().count()
    assert(nDays > 3,
      s"events fixture spans only $nDays day(s); the rollup side is empty " +
        "and this test no longer proves the increment == recompute merge")
  }

  // -------------------------------------------------------------------
  // Adjacency-intersection triangle counting.
  // -------------------------------------------------------------------

  test("sorted_intersect_count merges like size(array_intersect) on sorted sets") {
    import spark.implicits._
    // Hand cases: disjoint, identical, interleaved, empty, asymmetric.
    val hand = Seq(
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L), 0L),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3L),
      (Seq(1L, 4L, 7L, 9L), Seq(4L, 5L, 9L), 2L),
      (Seq.empty[Long], Seq(1L, 2L), 0L),
      (Seq(5L), Seq(1L, 2L, 3L, 4L, 5L), 1L))
    hand.foreach { case (a, b, want) =>
      val got = Seq((a, b)).toDF("a", "b")
        .selectExpr("sorted_intersect_count(a, b) AS c").as[Long].head()
      assert(got === want, s"merge($a, $b)")
    }
    // Randomized cross-check against the built-in on sorted distinct
    // arrays (seeded: spec determinism).
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(20))(rnd.nextInt(30).toLong).distinct.sorted
      (arr(), arr())
    }
    val bad = rows.toDF("a", "b")
      .selectExpr("sorted_intersect_count(a, b) AS got",
        "cast(size(array_intersect(a, b)) AS BIGINT) AS want")
      .filter(col("got") =!= col("want"))
    assert(bad.isEmpty, "merge-count disagrees with array_intersect")
  }

  test("q_triangles_adj matches the wedge-join count on the fixture graph") {
    import graft.operators.Graph
    val adj = Graph.qTrianglesAdj(spark, Sf).collect()(0)
    val wedge = Graph.qTriangles(spark, Sf).collect()(0)
    assert(adj === wedge)
    assert(adj.getLong(2) > 0, "fixture co-purchase graph must contain triangles")
  }

  // An adaptive plan's toString prints Final AND Initial sections;
  // plan-shape counts must scope to the final one.
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)

  test("checksum plan is one map-combined fold to a single row") {
    val df = Delta.qTableChecksum(spark, Sf)
    df.collect()
    val p = finalPlan(df)
    // The only exchange allowed is the final SinglePartition gather of
    // per-partition partials — a hashpartitioning exchange would mean
    // the fold shuffles row-level data, which must never happen for a
    // commutative fingerprint over a 100 TB table.
    assert("Exchange".r.findAllIn(p).length === 1, s"extra exchange:\n$p")
    assert(p.contains("Exchange SinglePartition"), s"wrong exchange kind:\n$p")
    assert(p.contains("partial_"), s"no map-side partial aggregation:\n$p")
  }

  test("incremental rollup's returned plan reads events once (tail only)") {
    val df = Scale.qIncrementalRollup(spark, Sf)
    df.collect()
    val p = finalPlan(df)
    // Two parquet scans: the materialized closed-days rollup and the
    // events TAIL delta. A third scan would mean the merge re-reads the
    // event history the rollup exists to avoid.
    assert("Scan parquet".r.findAllIn(p).length === 2,
      s"expected rollup + tail scans only:\n$p")
  }

  test("native sorted_intersect_count stays inside whole-stage codegen") {
    import graft.operators.Graph
    val df = Graph.qTrianglesAdj(spark, Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val line = p.linesIterator.find(l =>
      l.contains("sorted_intersect_count") && l.contains("Project"))
    assert(line.isDefined, s"no sorted_intersect_count projection in plan:\n$p")
    assert(line.get.contains("*("),
      s"sorted_intersect_count projection not codegen'd: ${line.get}")
  }
}
