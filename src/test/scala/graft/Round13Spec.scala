package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Round-13 additions: the materialized IVF inverted-list index
  * (sim_ivf_idx / sim_ivf_recall_idx / sim_ivf_ingest).
  *
  * The index contract is the d7b one — "pure optimization": every stored
  * form must return EXACTLY its recompute twin's rows, the lists table
  * must be laid out partitioned by pivot (the probe's pruning key), and
  * the ingest must touch only batch-proportional work.
  */
class Round13Spec extends SparkTestBase {

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.toSeq === b.columns.toSeq)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("sim_ivf_idx: the stored inverted lists equal the full recompute") {
    val viaIndex = Similarity.simIvfTopkIdx(spark, Sf)
    val recompute = Similarity.simIvfTopk(spark, Sf)
    assertSameRows(viaIndex, recompute)
    assert(viaIndex.count() > 0)
  }

  test("sim_ivf_recall_idx equals the recomputed recall curve") {
    assertSameRows(
      Similarity.simIvfRecallIdx(spark, Sf),
      Similarity.simIvfRecall(spark, Sf))
  }

  test("the lists table is partitioned by pivot — the probe's pruning key") {
    val prefix = Similarity.ensureIvfIndex(spark, Sf)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(s"${prefix}_lists"))
    assert(meta.partitionColumnNames === Seq("pivot"),
      s"lists must be partitioned by pivot; got ${meta.partitionColumnNames}")
    // A probe of IvfProbes lists must not need every partition: the
    // stored layout exposes one directory per pivot, and the fixture
    // corpus populates several of them (a single-partition table would
    // make the pruning claim vacuous).
    val nLists = spark.table(s"${prefix}_lists")
      .select("pivot").distinct().count()
    assert(nLists > Similarity.IvfProbes,
      s"fixture must populate more lists than a probe touches; got $nLists")
  }

  test("q_triangles_adj_ingest equals the full rebuild on corpus ∪ batch") {
    import graft.operators.Graph
    // The maintained totals (stored stats + term A + term B) must equal
    // the from-scratch count over ALL lineitem — the same contract the
    // DuckDB oracle enforces at sf0.01; here it is pinned in-process so
    // a future refactor cannot drift between verify runs.
    val maintained = Graph.qTrianglesAdjIngest(spark, Sf)
    val rebuilt = graft.operators.Graph.qTriangles(spark, Sf)
    assertSameRows(maintained, rebuilt)
    // The fixture must actually exercise the delta terms: the batch has
    // to add edges (otherwise the test pins only the stored stats row).
    import spark.implicits._
    val storedEdges = {
      val prefix = Graph.ensureTriIngestIndex(spark, Sf)
      spark.table(s"${prefix}_stats").select("n_edges").as[Long].head()
    }
    val totalEdges = rebuilt.select("n_edges").as[Long].head()
    assert(totalEdges > storedEdges,
      s"batch must add edges: stored $storedEdges vs total $totalEdges")
    PersistScope.releaseAll()
  }

  test("the ingest's stored tables are bucketed on their probe keys") {
    import graft.operators.Graph
    val prefix = Graph.ensureTriIngestIndex(spark, Sf)
    // Both attach joins key on `node`; the adjacency scan must satisfy
    // a node-keyed aggregate with no exchange in front (the Round12
    // label-index assertion, applied to the graph snapshot).
    val agged = spark.table(s"${prefix}_adj")
      .groupBy("node").agg(count(lit(1)).as("n"))
    agged.count()
    val plan = agged.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"),
      s"adjacency should scan bucketed under a node aggregate; plan:\n$plan")
    assert(!plan.contains("Exchange"),
      s"the node aggregate must reuse the bucket distribution; plan:\n$plan")
  }

  test("sim_ivf_ingest assigns exactly the batch, matching the full assignment") {
    import spark.implicits._
    val ingest = Similarity.simIvfIngest(spark, Sf)
      .as[(Long, Long)].collect().toMap
    // Batch membership: vec_id ≡ mod−1 (and nothing else).
    assert(ingest.nonEmpty)
    assert(ingest.keys.forall(_ % Similarity.IvfIngestMod == Similarity.IvfIngestMod - 1))
    // Each batch vector's pivot equals what the FULL corpus assignment
    // (the stored index) holds for it — ingest is the same math over
    // fewer rows, never a different answer.
    val prefix = Similarity.ensureIvfIndex(spark, Sf)
    val stored = spark.table(s"${prefix}_lists")
      .select(col("vec_id"), col("pivot"))
      .as[(Long, Long)].collect().toMap
    ingest.foreach { case (vec, piv) =>
      assert(stored(vec) === piv, s"vec $vec: ingest pivot $piv != stored ${stored(vec)}")
    }
    PersistScope.releaseAll()
  }

  test("per-row and aggregating minhash formulations produce identical bands") {
    // st14's stream side computes the signature per row (array HOFs over
    // the carried shingle array); minhashBandsOf computes it through a
    // groupBy. The expressions are shared (LlmOps.perRowMinExprs /
    // bandKeyExprs), but the parity of the two PLANS is the contract the
    // stream gate rests on — a drift means stream docs silently stop
    // colliding with stored corpus bands. Lock it on the real corpus.
    import graft.operators.LlmOps
    val docs = Tables.documents(spark, Sf)
    // Both sides shingle through the SHARED LlmOps.shingleArrayExpr
    // (advisor finding r13: an inline copy here let the shingle layer
    // drift while this test still passed).
    val aggregated = LlmOps.minhashBandsOf(
      docs.selectExpr("doc_id", "split(text, ' ') AS toks")
        .where("size(toks) >= 3")
        .selectExpr("doc_id",
          s"explode(${LlmOps.shingleArrayExpr("toks")}) AS shingle"))
    val perRow = docs
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .where("size(toks) >= 3")
      .selectExpr("doc_id", s"${LlmOps.shingleArrayExpr("toks")} AS sh")
      // The r15 per-row contract takes the PRE-HASHED array (one
      // hash60 per shingle, eight multiply-shift passes) — the same
      // shape st14's stream side feeds it.
      .selectExpr("doc_id",
        s"transform(array_distinct(sh), x -> ${LlmOps.shingleHash60("x")}) AS sa")
      .selectExpr("doc_id" +: LlmOps.perRowMinExprs("sa"): _*)
      .selectExpr("doc_id",
        s"posexplode(array(${LlmOps.bandKeyExprs.mkString(", ")})) AS (band, bkey)")
    assert(aggregated.exceptAll(perRow).count() === 0)
    assert(perRow.exceptAll(aggregated).count() === 0)
    assert(perRow.count() > 0)
  }

  test("the minhash signature aggregate hash-aggregates (no SortAggregate)") {
    // The r13 int64 signature exists exactly so this aggregate stops
    // being a SortAggregate (min over md5 hex strings has no fixed-width
    // buffer); lock the plan so a future hash-type change can't silently
    // regress the dedup family's dominant operator.
    import graft.operators.LlmOps
    val d2 = LlmOps.d2DedupMinhash(spark, Sf)
    d2.count()
    val plan = d2.queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"),
      s"d2's plan should carry no SortAggregate; plan:\n${plan.take(4000)}")
    assert(plan.contains("HashAggregate"))
    PersistScope.releaseAll()
  }
}
