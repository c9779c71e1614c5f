package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Tpch

/** Plan-shape and semantic locks for the suite-completion TPC-H queries
  * (Q2, Q7–Q9, Q11, Q13, Q15–Q17, Q19–Q22). Correctness vs DuckDB is the
  * driver's job; these tests pin the physical properties the 100 TB
  * posture depends on — subqueries must decorrelate into hash joins, the
  * EXISTS family must never fall back to a nested loop, ordered limits
  * must stay bounded — plus the semantic edges sf0.01 happens to
  * exercise only thinly.
  */
class TpchSpec extends SparkTestBase {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("q21's EXISTS / NOT EXISTS plan as hash semi/anti joins, never a nested loop") {
    val p = plan(Tpch.q21(spark, Sf))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the orderkey equality must carry the correlation as a hash join key")
    assert(p.contains("LeftSemi"), "EXISTS must plan as a semi join")
    assert(p.contains("LeftAnti"), "NOT EXISTS must plan as an anti join")
  }

  test("q2's correlated min decorrelates; the limit is a bounded TakeOrdered") {
    val p = plan(Tpch.q2(spark, Sf))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the scalar MIN must decorrelate into an aggregate-then-join on partkey")
    assert(p.contains("TakeOrderedAndProject"),
      "ORDER BY + LIMIT must stay a partial top-k, never a global sort")
  }

  test("q17's correlated average decorrelates into a per-part aggregate join") {
    val p = plan(Tpch.q17(spark, Sf))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // The decorrelated aggregate groups by the correlation key.
    assert(p.contains("avg("), "the per-part average must survive decorrelation")
  }

  test("q13 keeps zero-order customers: priority filter lives in the join, not WHERE") {
    val rows = Tpch.q13(spark, Sf).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Every customer row survives the left join; the histogram must
    // therefore account for all of them.
    val nCustomers = Tables.customer(spark, Sf).count()
    assert(rows.values.sum === nCustomers)
  }

  test("q15 keeps ALL argmax suppliers (equality, not LIMIT 1)") {
    val df = Tpch.q15(spark, Sf)
    val totals = df.select("total_cents").collect().map(_.getLong(0)).toSet
    assert(totals.size === 1, "every returned supplier ties on the max revenue")
    assert(df.count() >= 1)
  }

  test("q19's disjunctive filter still broadcasts the part side") {
    val p = plan(Tpch.q19(spark, Sf))
    assert(p.contains("BroadcastHashJoin"), "part is dimension-sized; the OR filter must not force a shuffle join")
  }

  test("q22's threshold math is integer-exact and its anti join is hashed") {
    val p = plan(Tpch.q22(spark, Sf))
    assert(p.contains("LeftAnti"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_triangles' closing join stays a hash join, never a sort-merge") {
    // Sort-merge would SORT the wedge stream (41M rows at sf0.1,
    // measured 25 s vs 8.5 s) — the shuffle_hash hint must survive.
    val p = plan(graft.operators.Graph.qTriangles(spark, Sf))
    assert(p.contains("ShuffledHashJoin"),
      s"expected the hinted shuffled hash join in:\n${p.take(1500)}")
  }
}
