package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.RangeJoinRewrite

/** The auto range-join rewrite, proven on plans AND rows: with the conf
  * set, a naive inequality join stops planning a nested loop and returns
  * exactly the rows it returned with the rule off.
  */
class RangeJoinRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private def points: DataFrame = (-50L to 400L).map(v => (v, v % 7)).toDF("v", "tag")
  private def ranges: DataFrame = Seq(
    (0L, -45L, -20L), (1L, -10L, 12L), (2L, -3L, 3L),
    (3L, 7L, 7L), (4L, 30L, 61L), (5L, 350L, 500L)).toDF("rid", "lo", "hi")

  private def naive: DataFrame =
    points.join(ranges, col("v") >= col("lo") && col("v") < col("hi"))
      .select("rid", "v", "tag")

  private def withWidth[A](w: Long)(body: => A): A = {
    spark.conf.set(RangeJoinRewrite.ConfKey, w.toString)
    try body finally spark.conf.unset(RangeJoinRewrite.ConfKey)
  }

  test("rule off: naive range join plans a nested loop (the baseline)") {
    val plan = naive.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"expected BNLJ baseline:\n$plan")
  }

  test("rule on: join becomes a bucketed equi-join with identical rows") {
    val expected = naive.collect().toSeq.sortBy(_.toString)
    withWidth(16L) {
      val rewritten = naive
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rewrite should remove the nested loop:\n$plan")
      assert(plan.contains("Generate") || plan.contains("explode"),
        s"expected the bucket explode in the plan:\n$plan")
      assert(rewritten.collect().toSeq.sortBy(_.toString) === expected)
    }
  }

  test("strict and non-strict upper bounds both match the naive rows") {
    // Plan inside withWidth: a Dataset caches its executed plan on first
    // access, so the query must be BUILT while the conf is set.
    def closed = points.join(ranges, col("v") >= col("lo") && col("v") <= col("hi"))
      .select("rid", "v")
    val expected = closed.collect().toSeq.sortBy(_.toString)
    withWidth(10L) {
      val rewritten = closed
      assert(rewritten.collect().toSeq.sortBy(_.toString) === expected)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  test("points on the RIGHT side of the join rewrite too") {
    // Same join stated with the ranges table as the left relation —
    // exercises the pointFromLeft=false branch of the rule.
    def flipped = ranges.join(points, col("v") >= col("lo") && col("v") < col("hi"))
      .select("rid", "v", "tag")
    val expected = flipped.collect().toSeq.sortBy(_.toString)
    withWidth(16L) {
      val rewritten = flipped
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"flipped rewrite should remove the nested loop:\n$plan")
      assert(rewritten.collect().toSeq.sortBy(_.toString) === expected)
    }
  }

  test("SQL-text inequality joins rewrite identically") {
    points.createOrReplaceTempView("rjr_points")
    ranges.createOrReplaceTempView("rjr_ranges")
    def sqlJoin = spark.sql(
      "SELECT rid, v FROM rjr_points JOIN rjr_ranges ON v >= lo AND v < hi")
    val expected = sqlJoin.collect().toSeq.sortBy(_.toString)
    withWidth(16L) {
      val rewritten = sqlJoin
      assert(!rewritten.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(rewritten.collect().toSeq.sortBy(_.toString) === expected)
    }
  }

  test("outer joins are never rewritten (rule matches Inner only)") {
    def outer = points.join(ranges,
      col("v") >= col("lo") && col("v") < col("hi"), "left_outer")
    val expected = outer.count()
    withWidth(16L) {
      val o = outer
      assert(!o.queryExecution.optimizedPlan.toString.contains("__range_bucket"))
      assert(o.count() === expected)
    }
  }

  test("equi-joins and non-integral bounds are left untouched") {
    withWidth(16L) {
      // An equi-join with a residual range predicate keeps its shape.
      val equi = points.withColumn("pk", col("v") % 3)
        .join(ranges.withColumn("rk", col("rid") % 3),
          col("pk") === col("rk") && col("v") >= col("lo"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__range_bucket"))
      // Double-typed bounds: no rewrite (buckets would be approximate).
      val dPoints = points.select(col("v").cast("double").as("dv"))
      val dRanges = ranges.select(col("lo").cast("double").as("dlo"),
        col("hi").cast("double").as("dhi"))
      val d = dPoints.join(dRanges, col("dv") >= col("dlo") && col("dv") < col("dhi"))
      assert(!d.queryExecution.optimizedPlan.toString.contains("__range_bucket"))
    }
  }
}
