package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** The bounded-error contract for a6_approx_distinct (the one query with
  * no DuckDB oracle — HLL++ estimates are engine-specific): per group,
  * |approx − exact| / exact must stay within a few relative standard
  * deviations of the configured rsd (0.02).
  */
class ApproxDistinctSpec extends SparkTestBase {

  test("approx_percentile lands within the exact p40..p60 rank window") {
    val row = Tables.orders(spark, Sf)
      .agg(
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_median"),
        expr("percentile(o_totalprice, 0.4)").as("p40"),
        expr("percentile(o_totalprice, 0.6)").as("p60"))
      .collect()(0)
    val (approx, p40, p60) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(approx >= p40 && approx <= p60,
      s"approx median $approx outside exact rank window [$p40, $p60]")
  }

  test("a12 per-group approx percentiles land within exact rank windows") {
    val approx = Relational.a12ApproxPercentile(spark, Sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.orders(spark, Sf)
      .groupBy("o_orderstatus")
      .agg(
        expr("percentile(o_totalprice, 0.45)").as("p45"),
        expr("percentile(o_totalprice, 0.55)").as("p55"),
        expr("percentile(o_totalprice, 0.85)").as("p85"),
        expr("percentile(o_totalprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(approx.keySet === exact.keySet && approx.nonEmpty)
    exact.foreach { case (k, (p45, p55, p85, p95)) =>
      val (a50, a90) = approx(k)
      assert(a50 >= p45 && a50 <= p55, s"group $k: p50 $a50 outside [$p45, $p55]")
      assert(a90 >= p85 && a90 <= p95, s"group $k: p90 $a90 outside [$p85, $p95]")
    }
  }

  test("a14 merged day-sketches match exact weekly distincts within HLL error") {
    val approx = Relational.a14HllMerge(spark, Sf)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val exact = Tables.events(spark, Sf)
      .select(date_trunc("WEEK", col("ts")).cast("date").as("week"), col("user_id"))
      .groupBy("week").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet && approx.nonEmpty,
      "sketch-merge weeks must equal the exact rollup's weeks")
    exact.foreach { case (week, ex) =>
      val ap = approx(week)
      val relErr = math.abs(ap - ex).toDouble / ex
      // Default lgConfigK=12 → rsd ≈ 1.6%%; allow 5× — union of sketches
      // adds no error beyond the base sketch's.
      assert(relErr <= 5 * 0.016,
        s"week $week: approx=$ap exact=$ex relErr=$relErr")
    }
  }

  test("approx_count_distinct stays within 3×rsd of the exact count per group") {
    val approx = Relational.aApproxDistinct(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, Sf)
      .groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      val relErr = math.abs(ap - ex).toDouble / ex
      assert(relErr <= 3 * 0.02,
        s"group $k: approx=$ap exact=$ex relErr=$relErr exceeds 3×rsd")
    }
  }
}
