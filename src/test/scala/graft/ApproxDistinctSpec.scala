package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** The bounded-error contract for a6_approx_distinct (the one query with
  * no DuckDB oracle — HLL++ estimates are engine-specific): per group,
  * |approx − exact| / exact must stay within a few relative standard
  * deviations of the configured rsd (0.02).
  */
class ApproxDistinctSpec extends SparkTestBase {

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
