package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale

/** The 100 TB claims, checked on the physical plan:
  *  - a bucketed fact×fact join runs with ZERO shuffle exchanges;
  *  - a salted join returns exactly the rows of the plain join.
  */
class ScaleSpec extends SparkTestBase {

  test("bucketed join on the bucket key has no shuffle exchange") {
    Scale.writeBucketed(
      Tables.orders(spark, Sf).select("o_orderkey", "o_custkey", "o_totalprice"),
      "bucketed_orders", "o_orderkey", 8)
    Scale.writeBucketed(
      Tables.lineitem(spark, Sf).select("l_orderkey", "l_quantity"),
      "bucketed_lineitem", "l_orderkey", 8)
    val joined = spark.table("bucketed_orders")
      .join(spark.table("bucketed_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
    assert(joined.count() === Tables.lineitem(spark, Sf).count())
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle; plan:\n$plan")
  }

  test("salted join returns exactly the plain join's rows") {
    val orders = Tables.orders(spark, Sf)
    val customer = Tables.customer(spark, Sf)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = orders.join(customer, "o_custkey")
      .select("o_orderkey", "c_mktsegment")
    val salted = Scale.saltedEquiJoin(orders, customer, "o_custkey",
      salts = 4, bigUniqueCol = "o_orderkey")
      .select("o_orderkey", "c_mktsegment")
    assert(plain.count() === salted.count())
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.exceptAll(plain).count() === 0)
  }
}
