package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator

/** The bounded-heap typed Aggregator must agree with the sort-based
  * top-k on real data, per group and globally, under repartitioning.
  */
class TopKAggregatorSpec extends SparkTestBase {
  import spark.implicits._

  test("typed top-k aggregator equals orderBy+limit per group") {
    val orders = Tables.orders(spark, Sf)
    val agg = new TopKAggregator(3).toColumn
    val got = orders
      .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, price, key) => (price, key) }
      .agg(agg.name("topk"))
      .collect()
      .map { case (status, topk) => status -> topk }
      .toMap
    val expected = orders
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rk") <= 3)
      .select("o_orderstatus", "o_totalprice", "o_orderkey")
      .collect()
      .groupBy(_.getString(0))
      .map { case (s, rows) => s -> rows.map(r => (r.getDouble(1), r.getLong(2))).toSeq }
    assert(got.keySet === expected.keySet)
    got.foreach { case (s, topk) => assert(topk === expected(s), s"group $s") }
  }
}
