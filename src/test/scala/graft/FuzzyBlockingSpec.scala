package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Recall contrast between the two fuzzy-match blockings (round-5
  * finding): q_fuzzy_match blocks on (nation, custkey-hundred) — an
  * id-derived key — so a typo'd duplicate whose surrogate key landed in
  * a different hundred is unreachable regardless of edit distance. The
  * sorted-neighborhood variant blocks on the NAME itself and must find
  * it.
  */
class FuzzyBlockingSpec extends SparkTestBase {

  test("name-derived blocking finds a cross-block typo'd twin; id blocking cannot") {
    import spark.implicits._
    val dir = tempDir("fuzzy_blocking")
    // Organic customers 1..60 plus a typo'd duplicate of customer 19
    // re-keyed at 1419: same entity, last name char mistyped, surrogate
    // key in a different custkey-hundred (19 div 100 = 0 vs 14) but the
    // same nation, so only the custkey half of the id-block separates
    // them.
    val organic = (1 to 60).map(i => (i.toLong, f"Customer#$i%09d", (i % 5).toLong))
    val twin = Seq((1419L, "Customer#00000001Z", (19 % 5).toLong))
    (organic ++ twin).toDF("c_custkey", "c_name", "c_nationkey")
      .write.parquet(s"$dir/customer.parquet")

    val byName = Relational.qFuzzyMatchName(spark, dir)
      .select("cust_a", "cust_b").as[(Long, Long)].collect().toSet
    val byId = Relational.qFuzzyMatch(spark, dir)
      .select("cust_a", "cust_b").as[(Long, Long)].collect().toSet

    assert(byName.contains((19L, 1419L)),
      s"sorted-neighborhood blocking should reach the cross-block twin; got $byName")
    assert(!byId.contains((19L, 1419L)),
      "id-derived blocking finding the cross-block twin would mean the blocks changed")
    // Both agree inside a shared block: 14 vs 19 share nation (both
    // i%5=4) and custkey-hundred, and differ by one digit.
    assert(byName.contains((14L, 19L)) && byId.contains((14L, 19L)))
  }
}
