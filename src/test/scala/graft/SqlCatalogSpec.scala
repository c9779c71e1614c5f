package graft

/** The plain-SQL path: registered views make the whole corpus queryable
  * with spark.sql text, including the engine's native function.
  */
class SqlCatalogSpec extends SparkTestBase {

  test("registered views answer plain SQL, including the native function") {
    Tables.registerAll(spark, Sf)
    val joined = spark.sql(
      """SELECT r_name, count(*) AS n FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin).collect()
    assert(joined.length === 5)
    assert(joined.map(_.getLong(1)).sum === 150L)
    val cos = spark.sql(
      """SELECT cosine_milli(
        |  transform(embedding, x -> cast(x as double)),
        |  transform(embedding, x -> cast(x as double))) AS self_cos
        |FROM embeddings LIMIT 1""".stripMargin).collect()
    assert(cos(0).getLong(0) === 1000L) // self-similarity is exactly 1
  }
}
