package graft

import org.apache.spark.sql.functions._

/** The DSv2 paginated source (S1's real form): pages are partitions,
  * column pruning reaches the reader, rows match the deterministic fake
  * API exactly.
  */
class PaginatedSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def read(pages: Int, pageSize: Int) =
    spark.read.format("paginated")
      .option("pages", pages).option("pageSize", pageSize).load()

  test("every page's rows arrive exactly once; one partition per page") {
    val df = read(pages = 7, pageSize = 13)
    assert(df.rdd.getNumPartitions === 7)
    assert(df.count() === 91)
    val expected = (0L until 91L).map(k => (k, s"list_$k", (7 * k + 3) % 100))
    assert(df.as[(Long, String, Long)].collect().sorted.toSeq === expected)
  }

  test("column pruning is pushed into the reader (ReadSchema shrinks)") {
    val pruned = read(4, 10).select(sum("n_members").as("s"))
    assert(pruned.as[Long].head() === (0L until 40L).map(k => (7 * k + 3) % 100).sum)
    val scan = pruned.queryExecution.executedPlan.toString
      .split("\n").find(_.contains("BatchScan")).getOrElse("")
    assert(scan.contains("n_members") && !scan.contains("list_name"),
      s"pruned scan should read only n_members; got: $scan")
  }
}
