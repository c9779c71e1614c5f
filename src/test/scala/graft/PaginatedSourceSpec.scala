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

  test("list_id filters prune pages: only covered partitions are planned") {
    import org.apache.spark.sql.functions.col
    val base = read(pages = 10, pageSize = 25)
    // list_id < 50 covers rows 0-49 = pages 0-1 of 10.
    val lt = base.filter(col("list_id") < 50L)
    assert(lt.rdd.getNumPartitions === 2)
    assert(lt.count() === 50)
    // A closed interval lands on interior pages only.
    val mid = base.filter(col("list_id") >= 60L && col("list_id") <= 120L)
    assert(mid.rdd.getNumPartitions === 3) // pages 2, 3, 4
    assert(mid.count() === 61)
    // Unsatisfiable bounds plan ZERO partitions — nothing is fetched.
    val none = base.filter(col("list_id") > 100L && col("list_id") < 90L)
    assert(none.rdd.getNumPartitions === 0)
    assert(none.count() === 0)
    // The pruning comparisons surface as PushedFilters in the plan, and
    // rows are still exact (page-granular pruning + Spark's residual).
    val scan = lt.queryExecution.executedPlan.toString
      .split("\n").find(_.contains("BatchScan")).getOrElse("")
    assert(scan.contains("list_id"), s"expected pushed list_id filter in: $scan")
  }

  test("column pruning is pushed into the reader (ReadSchema shrinks)") {
    val pruned = read(4, 10).select(sum("n_members").as("s"))
    assert(pruned.as[Long].head() === (0L until 40L).map(k => (7 * k + 3) % 100).sum)
    val scan = pruned.queryExecution.executedPlan.toString
      .split("\n").find(_.contains("BatchScan")).getOrElse("")
    assert(scan.contains("n_members") && !scan.contains("list_name"),
      s"pruned scan should read only n_members; got: $scan")
  }

  test("COUNT(*) pushes to the source: total_count answers with ZERO page fetches") {
    // A million-page collection: the unfiltered count must come from the
    // pagination metadata, not from 100M fetched rows.
    val big = read(pages = 1000000, pageSize = 100)
    graft.sources.PaginatedSource.fetches.set(0)
    assert(big.count() === 100000000L)
    assert(graft.sources.PaginatedSource.fetches.get() === 0L,
      "an unfiltered count must not fetch any page")
    // A filtered count CANNOT be answered by metadata (pruning is
    // page-granular with residuals): pushdown must refuse, rows must
    // still be exact, and pages are actually fetched.
    val small = read(pages = 10, pageSize = 25)
    graft.sources.PaginatedSource.fetches.set(0)
    assert(small.filter(col("list_id") < 50L).count() === 50L)
    assert(graft.sources.PaginatedSource.fetches.get() > 0L)
    // Grouped counts are not the metadata shape either: correct via scan.
    val grouped = small.groupBy((col("n_members") % 2).as("parity")).count()
      .as[(Long, Long)].collect().toMap
    assert(grouped.values.sum === 250L)
  }
}
