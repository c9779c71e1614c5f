package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.sinks.SheetsShaped

/** The connector-shaped Sheets-family sink (K3/K4/K5 surface): bound
  * enforcement throws instead of clipping, range copy materializes the
  * 498×5 slice, and a retry converges over crash artifacts.
  */
class SheetsShapedSpec extends SparkTestBase {
  import spark.implicits._

  private def lines(base: String, tab: String): Seq[String] =
    Files.readAllLines(Paths.get(base, s"$tab.csv")).asScala.toSeq

  test("upload full-replaces a tab and enforces the Sheets range bound") {
    val base = tempDir("sheets_shaped")
    val small = (1 to 10).map(i => (i, s"row$i")).toDF("id", "name")
    SheetsShaped.upload(small, base, "summary")
    assert(lines(base, "summary").length === 11) // header + 10

    // Full replace, not append: a second upload with fewer rows wins.
    SheetsShaped.upload(small.limit(3), base, "summary")
    assert(lines(base, "summary").length === 4)

    // Exceeding the hardcoded range THROWS — silent clipping loses data.
    val wide = (1 to 2).map(i => (i, i, i, i, i, i)).toDF("a", "b", "c", "d", "e", "f")
    intercept[IllegalArgumentException](SheetsShaped.upload(wide, base, "w"))
    val tall = (1 to SheetsShaped.MaxRows + 1).map(i => Tuple1(i)).toDF("id")
    intercept[IllegalArgumentException](SheetsShaped.upload(tall, base, "t"))
  }

  test("rangeCopyValues lands rows 3-500 × A-E materialized; refresh is a no-op") {
    val base = tempDir("sheets_range")
    val src = (1 to 20).map(i => (i, s"n$i", i * 10)).toDF("id", "name", "x")
    SheetsShaped.upload(src, base, "tab1")
    SheetsShaped.rangeCopyValues(spark, base, "tab1", "tab2")
    val got = lines(base, "tab2")
    // offset(1): the copy starts at the source's second data row.
    assert(got.head === "id,name,x")
    assert(got(1) === "2,n2,20")
    assert(got.length === 20) // header + 19 remaining rows
    // K4 refresh: nothing to recompute — the tab is unchanged.
    val before = lines(base, "tab2")
    SheetsShaped.refreshFormulas(spark, base, "tab2")
    assert(lines(base, "tab2") === before)
  }

  test("upload retry converges over crash artifacts (reference task-failure contract)") {
    val base = tempDir("sheets_retry")
    val df = (1 to 5).map(i => (i, s"v$i")).toDF("id", "v")
    SheetsShaped.upload(df, base, "tab")
    val golden = lines(base, "tab")
    // Dead attempt left a stale staging dir and a truncated target.
    val stale = Paths.get(base, "_staging_tab")
    Files.createDirectories(stale)
    Files.write(stale.resolve("part-00000-dead.csv"), "id,v\nSTALE".getBytes("UTF-8"))
    Files.write(Paths.get(base, "tab.csv"), "id\nTRUNC".getBytes("UTF-8"))
    SheetsShaped.upload(df, base, "tab")
    assert(lines(base, "tab") === golden)
    assert(!Files.exists(stale))
  }
}
