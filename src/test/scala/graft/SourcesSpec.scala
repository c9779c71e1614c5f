package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.pipeline.ReferencePipeline
import graft.sinks.Sinks

/** Source-format coverage beyond parquet:
  *  - S6 (csv_operations.py:12-13): the csv_fmt.json config map — a JSON
  *    object {list_name: csv_name} — read from disk and unpivoted into
  *    the (list_name, csv_name) lookup table that drives the semi-join.
  *  - CSV read-back of the K1 sink output (round-trip).
  *  - Partition pruning on partitioned parquet layout: a filter on the
  *    partition column must prune at planning time, not scan-and-filter.
  */
class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("S6: csv_fmt.json object is read and unpivoted into the lookup table") {
    val dir = tempDir("cfg")
    // The reference's CSV_fmt.json shape (README.md:62-69): one object,
    // keys are list names, values are output csv names.
    Files.writeString(Paths.get(dir, "CSV_fmt.json"),
      """{"Youth Group": "youth", "Choir Youth Mid": "choir"}""")
    val raw = spark.read.option("multiLine", true).json(s"$dir/CSV_fmt.json")
    val cols = raw.columns
    val fmt = raw.selectExpr(
      s"stack(${cols.length}, ${cols.map(c => s"'$c', `$c`").mkString(", ")}) AS (list_name, csv_name)")
    val got = fmt.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("Youth Group" -> "youth", "Choir Youth Mid" -> "choir"))
  }

  test("K1 CSV output round-trips through spark.read.csv with header") {
    val people = Seq(
      ("p1", "Youth Group", "Amy", "a@x", "1", "Grade 5", "16 years"),
      ("p2", "Youth Group", "Bob", "", "", "", ""))
      .toDF("person_id", "person_list", "name", "primary_email",
        "primary_phone_number", "grade", "age")
    val out = tempDir("csv_roundtrip")
    Sinks.writeCsvPerList(people, out)
    val back = spark.read.option("header", true).csv(out)
    assert(back.count() === 2)
    assert(back.columns.sorted.toSeq ===
      (Sinks.PersonCsvColumns :+ "person_list").sorted)
    val bob = back.filter($"name" === "Bob").collect()(0)
    // '' survives as null through CSV (documented: CSV cannot distinguish);
    // the K1 contract is about bytes written, pinned in the golden test.
    assert(bob.getAs[String]("grade") === null)
  }

  test("binaryFile source ingests raw media files with ids from file names") {
    import graft.operators.Multimodal
    val dir = tempDir("media_files")
    Files.write(Paths.get(dir, "7.bin"), Array[Byte](1, 2, 3, 4))
    Files.write(Paths.get(dir, "42.bin"), Array[Byte](9, 8))
    Files.writeString(Paths.get(dir, "ignore.txt"), "not media")
    val got = Multimodal.mediaFromFiles(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(got === Map(7L -> Seq[Byte](1, 2, 3, 4), 42L -> Seq[Byte](9, 8)))
  }

  test("format-parametric sink round-trips parquet, orc, and json") {
    val df = Tables.nation(spark, Sf)
    for (fmt <- Seq("parquet", "orc", "json")) {
      val out = tempDir(s"sink_$fmt")
      Sinks.write(df, out, fmt)
      val back = spark.read.format(fmt)
        .schema(df.schema) // json would otherwise re-infer types
        .load(out)
      assert(back.count() === df.count(), fmt)
      assert(back.exceptAll(df).count() === 0, fmt)
    }
  }

  test("K6 dynamic partition overwrite replaces only the batch's partitions") {
    import spark.implicits._
    val out = tempDir("dyn_overwrite")
    val day1 = Seq((1L, "2024-01-01", "a"), (2L, "2024-01-01", "b"),
      (3L, "2024-01-02", "c")).toDF("id", "day", "v")
    Sinks.overwritePartitions(day1, out, Seq("day"))
    // Re-ingest ONLY day 2 with corrected rows; day 1 must survive.
    val day2fix = Seq((3L, "2024-01-02", "c2"), (4L, "2024-01-02", "d"))
      .toDF("id", "day", "v")
    Sinks.overwritePartitions(day2fix, out, Seq("day"))
    val back = spark.read.parquet(out)
      .select("id", "day", "v").as[(Long, String, String)].collect().toSet
    assert(back === Set(
      (1L, "2024-01-01", "a"), (2L, "2024-01-01", "b"),
      (3L, "2024-01-02", "c2"), (4L, "2024-01-02", "d")))
    // The conf is restored: a plain Overwrite afterwards is full-replace.
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode").isEmpty
      || spark.conf.get("spark.sql.sources.partitionOverwriteMode") != "dynamic")
  }

  test("partition pruning: filter on the partition column prunes at scan") {
    val out = tempDir("part_prune")
    val df = Tables.orders(spark, Sf)
      .withColumn("bucket", pmod(col("o_custkey"), lit(10)))
    Sinks.writeParquet(df, out, Seq("bucket"))
    val pruned = spark.read.parquet(out).filter(col("bucket") === 3)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(bucket"),
      s"expected partition filter in scan; plan:\n$plan")
    assert(pruned.count() === df.filter(col("bucket") === 3).count())
  }
}
