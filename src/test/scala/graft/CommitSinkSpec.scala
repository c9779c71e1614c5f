package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{CsvBatchWrite, CsvWriterFactory}

/** The DSv2 write path's two-phase commit: visibility is decided by the
  * driver's commit over surviving task messages, so speculative or
  * failed attempts can never leak rows — the property that makes a
  * distributed object-store upload correct under retries.
  */
class CommitSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("end-to-end: partitions upload in parallel, commit makes them visible atomically") {
    val dir = tempDir("commit_sink")
    val df = (1 to 100).map(i => (i.toLong, s"name,$i")).toDF("id", "name")
      .repartition(4)
    df.write.format("graft-commit-csv").option("path", dir).mode("append").save()

    val files = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(files.count(_.startsWith("part-")) === 4)
    assert(!files.contains("_tmp"), "commit must sweep the attempt staging dir")
    // Round-trip (headerless CSV, minimal quoting on the embedded comma).
    val back = spark.read.schema("id LONG, name STRING").csv(dir)
      .as[(Long, String)].collect().toSet
    assert(back === (1 to 100).map(i => (i.toLong, s"name,$i")).toSet)
  }

  test("timestamps and dates serialize in external form, never internal micros/days") {
    val dir = tempDir("commit_sink_types")
    val df = Seq(Tuple1(1L)).toDF("id")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp'2024-01-02 03:04:05'"))
      .withColumn("d", org.apache.spark.sql.functions.expr("date'2024-01-02'"))
      .withColumn("ok", org.apache.spark.sql.functions.lit(true))
    df.coalesce(1).write.format("graft-commit-csv").option("path", dir).mode("append").save()
    val line = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => Files.readAllLines(p).asScala).toSeq.head
    assert(line === "1,2024-01-02T03:04:05Z,2024-01-02,true", line)
  }

  test("protocol: only surviving attempts' output is promoted; discarded attempts sweep") {
    val dir = tempDir("commit_sink_spec")
    Files.createDirectories(Paths.get(dir))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val factory = new CsvWriterFactory(schema, dir)
    def row(id: Long, v: String): InternalRow =
      InternalRow(id, UTF8String.fromString(v))

    // Two attempts of partition 0 (speculation) + one of partition 1.
    val attempt0a = factory.createWriter(0, taskId = 100L)
    val attempt0b = factory.createWriter(0, taskId = 101L)
    val attempt1 = factory.createWriter(1, taskId = 102L)
    attempt0a.write(row(1, "winner"))
    attempt0b.write(row(1, "loser"))
    attempt1.write(row(2, "p1"))
    val m0 = attempt0a.commit()
    attempt0b.commit() // Spark discards this message — never passed to the driver
    val m1 = attempt1.commit()

    new CsvBatchWrite(schema, dir).commit(Array(m0, m1))
    val visible = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(visible === Set("part-00000.csv", "part-00001.csv"))
    assert(Files.readAllLines(Paths.get(dir, "part-00000.csv")).asScala === Seq("1,winner"))

    // Task-level abort deletes its own temp object.
    val dir2 = tempDir("commit_sink_abort")
    val f2 = new CsvWriterFactory(schema, dir2)
    val w = f2.createWriter(0, taskId = 7L)
    w.write(row(9, "doomed"))
    w.abort()
    val tmp = Paths.get(dir2, "_tmp")
    assert(!Files.exists(tmp) || Files.list(tmp).iterator().asScala.isEmpty)
  }
}
