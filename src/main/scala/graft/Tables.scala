package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * One method per table; every query in the engine reads through here so
  * path handling, and any future source swap (s3a://, bucketed tables,
  * DSv2), is a one-line change. At 100 TB these would be partitioned /
  * bucketed table reads — the API stays the same.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. The session is built with nanosAsLong=true ([[Sessions]] —
    * config belongs at session construction, not as a loader side effect);
    * here we truncate the long nanos to microsecond timestamps (integer
    * `div`, not `/`: ns-since-epoch exceeds 2^53, so a double division
    * would lose precision). DuckDB's TIMESTAMP cast truncates ns the same
    * way, keeping the oracle aligned.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** All corpus tables, by name. */
  val All: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so plain spark.sql text works
    * against the corpus (the "switch to this library" path for SQL
    * users; views are metadata only — nothing is read until queried).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    All.foreach { name =>
      val df = if (name == "events") events(spark, dir) else load(spark, dir, name)
      df.createOrReplaceTempView(name)
    }
}
