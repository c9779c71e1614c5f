package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Snapshot diff — the CDC/ingest-validation operator: classify every key
  * across two snapshots of the same table as added / removed / changed /
  * unchanged. This is how a production pipeline answers "what did this
  * ingest window actually do?" (row-level audit), and the verification
  * half of incremental sinks like [[graft.sinks.Sinks.overwritePartitions]].
  *
  * Scale shape: each side is reduced to (key, md5-of-compared-columns)
  * BEFORE the join, so the shuffle payload is key + 32 hex chars no
  * matter how wide the rows are; the full-outer join shuffles both sides
  * on the key (or is shuffle-free when both snapshots are bucketed on it
  * — [[Scale.writeBucketed]]). No driver-side state, no collect.
  */
object Delta {

  /** Row-level diff of two snapshots keyed by `keyCols`, comparing
    * `compareCols` by a null-safe hash. Returns one row per key present
    * in either side: the key columns plus `change_type` ∈
    * {'added','removed','changed','unchanged'}.
    *
    * The hash input must be an INJECTIVE encoding of the column tuple:
    * naive concatenation is not one ("a","1b") and ("a1","b") concat to
    * the same bytes (reviewer finding), and `concat_ws` silently drops
    * bare NULLs, colliding (NULL,"x") with ("x",NULL). Each column
    * therefore contributes a prefix-free token: `N` for NULL, else
    * `<length>:<value>`; the length prefix delimits values
    * unambiguously whatever characters they contain.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, hashName: String): DataFrame = {
      val tokens = compareCols.map { c =>
        val s = col(c).cast("string")
        when(col(c).isNull, lit("N"))
          .otherwise(concat(length(s).cast("string"), lit(":"), s))
      }
      df.select(keyCols.map(col) :+
        md5(concat_ws("", tokens: _*)).as(hashName): _*)
    }
    hashed(oldSnap, "old_hash")
      .join(hashed(newSnap, "new_hash"), keyCols, "full_outer")
      .withColumn("change_type",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged"))
      .drop("old_hash", "new_hash")
  }

  /** Oracle query: diff the orders table against a deterministically
    * perturbed "next snapshot" of itself — ~1% of keys deleted
    * (mod 97), status rewritten on mod-13 keys and price bumped on
    * mod-7 keys (changes), ~1% new keys appended (mod 101, shifted id
    * range). Emits only the non-identical rows — at 100 TB the
    * unchanged class is ~all of the table and exists only as a count.
    */
  def qSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val old = Tables.orders(spark, dir).select(
      col("o_orderkey"),
      col("o_orderstatus").as("status"),
      expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    val next = old
      .filter(col("o_orderkey") % 97 =!= 0)
      .select(
        col("o_orderkey"),
        when(col("o_orderkey") % 13 === 0, lit("X")).otherwise(col("status")).as("status"),
        when(col("o_orderkey") % 7 === 0, col("cents") + 500).otherwise(col("cents")).as("cents"))
      .unionAll(
        old.filter(col("o_orderkey") % 101 === 0)
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            col("status"), col("cents")))
    snapshotDiff(old, next, Seq("o_orderkey"), Seq("status", "cents"))
      .filter(col("change_type") =!= "unchanged")
  }
}
