package graft

import org.apache.spark.sql.functions._

import graft.operators.Delta

/** Snapshot diff: classification of every change class, plus the
  * null-hash edge cases the q_snapshot_diff oracle never exercises —
  * NULL vs '' must differ, and a value moving BETWEEN columns must
  * differ (the presence-tag encoding exists for exactly these).
  */
class DeltaSpec extends SparkTestBase {

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val old = Seq(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)
    ).toDF("k", "s", "v")
    val next = Seq(
      (1L, "a", 10L),  // unchanged
      (2L, "B", 20L),  // changed (s)
      (3L, "c", 31L),  // changed (v)
      (5L, "e", 50L)   // added; 4 removed
    ).toDF("k", "s", "v")
    val got = Delta.snapshotDiff(old, next, Seq("k"), Seq("s", "v"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("null-safety: NULL vs '' and value-shift between columns both flag as changed") {
    import spark.implicits._
    val old = Seq(
      (1L, Option.empty[String], Option("")),   // (NULL, '')
      (2L, Option("x"), Option.empty[String])   // ('x', NULL)
    ).toDF("k", "a", "b")
    val next = Seq(
      (1L, Option(""), Option.empty[String]),   // ('', NULL) — swapped
      (2L, Option.empty[String], Option("x"))   // (NULL, 'x') — shifted
    ).toDF("k", "a", "b")
    val got = Delta.snapshotDiff(old, next, Seq("k"), Seq("a", "b"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "changed", 2L -> "changed"))
    // And identical null patterns stay unchanged.
    val same = Delta.snapshotDiff(old, old, Seq("k"), Seq("a", "b"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(same === Map(1L -> "unchanged", 2L -> "unchanged"))
  }

  test("encoding is injective: value-boundary shifts between columns flag as changed") {
    import spark.implicits._
    // ("a","1b") vs ("a1","b"): naive tag+value concatenation encodes
    // both as the same bytes (the digit absorbs into the neighbour),
    // which mis-classified this pair as unchanged before the prefix-free
    // length encoding (reviewer finding).
    val old = Seq((1L, "a", "1b"), (2L, "x0", "y")).toDF("k", "a", "b")
    val next = Seq((1L, "a1", "b"), (2L, "x", "0y")).toDF("k", "a", "b")
    val got = Delta.snapshotDiff(old, next, Seq("k"), Seq("a", "b"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "changed", 2L -> "changed"))
  }

  test("scd2Apply: close/open/insert semantics, history passthrough, convergence") {
    import spark.implicits._
    // Dim with one closed historical row (k=1 v1) and three open rows.
    val dim = Seq(
      (1L, "old", 0L, 999L, 1L),   // closed history — must pass through
      (1L, "a", 1000L, -1L, 2L),   // open, will CHANGE
      (2L, "b", 0L, -1L, 1L),      // open, UNCHANGED
      (3L, "c", 0L, -1L, 1L))      // open, key REMOVED in next
      .toDF("k", "v", "valid_from_ms", "valid_to_ms", "version")
    val next = Seq((1L, "a2"), (2L, "b"), (4L, "d")).toDF("k", "v")
    val t1 = 5000L
    val merged = Delta.scd2Apply(dim, next, Seq("k"), Seq("v"), t1)
    val rows = merged.select("k", "v", "valid_from_ms", "valid_to_ms", "version")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(rows === Set(
      (1L, "old", 0L, 999L, 1L),     // history untouched
      (1L, "a", 1000L, t1 - 1, 2L),  // closed at t1-1
      (1L, "a2", t1, -1L, 3L),       // successor version
      (2L, "b", 0L, -1L, 1L),        // unchanged open
      (3L, "c", 0L, t1 - 1, 1L),     // removed → closed, no successor
      (4L, "d", t1, -1L, 1L)))       // inserted at version 1
    // Re-merging the SAME snapshot is a fixed point: everything open now
    // matches `next`, so a second apply changes nothing.
    val again = Delta.scd2Apply(merged, next, Seq("k"), Seq("v"), 9000L)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(again === rows)

    // Remove-then-re-add: k=3 was closed with no successor; a snapshot
    // that brings it back must resume at history-max + 1, not collide a
    // second version 1 onto the closed one (reviewer finding).
    val next2 = Seq((1L, "a2"), (2L, "b"), (3L, "c9"), (4L, "d")).toDF("k", "v")
    val readded = Delta.scd2Apply(merged, next2, Seq("k"), Seq("v"), 9000L)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(readded.contains((3L, "c9", 9000L, -1L, 2L)),
      s"re-added key must open at version 2, got ${readded.filter(_._1 == 3L)}")
    val versions = readded.toSeq.map(r => (r._1, r._5))
    assert(versions.size === versions.toSet.size,
      s"(key, version) must stay unique: $versions")
  }

  test("skewProfile flags a hot key and is exact on a crafted distribution") {
    import spark.implicits._
    // 1 key with 90 rows + 9 keys with 1 row: mean = 9.9, max = 90.
    val rows = (1 to 90).map(i => ("hot", i)) ++ (1 to 9).map(i => (s"k$i", i))
    val prof = graft.operators.Scale.skewProfile(rows.toDF("key", "x"), "key")
      .collect().head
    assert(prof.getAs[Long]("n_keys") === 10L)
    assert(prof.getAs[Long]("n_rows") === 99L)
    assert(prof.getAs[Long]("max_cnt") === 90L)
    assert(prof.getAs[Long]("min_cnt") === 1L)
    // 90 * 1000 * 10 div 99 = 9090 — the hottest key is ~9× the mean.
    assert(prof.getAs[Long]("skew_milli") === 9090L)
  }
}
