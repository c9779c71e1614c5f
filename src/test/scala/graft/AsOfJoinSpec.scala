package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.AsOf

/** The native sort-merge as-of join: exact row parity with the composed
  * inequality-join + argmax formulation, on both a hand-built fixture
  * (ties, unmatched rows, nulls, duplicate times) and the events corpus.
  */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("matches the naive argmax as-of on a fixture with edges") {
    val trades = Seq(
      (1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 5L, "t0"),
      (2L, 7L, "t3"), (3L, 100L, "t4"), // key 3 has no quotes
      (1L, 10L, "t5") // duplicate left time
    ).toDF("sym", "t", "tag")
    val quotes = Seq(
      (1L, 5L, 101L), (1L, 10L, 102L), (1L, 15L, 103L),
      (2L, 8L, 201L), // after the only key-2 trade: no match
      (4L, 1L, 401L)
    ).toDF("sym", "qt", "px")

    val native = AsOf.join(trades, quotes.withColumnRenamed("sym", "qsym"),
      Seq("sym"), Seq("qsym"), "t", "qt")
      .select("sym", "t", "tag", "qt", "px")
    val naive = trades.join(quotes.withColumnRenamed("sym", "qsym"),
        col("sym") === col("qsym") && col("qt") <= col("t"))
      .groupBy("sym", "t", "tag")
      .agg(max(struct(col("qt"), col("px"))).as("q"))
      .select(col("sym"), col("t"), col("tag"), col("q.qt"), col("q.px"))

    assert(native.count() === 4) // t3 (quote too late) and t4 (no key) drop
    assert(native.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(native).count() === 0)
    // t2 is at t=20: the latest quote <= 20 is (15, 103), not (10, 102).
    val at20 = native.filter(col("tag") === "t2").select("px").as[Long].head()
    assert(at20 === 103L)
  }

  test("left-outer as-of keeps unmatched and null-keyed left rows, null-extended") {
    val trades = Seq(
      (1L, 10L, "t1"), (2L, 7L, "t3"), (3L, 100L, "t4")
    ).toDF("sym", "t", "tag")
    val quotes = Seq((1L, 5L, 101L), (2L, 8L, 201L)).toDF("qsym", "qt", "px")
    val out = AsOf.join(trades, quotes, Seq("sym"), Seq("qsym"), "t", "qt", "left_outer")
      .select(col("tag"), coalesce(col("px"), lit(-1L)).as("px"))
      .as[(String, Long)].collect().toMap
    // t1 matches (5, 101); t3's only quote is later; t4 has no key.
    assert(out === Map("t1" -> 101L, "t3" -> -1L, "t4" -> -1L))
    // A null-keyed left row survives a left-outer as-of, null-extended.
    val l = Seq((Some(1L), Some(10L)), (None, Some(10L))).toDF("k", "t")
    val r = Seq((1L, 5L, 11L)).toDF("rk", "rt", "v")
    val outer = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt", "left")
    assert(outer.count() === 2)
    assert(outer.filter(col("k").isNull).select(col("v")).collect()(0).isNullAt(0))
  }

  test("null keys and null times never match, and never crash the merge") {
    val l = Seq((Some(1L), Some(10L)), (None, Some(10L)), (Some(1L), None))
      .toDF("k", "t")
    val r = Seq((Some(1L), Some(5L), 11L), (None, Some(1L), 12L), (Some(1L), None, 13L))
      .toDF("rk", "rt", "v")
    val out = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt")
    assert(out.count() === 1)
    assert(out.select("v").as[Long].head() === 11L)
  }

  test("empty sides: AQE must keep the two shuffles zip-compatible") {
    val l = (0L until 100L).map(i => (i % 5, i)).toDF("k", "t")
    val r = (0L until 50L).map(i => (i % 5, i * 2, i)).toDF("rk", "rt", "v")
    val emptyL = l.filter(col("t") < -1)
    val emptyR = r.filter(col("rt") < -1)
    assert(AsOf.join(emptyL, r, Seq("k"), Seq("rk"), "t", "rt").count() === 0)
    assert(AsOf.join(l, emptyR, Seq("k"), Seq("rk"), "t", "rt").count() === 0)
    assert(AsOf.join(l, emptyR, Seq("k"), Seq("rk"), "t", "rt", "left_outer")
      .count() === 100)
    assert(AsOf.join(emptyL, emptyR, Seq("k"), Seq("rk"), "t", "rt").count() === 0)
  }

  test("events corpus: native as-of equals the composed q_asof_join") {
    val composed = graft.operators.Relational.qAsofJoin(spark, Sf)
    val errors = Tables.events(spark, Sf)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("error_ts"))
    val others = Tables.events(spark, Sf)
      .filter(col("event_type") =!= "error")
      .select(col("user_id").as("u2"), col("ts"), col("event_id"), col("event_type"))
    // The argmax tie-break is (ts, event_id, event_type) lexicographic;
    // feed the native operator a combined time so ties on ts resolve
    // identically (sort by (ts, event_id) == argmax on the struct here
    // because event_id is unique).
    val native: DataFrame = AsOf.join(
      errors, others, Seq("user_id"), Seq("u2"), "error_ts", "ts")
      .select(col("error_id"), col("user_id"), col("error_ts"),
        col("ts").as("prev_ts"), col("event_id").as("prev_event_id"),
        col("event_type").as("prev_event_type"))
    assert(native.count() === composed.count())
    assert(native.exceptAll(composed).count() === 0)
    assert(composed.exceptAll(native).count() === 0)
  }

  test("composed prefix scan: ties at the error's own ts resolve like the argmax") {
    // The corpus has no (user_id, ts) ties, so the corpus-parity test
    // above cannot exercise the rewrite's tie ordering. Lock it here:
    // at-or-before INCLUDES a non-error at the error's exact ts, two
    // non-errors at the same ts resolve to the max event_id, an earlier
    // ERROR is never a prev candidate, and an error with no prior
    // non-error is dropped (inner-join semantics).
    val dir = tempDir("asof_ties")
    Seq(
      (1L, 10L, 100L, "click"),
      (2L, 10L, 100L, "error"),  // same-ts click is eligible -> prev = 1
      (3L, 20L, 50L, "view"),
      (4L, 20L, 50L, "click"),   // same-ts pair -> max event_id wins
      (5L, 20L, 60L, "error"),   // -> prev = 4
      (6L, 20L, 40L, "error"),   // only error 7 precedes... nothing: dropped
      (7L, 30L, 10L, "error"),   // non-error exists only LATER: dropped
      (8L, 30L, 20L, "scroll")
    ).toDF("event_id", "user_id", "ts_s", "event_type")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("ts_s")).as("ts"), col("event_type"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Relational.qAsofJoin(spark, dir)
      .select(col("error_id"), col("prev_event_id"), col("prev_event_type"))
      .as[(Long, Long, String)].collect().toSet
    assert(got === Set((2L, 1L, "click"), (5L, 4L, "click")))
  }

  test("composed prefix scan plans as ONE exchange + window, never a join") {
    // The r10 rewrite's scale contract: linear prefix scan, not pair
    // materialization. Lock the plan so a regression back to any join
    // form (15.9x at 10x rows in the r10 sf1 sweep) fails loudly.
    val plan = graft.operators.Relational.qAsofJoin(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected a Window node:\n$plan")
    assert(!plan.contains("Join"), s"expected NO join operator:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("plans as AsOfJoinExec over co-partitioned sorted children") {
    val l = (0L until 100L).map(i => (i % 5, i)).toDF("k", "t")
    val r = (0L until 50L).map(i => (i % 5, i * 2, i)).toDF("rk", "rt", "v")
    val out = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    // Exactly one exchange per side (the key co-partitioning), no more.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 2, s"expected 2 exchanges, got $exchanges:\n$plan")
  }

  test("duplicate (key, time) right rows resolve deterministically (tie-break sort)") {
    val trades = Seq((1L, 15L)).toDF("sym", "t")
    // Two quotes at the identical (sym, qt): the total-order tie-break
    // over the remaining right columns makes the GREATEST tuple win,
    // independent of partitioning/spill accidents.
    val quotes = Seq((1L, 10L, 7L, "low"), (1L, 10L, 9L, "high"))
      .toDF("qsym", "qt", "px", "label")
    (1 to 5).foreach { rep =>
      val got = AsOf.join(trades, quotes.repartition(rep), Seq("sym"), Seq("qsym"), "t", "qt")
        .select("px", "label").as[(Long, String)].collect().toSeq
      assert(got === Seq((9L, "high")), s"rep=$rep got $got")
    }

    // Type mismatches fail loudly at construction, never match garbage.
    val intKeyed = Seq((1, 10L, 7L)).toDF("qsym", "qt", "px") // qsym is INT
    intercept[IllegalArgumentException] {
      AsOf.join(trades, intKeyed, Seq("sym"), Seq("qsym"), "t", "qt")
    }
  }
}
