package graft

import org.apache.spark.sql.functions._

import graft.streaming.Sessionize

/** The custom flatMapGroupsWithState sessionizer must reproduce the
  * built-in session_window exactly (same gap rule, same end = last+gap).
  */
class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  test("typed custom-state sessionizer equals the built-in session_window") {
    val events = Tables.events(spark, Sf)
      .select(col("user_id"), col("ts"))
      .as[Sessionize.Ev]
    val custom = Sessionize.sessions(spark, events).toDF
    val builtin = Tables.events(spark, Sf)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count("*").as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
    assert(custom.count() > 0)
    assert(custom.exceptAll(builtin).count() === 0)
    assert(builtin.exceptAll(custom).count() === 0)
  }

  test("SQL gaps-and-islands (w7) agrees with the typed sessionizer on the corpus") {
    // Three formulations of one semantic: built-in session_window (st3),
    // typed flatMapGroupsWithState (above), SQL windows (w7). The SQL
    // form breaks sessions on gap > 30 min (inclusive merge at exactly
    // 30:00.000000) where session_window merges strictly below the gap;
    // the corpus's microsecond timestamps hit no exact boundary, so all
    // three must agree event-for-event here.
    val typed = Sessionize.sessions(spark,
        Tables.events(spark, Sf).select(col("user_id"), col("ts")).as[Sessionize.Ev])
      .toDF
      .select(col("user_id"),
        unix_millis(col("session_start")).as("start_ms"),
        (unix_millis(col("session_end")) - 30L * 60 * 1000).as("end_ms"),
        col("n_events"))
    val sql = graft.operators.Relational.w7Sessionize(spark, Sf)
      .select(col("user_id"), col("start_ms"), col("end_ms"), col("n_events"))
    assert(typed.count() > 0 && typed.count() === sql.count())
    assert(typed.exceptAll(sql).count() === 0)
    assert(sql.exceptAll(typed).count() === 0)
  }

  test("batch sessionizer: disjoint gap-separated output, event counts preserved (random)") {
    import java.time.Instant
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(200,
      for {
        u <- Gen.chooseNum(1L, 5L)
        m <- Gen.chooseNum(0L, 3000L)
      } yield Sessionize.Ev(u, Instant.ofEpochSecond(m * 60)))
    val events = gen.apply(Gen.Parameters.default, Seed(11L)).get
    val out = Sessionize.sessions(spark, events.toDS()).collect()
    assert(out.map(_.n_events).sum === events.length)
    out.groupBy(_.user_id).values.foreach { ss =>
      val sorted = ss.sortBy(_.session_start)
      sorted.foreach(s =>
        assert(!s.session_end.isBefore(s.session_start.plusSeconds(30 * 60))))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // session_end = last + gap, so the next session's start must
          // be at or after it — sessions are gap-separated by design.
          assert(!b.session_start.isBefore(a.session_end))
        case _ => ()
      }
    }
  }

  test("streaming: the open session carries across micro-batches (round-2 advisor bug)") {
    import java.time.Instant
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = Instant.parse("2024-01-01T00:00:00Z")
    def at(min: Long) = t0.plusSeconds(min * 60)
    val input = MemoryStream[Sessionize.Ev]
    val sessions = Sessionize.sessionsStream(
      spark, input.toDS().withWatermark("ts", "10 minutes").as[Sessionize.Ev])
    val query = sessions.writeStream
      .format("memory").queryName("sess_stream")
      .outputMode("append")
      .option("checkpointLocation", tempDir("sess_ckpt"))
      .start()
    try {
      // Micro-batch 1: two events for user 1, 10 min apart — an OPEN
      // session. The pre-fix code emitted it as closed here (no state on
      // the first batch looked like "batch mode") and dropped the state.
      input.addData(Sessionize.Ev(1L, at(0)), Sessionize.Ev(1L, at(10)))
      query.processAllAvailable()
      // Micro-batch 2: a third user-1 event INSIDE the 30-min gap (must
      // merge into the same session), plus a far-future event advancing
      // the watermark.
      input.addData(Sessionize.Ev(1L, at(20)), Sessionize.Ev(2L, at(600)))
      query.processAllAvailable()
      // Micro-batch 3: push the watermark further so user 1's timeout fires.
      input.addData(Sessionize.Ev(2L, at(1200)))
      query.processAllAvailable()
      val user1 = spark.table("sess_stream").where(col("user_id") === 1L)
        .select("session_start", "session_end", "n_events")
        .collect()
      assert(user1.length === 1, s"expected ONE merged session, got ${user1.toSeq}")
      val r = user1.head
      assert(r.getAs[java.sql.Timestamp]("session_start").toInstant === at(0))
      assert(r.getAs[java.sql.Timestamp]("session_end").toInstant === at(50))
      assert(r.getLong(2) === 3L)
    } finally query.stop()
  }

  test("streaming: out-of-order event in a later micro-batch extends, never regresses, the open session") {
    import java.time.Instant
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = Instant.parse("2024-01-01T00:00:00Z")
    def at(min: Long) = t0.plusSeconds(min * 60)
    val input = MemoryStream[Sessionize.Ev]
    val sessions = Sessionize.sessionsStream(
      spark, input.toDS().withWatermark("ts", "10 minutes").as[Sessionize.Ev])
    val query = sessions.writeStream
      .format("memory").queryName("sess_ooo")
      .outputMode("append")
      .option("checkpointLocation", tempDir("sess_ooo_ckpt"))
      .start()
    try {
      // Micro-batch 1: open session for user 1 spanning [10, 20]. The
      // watermark after this batch is 20 − 10 = minute 10.
      input.addData(Sessionize.Ev(1L, at(10)), Sessionize.Ev(1L, at(20)))
      query.processAllAvailable()
      // Micro-batch 2: an event at minute 12 — above the watermark (so
      // Spark delivers it; sub-watermark rows are dropped before
      // flatMapGroupsWithState) but BEFORE the remembered session's
      // lastMs. The pre-fix merge copied lastMs = 12, regressing the
      // session end from 20+gap to 12+gap.
      input.addData(Sessionize.Ev(1L, at(12)))
      query.processAllAvailable()
      // Advance the watermark past session_end so the timeout closes it.
      input.addData(Sessionize.Ev(2L, at(600)), Sessionize.Ev(2L, at(1200)))
      query.processAllAvailable()
      val user1 = spark.table("sess_ooo").where(col("user_id") === 1L)
        .select("session_start", "session_end", "n_events")
        .collect()
      assert(user1.length === 1, s"expected ONE merged session, got ${user1.toSeq}")
      val r = user1.head
      assert(r.getAs[java.sql.Timestamp]("session_start").toInstant === at(10))
      assert(r.getAs[java.sql.Timestamp]("session_end").toInstant === at(50))
      assert(r.getLong(2) === 3L)
    } finally query.stop()
  }

  test("streaming: an above-watermark event a full gap BEFORE the open session forms its own session") {
    import java.time.Instant
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = Instant.parse("2024-01-01T00:00:00Z")
    def at(min: Long) = t0.plusSeconds(min * 60)
    val input = MemoryStream[Sessionize.Ev]
    // Watermark delay (120 min) > gap (30 min): the configuration where
    // the pre-fix single-open-session state over-merged (reviewer
    // finding) — the vacuous `t - lastMs < gap` for any t < lastMs
    // absorbed the earlier event into [30, 130] instead of two sessions.
    val sessions = Sessionize.sessionsStream(
      spark, input.toDS().withWatermark("ts", "120 minutes").as[Sessionize.Ev])
    val query = sessions.writeStream
      .format("memory").queryName("sess_sep")
      .outputMode("append")
      .option("checkpointLocation", tempDir("sess_sep_ckpt"))
      .start()
    try {
      input.addData(Sessionize.Ev(1L, at(100)))
      query.processAllAvailable()
      // Above the watermark (wm < 0 here) but 70 min before the open
      // session's start — a SEPARATE earlier session.
      input.addData(Sessionize.Ev(1L, at(30)))
      query.processAllAvailable()
      input.addData(Sessionize.Ev(2L, at(1000)), Sessionize.Ev(2L, at(2000)))
      query.processAllAvailable()
      val user1 = spark.table("sess_sep").where(col("user_id") === 1L)
        .select("session_start", "session_end", "n_events")
        .collect()
        .map(r => (r.getTimestamp(0).toInstant, r.getTimestamp(1).toInstant, r.getLong(2)))
        .sortBy(_._1)
      assert(user1.toSeq === Seq(
        (at(30), at(60), 1L),
        (at(100), at(130), 1L)))
    } finally query.stop()
  }
}
