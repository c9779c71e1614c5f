package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Timestamps are carried as epoch MICROS (Instant round-trips Spark's
  * TimestampType losslessly; java.sql.Timestamp.getTime would truncate
  * to millis).
  *
  * Custom session state via the typed KeyValueGroupedDataset API
  * (flatMapGroupsWithState) — the §2.10 escape hatch for session logic
  * the built-in session_window cannot express (per-session custom
  * payloads, conditional merges, side outputs). This sessionizer
  * reproduces session_window's exact semantics (events with gaps
  * < 30 min merge; session_end = last ts + gap) so SessionizeSpec can
  * assert equality against the built-in operator.
  *
  * Works in batch (each key's full history in one invocation — state
  * stays empty) and in streaming (state carries the open session across
  * micro-batches; EventTimeTimeout closes it when the watermark passes).
  * Built-ins first (SURVEY.md §2.10): session_window remains the default
  * path; this operator exists for the custom-state surface.
  */
object Sessionize {

  final case class Ev(user_id: Long, ts: Instant)
  final case class Session(user_id: Long, session_start: Instant,
                           session_end: Instant, n_events: Long)
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long)

  val GapMicros: Long = 30L * 60 * 1000 * 1000

  private def toMicros(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  private def fromMicros(us: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)

  /** Fold a key's (possibly unsorted) events into closed sessions.
    *
    * `emitTrailing` makes batch-vs-streaming EXPLICIT (round-2 advisor
    * finding: inferring batch mode from `!state.exists` misfires on a
    * streaming key's FIRST micro-batch, which also has no state — the
    * open session was emitted as closed and never carried forward):
    *  - batch (`true`): the group is complete, emit the trailing open
    *    session immediately;
    *  - streaming (`false`): save the open session in `state` and let
    *    EventTimeTimeout close it when the watermark passes.
    */
  def sessionizeGroup(emitTrailing: Boolean)(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[Session] = {
    // Spark drops sub-watermark rows before flatMapGroupsWithState, but
    // events ABOVE the watermark may still precede the remembered open
    // session's bounds (delivered out of order across micro-batches);
    // the min/max merge below folds those in without regressing either
    // bound. Events within one invocation are sorted first.
    val sorted = events.map(e => toMicros(e.ts)).toArray.sorted
    var open = state.getOption
    val closed = scala.collection.mutable.ArrayBuffer[Session]()
    sorted.foreach { t =>
      open match {
        case Some(s) if t - s.lastMs < GapMicros =>
          // min/max, not overwrite (advisor finding): an out-of-order
          // event from a later micro-batch can precede the open
          // session's bounds; copying lastMs = t would regress the
          // session end and never extend the start.
          open = Some(OpenSession(math.min(s.startMs, t),
            math.max(s.lastMs, t), s.n + 1))
        case Some(s) =>
          closed += Session(userId, fromMicros(s.startMs),
            fromMicros(s.lastMs + GapMicros), s.n)
          open = Some(OpenSession(t, t, 1))
        case None =>
          open = Some(OpenSession(t, t, 1))
      }
    }
    if (state.hasTimedOut) {
      // Watermark passed the open session's end: close and clear.
      state.getOption.foreach { s =>
        closed += Session(userId, fromMicros(s.startMs),
          fromMicros(s.lastMs + GapMicros), s.n)
      }
      state.remove()
    } else {
      open match {
        case Some(s) if emitTrailing =>
          // Batch mode: the group is complete, emit the trailing session.
          closed += Session(userId, fromMicros(s.startMs),
            fromMicros(s.lastMs + GapMicros), s.n)
        case Some(s) =>
          state.update(s)
          state.setTimeoutTimestamp((s.lastMs + GapMicros) / 1000L)
        case None => ()
      }
    }
    closed.iterator
  }

  /** Batch-mode entry: sessionize a static events Dataset (each key's
    * full history arrives in one invocation; trailing session emitted).
    */
  def sessions(spark: SparkSession, events: Dataset[Ev]): Dataset[Session] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(sessionizeGroup(emitTrailing = true))
  }

  /** Streaming entry: the open session is carried in state across
    * micro-batches and closed by EventTimeTimeout once the watermark
    * passes session_end. `events` must carry a watermark on `ts`.
    */
  def sessionsStream(spark: SparkSession, events: Dataset[Ev]): Dataset[Session] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(sessionizeGroup(emitTrailing = false))
  }
}
