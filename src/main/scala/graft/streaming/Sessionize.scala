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
  * State is a LIST of open sessions, exactly like session_window's
  * per-key window state (reviewer finding: a single-open-session state
  * silently absorbed an out-of-order event that belonged to a separate
  * EARLIER session whenever the watermark delay exceeded the gap).
  * Each invocation folds the batch's events into intervals, merges them
  * with the remembered intervals under the gap rule, emits every
  * interval the watermark has closed (lastMs + gap ≤ watermark), and
  * keeps the rest in state with the earliest close time as the event
  * timeout. Works in batch (each key's full history in one invocation —
  * watermark 0, everything emitted via `emitTrailing`) and in streaming.
  */
object Sessionize {

  final case class Ev(user_id: Long, ts: Instant)
  final case class Session(user_id: Long, session_start: Instant,
                           session_end: Instant, n_events: Long)
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long)
  /** State wrapper (a bare Seq has no bean/product encoder of its own). */
  final case class OpenSessions(sessions: Seq[OpenSession])

  val GapMicros: Long = 30L * 60 * 1000 * 1000

  private def toMicros(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  private def fromMicros(us: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)

  /** Gap-rule union of intervals (any order in, disjoint sorted out). */
  private def mergeIntervals(xs: Seq[OpenSession]): Seq[OpenSession] =
    xs.sortBy(s => (s.startMs, s.lastMs))
      .foldLeft(List.empty[OpenSession]) { (acc, s) =>
        acc match {
          case head :: tail if s.startMs - head.lastMs < GapMicros =>
            OpenSession(head.startMs, math.max(head.lastMs, s.lastMs), head.n + s.n) :: tail
          case _ => s :: acc
        }
      }.reverse

  /** Fold a key's events (this batch + remembered state) into sessions.
    *
    * `emitTrailing` makes batch-vs-streaming EXPLICIT (round-2 advisor
    * finding: inferring batch mode from `!state.exists` misfires on a
    * streaming key's FIRST micro-batch):
    *  - batch (`true`): the group is complete — emit everything;
    *  - streaming (`false`): emit only watermark-closed sessions; open
    *    ones stay in state until EventTimeTimeout (or a later batch)
    *    closes them. A timeout invocation (no events) flows through the
    *    same partition logic.
    */
  def sessionizeGroup(emitTrailing: Boolean)(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[OpenSessions]): Iterator[Session] = {
    // Each event is a singleton interval; ONE gap-rule merge folds the
    // batch and the remembered state together (a previous inline fold
    // duplicated mergeIntervals' gap logic — reviewer finding).
    val batch = events.map(e => { val t = toMicros(e.ts); OpenSession(t, t, 1) }).toSeq
    val all = mergeIntervals(state.getOption.map(_.sessions).getOrElse(Nil) ++ batch)
    def close(s: OpenSession) =
      Session(userId, fromMicros(s.startMs), fromMicros(s.lastMs + GapMicros), s.n)
    if (emitTrailing) {
      if (state.exists) state.remove()
      all.iterator.map(close)
    } else {
      val wmMs = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(0L)
      val (expired, open) = all.partition(s => s.lastMs + GapMicros <= wmMs * 1000L)
      if (open.nonEmpty) {
        state.update(OpenSessions(open))
        // Earliest close time, floored to millis but kept strictly past
        // the current watermark (setTimeoutTimestamp rejects otherwise).
        val earliest = open.map(s => (s.lastMs + GapMicros) / 1000L).min
        state.setTimeoutTimestamp(math.max(earliest, wmMs + 1))
      } else if (state.exists) state.remove()
      expired.iterator.map(close)
    }
  }

  /** Batch-mode entry: sessionize a static events Dataset (each key's
    * full history arrives in one invocation; everything emitted).
    */
  def sessions(spark: SparkSession, events: Dataset[Ev]): Dataset[Session] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(sessionizeGroup(emitTrailing = true))
  }

  /** Streaming entry: open sessions are carried in state across
    * micro-batches and closed as the watermark passes each session_end.
    * `events` must carry a watermark on `ts`.
    */
  def sessionsStream(spark: SparkSession, events: Dataset[Ev]): Dataset[Session] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(sessionizeGroup(emitTrailing = false))
  }
}
