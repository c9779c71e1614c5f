package graft.streaming

import java.time.Instant

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** ST11's processor: per-user event-count MILESTONES through Spark 4's
  * transformWithState — the arbitrary-stateful-processing API that
  * supersedes flatMapGroupsWithState (typed per-key state VARIABLES
  * from a handle, vs one opaque state object; explicit TimeMode; state
  * schema evolution; RocksDB-only backend). st9 covers the old API —
  * this covers the new one with a shape the old API also couldn't
  * express naturally: emit a row each time a user's lifetime event
  * count crosses a multiple of [[Milestones.Step]] ("10th action",
  * "100th action" — the loyalty/abuse-threshold trigger), with the
  * running count carried in a ValueState[Long] across micro-batches.
  *
  * Determinism contract: rows are processed in (ts, event_id) order
  * WITHIN each micro-batch invocation (explicit sort below — arrival
  * order inside a batch is partition-race-dependent), so with the
  * harness's single AvailableNow batch the count sequence is the
  * global per-user event-time order and the DuckDB twin is a plain
  * row_number() filter. Across batches the count is exact regardless
  * of order; only WHICH event lands on the threshold depends on
  * arrival batching — same contract as any arrival-time stateful
  * operator.
  *
  * At 100 TB: state is one long per user (bounded by |users|, not
  * events), lives in RocksDB (this API refuses the heap-backed
  * provider), and the only shuffle is the groupByKey exchange.
  */
object Milestones {

  val Step = 10L

  final case class MEv(user_id: Long, ts: Instant, event_id: Long)
  final case class Crossing(user_id: Long, milestone: Long, event_id: Long)

  class MilestoneProcessor extends StatefulProcessor[Long, MEv, Crossing] {
    @transient private var cnt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[MEv],
                                 tv: TimerValues): Iterator[Crossing] = {
      val sorted = rows.toArray.sortBy(e =>
        (e.ts.getEpochSecond, e.ts.getNano, e.event_id))
      var c = if (cnt.exists()) cnt.get() else 0L
      val out = Array.newBuilder[Crossing]
      sorted.foreach { e =>
        c += 1
        if (c % Step == 0) out += Crossing(key, c, e.event_id)
      }
      cnt.update(c)
      out.result().iterator
    }
  }

  /** ST12's inactivity window: a user is "gone" once the event-time
    * watermark passes their last event + this many milliseconds.
    */
  val IdleMs: Long = 30L * 60 * 1000

  final case class Gone(user_id: Long, last_ms: Long, n_events: Long)
  final case class IdleState(lastMs: Long, n: Long)

  /** ST12's processor: EVENT-TIME TIMERS through transformWithState —
    * the other half of the new API that [[MilestoneProcessor]] (pure
    * per-row state, TimeMode.None) does not touch: `registerTimer` on
    * the handle arms a per-key event-time alarm at last-seen + 30 min,
    * re-armed (old timer deleted) as new events arrive, and
    * `handleExpiredTimer` fires when the WATERMARK passes it — emitting
    * the user's churn row and clearing their state. This is the
    * inactivity/abandonment detector: output appears WITHOUT any new
    * event for the key, something no input-driven operator can do.
    *
    * At scale: state is (long, long) per live user and each key holds
    * at most one armed timer; both are dropped at emission, so resident
    * state tracks ACTIVE users only — the watermark is the GC.
    */
  class InactivityProcessor extends StatefulProcessor[Long, MEv, Gone] {
    @transient private var st: ValueState[IdleState] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[IdleState]("idle",
        org.apache.spark.sql.Encoders.product[IdleState], TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[MEv],
                                 tv: TimerValues): Iterator[Gone] = {
      // ONE store read per invocation: each exists()/get() is a separate
      // RocksDB lookup + deserialization on the per-event hot path
      // (reviewer finding).
      val s0 = if (st.exists()) st.get() else IdleState(Long.MinValue, 0L)
      var lastMs = s0.lastMs
      var n = s0.n
      rows.foreach { e =>
        val ms = e.ts.getEpochSecond * 1000 + e.ts.getNano / 1000000
        if (ms > lastMs) lastMs = ms
        n += 1
      }
      st.update(IdleState(lastMs, n))
      if (armed.exists()) getHandle.deleteTimer(armed.get())
      getHandle.registerTimer(lastMs + IdleMs)
      armed.update(lastMs + IdleMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Gone] = {
      val out =
        if (st.exists()) { val s = st.get(); Iterator.single(Gone(key, s.lastMs, s.n)) }
        else Iterator.empty
      st.clear(); armed.clear()
      out
    }
  }

  /** ST13's TTL window: per-user counters age out of the store after
    * this long without the TTL being refreshed by an update — the
    * "rolling activity counter" shape (rate limits, recency-bounded
    * per-key caches) where the TTL, not the watermark, is the GC.
    */
  val TtlMs: Long = 60L * 60 * 1000

  final case class TtlCount(user_id: Long, n_events: Long, had_prior: Boolean)

  /** ST13's processor: state-TTL through transformWithState — the third
    * leg of the new API after [[MilestoneProcessor]] (pure per-row
    * state) and [[InactivityProcessor]] (event-time timers): a per-user
    * event counter in a ValueState declared with a TTLConfig, so
    * expiry is handled by the STORE (RocksDB drops the entry once
    * [[TtlMs]] elapses past its last update), not by user code — no
    * timer, no tombstone sweep, state resident ∝ RECENTLY-ACTIVE users.
    * TTL requires TimeMode.ProcessingTime, and with processing time the
    * operator always reports "needs another batch", so a run MUST use
    * Trigger.Once, not AvailableNow (TtlProbeSpec's trap: AvailableNow
    * looped 1868 empty epochs before a kill).
    *
    * Determinism contract: within one Trigger.Once batch every row of a
    * key arrives in a single invocation with no prior state, so the
    * output is exactly (user, batch count, had_prior=false) — plainly
    * oracle-expressible. `had_prior` flips true only on a LATER run over
    * the same checkpoint inside the TTL window — the cross-run behavior
    * TtlProbeSpec proves (expiry between runs flips it back to false).
    */
  class TtlCountProcessor extends StatefulProcessor[Long, MEv, TtlCount] {
    @transient private var cnt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMillis(TtlMs)))

    override def handleInputRows(key: Long, rows: Iterator[MEv],
                                 tv: TimerValues): Iterator[TtlCount] = {
      val prior = cnt.exists()
      val n = (if (prior) cnt.get() else 0L) + rows.size
      cnt.update(n)
      Iterator.single(TtlCount(key, n, prior))
    }
  }
}
