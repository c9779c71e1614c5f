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
}
