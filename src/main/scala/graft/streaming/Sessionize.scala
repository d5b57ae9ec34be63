package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful event-time sessionization over a stream —
  * `KeyValueGroupedDataset.flatMapGroupsWithState` with an event-time
  * timeout (SURVEY.md §2.3 "Streaming": custom per-key state beyond
  * windowed aggregation).
  *
  * State per user = the open session; a new event extends it while within
  * `gapSec` of the last seen event, otherwise the old session is emitted
  * closed and a fresh one opens. When the watermark passes last+gap the
  * timeout fires and the open session is emitted. Matches the batch
  * q11-style gaps-and-islands semantics exactly for in-order streams AND
  * for late (within-watermark) events that land within `gapSec` of the
  * open session's span — those merge without regressing `last_ms` (so the
  * event-time timeout never fires early). The one approximation: an event
  * arriving more than `gapSec` BEFORE the open session's start (possible
  * only inside the watermark window) closes immediately as a singleton
  * session, since O(1) state cannot re-open already-emitted history.
  * Bounded state (one small struct per active user), append-mode output —
  * the shape that holds at an unbounded 10^12-event stream where the batch
  * self-join cannot. */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp)
  case class OpenSession(start_ms: Long, last_ms: Long, n: Long)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** `events` must already carry a watermark on `ts` (the event-time
    * timeout is driven by it). */
  def sessionize(events: Dataset[Event], gapSec: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSec * 1000L

    def fn(userId: Long, batch: Iterator[Event],
           state: GroupState[OpenSession]): Iterator[Session] = {
      if (!batch.hasNext && state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator.single(Session(userId, s.start_ms, s.last_ms, s.n))
      }
      // micro-batch events arrive unordered within the group
      val evs = batch.toArray.sortBy(_.ts.getTime)
      var out = List.empty[Session]
      var cur = state.getOption.orNull
      evs.foreach { e =>
        val t = e.ts.getTime
        if (cur == null) cur = OpenSession(t, t, 1L)
        else if (t > cur.last_ms) {
          // in-order (the common case): extend or split forward
          if (t - cur.last_ms <= gapMs)
            cur = OpenSession(cur.start_ms, t, cur.n + 1L)
          else {
            out ::= Session(userId, cur.start_ms, cur.last_ms, cur.n)
            cur = OpenSession(t, t, 1L)
          }
        } else if (t >= cur.start_ms - gapMs) {
          // late-but-within-watermark event landing inside the open session's
          // span or within the gap before it: merge — last_ms must NEVER
          // regress (ADVICE r2: a backward-moving last_ms fired the
          // event-time timeout early and closed sessions prematurely),
          // start_ms extends backwards
          cur = OpenSession(math.min(cur.start_ms, t), cur.last_ms, cur.n + 1L)
        } else {
          // ultra-late: predates the open session by more than the gap.
          // The events that could have joined it are already emitted or
          // never seen, so it closes immediately as its own session —
          // a documented approximation of the batch semantics (exact
          // sessionization of arbitrarily-late data needs the full event
          // history, not O(1) state; the upstream watermark bounds how
          // late this path can trigger).
          out ::= Session(userId, t, t, 1L)
        }
      }
      if (cur != null) {
        state.update(cur)
        // close the open session once the watermark passes last + gap
        state.setTimeoutTimestamp(cur.last_ms + gapMs)
      }
      out.reverseIterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** DataFrame adapter: (user_id: long, ts: castable-to-timestamp), applies
    * the watermark and returns closed sessions. */
  def sessionizeDF(events: DataFrame, gapSec: Long, watermark: String = "1 hour"): DataFrame = {
    import events.sparkSession.implicits._
    val typed = events
      .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
      .withWatermark("ts", watermark)
      .as[Event]
    sessionize(typed, gapSec).toDF()
  }
}
