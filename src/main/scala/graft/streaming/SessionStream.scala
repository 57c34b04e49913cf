package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with explicit per-key state (SURVEY.md §2
  * A24 / B18): the continuous counterpart of
  * [[graft.operators.Sessionize]], built on
  * `flatMapGroupsWithState` — the Structured Streaming primitive for
  * state the built-in windowed aggregations can't express (a session
  * has no fixed window; it closes when the GAP exceeds the threshold).
  *
  * State per user is one open session (start, last-seen, count) — a
  * few dozen bytes regardless of event volume, so state size scales
  * with |active users|, not |events|. Sessions close two ways: a
  * later event arrives past the gap (emitted in that micro-batch), or
  * the event-time timeout fires once the watermark passes last-seen +
  * gap (emitted without needing another event for the key).
  */
object SessionStream {

  final case class Event(user_id: Long, ts: Timestamp)
  final case class OpenSession(start: Long, last: Long, n: Long)
  final case class ClosedSession(user_id: Long, start_ts: Timestamp,
                                 end_ts: Timestamp, n_events: Long)

  /** Pure per-key transition: fold this batch's (sorted) events into
    * the open session, emitting every session closed by a gap. */
  def advance(state: Option[OpenSession], sorted: Seq[Long], gapMs: Long)
      : (Option[OpenSession], Seq[(Long, Long, Long)]) = {
    var open = state
    val closed = Seq.newBuilder[(Long, Long, Long)]
    sorted.foreach { t =>
      open = open match {
        case Some(s) if t - s.last > gapMs =>
          closed += ((s.start, s.last, s.n))
          Some(OpenSession(t, t, 1))
        case Some(s) =>
          Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
        case None =>
          Some(OpenSession(t, t, 1))
      }
    }
    (open, closed.result())
  }

  /** Append-mode stream of closed sessions. `events` must carry a
    * watermark on `ts` (the caller sets tolerance); gap is in
    * seconds. */
  def closedSessions(spark: SparkSession, events: Dataset[Event],
                     gapSec: Long): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapMs = gapSec * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap with no new events: close
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(
              user, new Timestamp(s.start), new Timestamp(s.last), s.n))
          } else {
            val sorted = batch.map(_.ts.getTime).toSeq.sorted
            val (open, closedNow) = advance(state.getOption, sorted, gapMs)
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closedNow.iterator.map { case (start, last, n) =>
              ClosedSession(user, new Timestamp(start), new Timestamp(last), n)
            }
          }
      }
  }
}
