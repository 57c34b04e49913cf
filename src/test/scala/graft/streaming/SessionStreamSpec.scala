package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import SessionStream._

/** A24/B18 — stateful streaming sessionization via
  * flatMapGroupsWithState: gap-closed sessions emit with the closing
  * batch; idle sessions close by event-time timeout once the watermark
  * passes. */
class SessionStreamSpec extends SparkSpec {

  test("advance folds events into sessions and closes on gaps (pure)") {
    // two sessions split by a gap, third event extends the second
    val (open, closed) = advance(None, Seq(0L, 10000L, 4000000L, 4005000L), gapMs = 1800000L)
    assert(closed == Seq((0L, 10000L, 2L)))
    assert(open.contains(OpenSession(4000000L, 4005000L, 2L)))
    // resuming from state: no gap → nothing closes
    val (open2, closed2) = advance(open, Seq(4010000L), gapMs = 1800000L)
    assert(closed2.isEmpty && open2.get.n == 3)
  }

  test("stream: gap closes in-batch, watermark timeout closes idle session") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1700000000000L
    val input = MemoryStream[Event]
    val sessions = SessionStream.closedSessions(
      spark, input.toDS().withWatermark("ts", "1 second"), gapSec = 1800)
    val q = sessions.writeStream
      .format("memory").queryName("closed_sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1: user 1 has two events then a >30 min gap then one more
      input.addData(
        Event(1L, new Timestamp(t0)),
        Event(1L, new Timestamp(t0 + 10000L)),
        Event(1L, new Timestamp(t0 + 3600000L)))
      q.processAllAvailable()
      val afterBatch1 = spark.table("closed_sessions").as[ClosedSession].collect()
      assert(afterBatch1.map(s => (s.user_id, s.n_events)).toSeq == Seq((1L, 2L)))

      // batch 2: another user far in the future pushes the watermark
      // past user 1's last + gap; batch 3 fires the timeout
      input.addData(Event(2L, new Timestamp(t0 + 3 * 3600000L)))
      q.processAllAvailable()
      input.addData(Event(2L, new Timestamp(t0 + 3 * 3600000L + 1000L)))
      q.processAllAvailable()

      val all = spark.table("closed_sessions").as[ClosedSession].collect()
      val user1 = all.filter(_.user_id == 1L).map(s => (s.n_events, s.start_ts.getTime))
      assert(user1.toSet == Set((2L, t0), (1L, t0 + 3600000L)), all.mkString(","))
    } finally q.stop()
  }
}
