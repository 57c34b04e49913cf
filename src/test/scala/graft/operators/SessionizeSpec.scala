package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** B18 operator: deterministic session assignment and rollups. */
class SessionizeSpec extends SparkSpec {

  import spark.implicits._

  def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  // user 1: events at 10:00, 10:10 (same session), 11:55 is out of range
  // of a 30-min gap → use minutes 0, 10, then 50 (40-min gap → new session)
  def events = Seq(
    (1L, ts(0), 100L, 1.0),
    (1L, ts(10), 101L, 2.0),
    (1L, ts(50), 102L, 3.0), // 40-min gap → session 2
    (2L, ts(5), 200L, 5.0)   // single-event session
  ).toDF("user_id", "ts", "event_id", "value")

  test("session ids split on gap, deterministic ordinals") {
    val out = Sessionize.withSessionIds(events, "user_id", "ts", "event_id", 1800L)
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(100L) == "1#1")
    assert(out(101L) == "1#1")
    assert(out(102L) == "1#2")
    assert(out(200L) == "2#1")
  }

  test("session stats roll up bounds, counts and values per session") {
    val stats = Sessionize.sessionStats(events, "user_id", "ts", "event_id",
        gapSeconds = 1800L, valueCol = "value")
      .collect().map(r => r.getAs[String]("session_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toMap
    assert(stats("1#1") == (2L, 3.0))
    assert(stats("1#2") == (1L, 3.0))
    assert(stats("2#1") == (1L, 5.0))
  }
}
