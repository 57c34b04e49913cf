package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization over an event stream (SURVEY.md §2 B18 as a reusable
  * operator): a gap of more than `gapSeconds` between consecutive
  * events of the same key starts a new session.
  *
  * Classic gap-and-island: one shuffle on the key, one sort per key,
  * two linear window passes (lag → marker, running sum → session
  * ordinal). Scales with events-per-key, not total events; heavily
  * skewed keys are bounded by per-key data volume like any windowed
  * computation.
  */
object Sessionize {

  /** Adds `session_seq` (1-based session ordinal per key) and
    * `session_id` (globally unique `key#seq` string). Ties on `tsCol`
    * are broken by `tieBreaker` so the assignment is deterministic. */
  def withSessionIds(df: DataFrame, keyCol: String, tsCol: String,
                     tieBreaker: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieBreaker))
    df.withColumn("prev_us", lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
             (unix_micros(col(tsCol)) - col("prev_us")) > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("session_id", concat(col(keyCol), lit("#"), col("session_seq")))
      .drop("prev_us", "new_session")
  }

  /** Per-session rollup: bounds, event count, value sum. */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
                   tieBreaker: String, gapSeconds: Long,
                   valueCol: String): DataFrame =
    withSessionIds(df, keyCol, tsCol, tieBreaker, gapSeconds)
      .groupBy(keyCol, "session_id")
      .agg(min(tsCol).as("session_start"),
           max(tsCol).as("session_end"),
           count(lit(1)).as("n_events"),
           sum(valueCol).as("total_value"))
}
