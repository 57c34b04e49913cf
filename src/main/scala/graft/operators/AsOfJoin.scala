package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, the single most recent
  * right row with `rightTs <= leftTs` for the same key — "which login
  * preceded this process event", "which config version was active at
  * this alert". Spark has no native ASOF JOIN; the naive inequality
  * join explodes to |L|×|R| per key before picking the max.
  *
  * This implementation is the scale-safe union+window form: tag both
  * sides, union them, and carry the latest right-side values forward
  * with `last(..., ignoreNulls) OVER (PARTITION BY key ORDER BY ts)`.
  * ONE shuffle (by key), linear in |L|+|R|, no per-key blow-up — the
  * same plan shape at 60 rows and at 100 TB. Ties (rightTs == leftTs)
  * match, as in DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`: right rows
  * sort before left rows at equal timestamps.
  */
object AsOfJoin {

  /** Left rows plus `valueCols` from the as-of-matching right row
    * (null when no right row precedes). Column names in `valueCols`
    * must not collide with left columns; alias them via `out`.
    *
    * Match identity is ROW-level, as in ASOF JOIN semantics: ONE
    * `last(struct(valueCols))` carries the entire most-recent right
    * row forward, so a null value column in that row stays null in
    * the output — per-column `last(..., ignoreNulls)` would smuggle a
    * non-null value from an OLDER right row past it. One window
    * function regardless of |valueCols|, same one-shuffle plan. */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           valueCols: Seq[(String, String)]): DataFrame = {
    val l = left.withColumn("__is_left", lit(true))
    // a null-ts right row can never be "most recent at ts" — and ASC
    // ordering sorts nulls FIRST, so left unfiltered it would match
    // every left row that precedes all real right rows
    val r = right.filter(col(ts).isNotNull).withColumn("__is_left", lit(false))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows first at equal ts so a tie matches (ts >= semantics)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__is_left").cast("int").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the struct itself is non-null iff the row is a right row, so
    // ignoreNulls skips left rows but never a matched right ROW
    val matchRow = last(
      when(!col("__is_left"),
        struct(valueCols.zipWithIndex.map { case ((in, _), i) => col(in).as(s"_$i") }: _*)),
      ignoreNulls = true).over(w)
    val projected = valueCols.zipWithIndex.foldLeft(
        unioned.withColumn("__match", matchRow)) { case (df, ((_, out), i)) =>
      df.withColumn(out, col("__match").getField(s"_$i"))
    }
    val rightOnly = right.columns.filterNot(left.columns.contains).toSeq
    projected.filter(col("__is_left"))
      .drop("__is_left", "__match")
      .drop(rightOnly.filterNot(c => valueCols.exists(_._2 == c)): _*)
  }
}
