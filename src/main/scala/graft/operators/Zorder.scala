package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C34 — Z-order (Morton-curve) layout for multi-column data skipping.
  *
  * At 100 TB a lake table is read or skipped per parquet file/row-group
  * by its min-max stats. Sorting by (a, b) prunes perfectly on `a` and
  * not at all on `b`; interleaving the bits of quantized (a, b, …)
  * gives every column an equal share of the sort prefix, so range
  * predicates on ANY of the layout columns skip most files. This is
  * the standard multi-dimensional clustering technique for lake
  * layouts (Morton-curve indexing, the idea behind UB-trees and
  * Delta's OPTIMIZE ZORDER BY), expressed here as pure Catalyst bit
  * arithmetic — codegen'd, no UDF.
  *
  * Quantization is linear on each column's global [min, max], computed
  * in one tiny broadcast aggregate. That choice is deliberate: it is
  * deterministic and exactly SQL-expressible, so the DuckDB oracle
  * hash-matches the z-values bit-for-bit (a sampling-based range
  * partitioner would not reproduce across engines). Heavily skewed
  * columns should be pre-transformed (log, bucketed rank) by the
  * caller — the quantizer stays the reproducible part. Layout columns
  * are expected non-null (nulls quantize to code 0 in Spark but to
  * NULL in plain SQL — don't z-order a nullable column without
  * coalescing first).
  *
  * The layout write is one range shuffle on the z-value plus an
  * in-partition sort — no global sort, no driver data path; the file
  * count scales with `numFiles` independent of data size.
  */
object Zorder {

  /** Linear quantization of `x` to [0, 2^bits): floor((x-lo)·n/(hi-lo))
    * clamped so x=hi lands in the top code. One multiply then one
    * divide in double — the exact operation order [[quantizeSql]]
    * mirrors, so codes are IEEE-identical across engines ((x-lo)·n
    * stays well under 2^53, so the product is exact). A constant
    * column (hi == lo) quantizes to 0. */
  def quantize(x: Column, lo: Column, hi: Column, bits: Int): Column = {
    val n = lit((1L << bits).toDouble)
    val xd = x.cast("double"); val lod = lo.cast("double"); val hid = hi.cast("double")
    val code = floor((xd - lod) * n / (hid - lod))
    least(greatest(when(hid === lod, lit(0.0)).otherwise(code), lit(0.0)),
      lit(((1L << bits) - 1).toDouble)).cast("long")
  }

  /** Morton z-value: bit i of quantized column c lands at output bit
    * i·k + c. Expands to k·bits shift/mask terms OR-folded into one
    * expression — wide but flat; whole-stage codegen compiles it to
    * straight-line long arithmetic. */
  def zValue(quantized: Seq[Column], bits: Int): Column = {
    val k = quantized.size
    require(k >= 1 && k * bits <= 63,
      s"k=$k columns x $bits bits overflow a signed 64-bit z-value")
    val terms = for {
      (q, c) <- quantized.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * k + c)
    terms.reduce(_ bitwiseOR _)
  }

  /** [[quantize]] as ANSI SQL (for the DuckDB oracle): same operation
    * order, same clamps. `x`/`lo`/`hi` are SQL expressions. */
  def quantizeSql(x: String, lo: String, hi: String, bits: Int): String = {
    val n = s"${1L << bits}.0"
    val top = s"${(1L << bits) - 1}.0"
    s"CAST(least(greatest(CASE WHEN CAST($hi AS DOUBLE) = CAST($lo AS DOUBLE) THEN 0.0 " +
      s"ELSE floor((CAST($x AS DOUBLE) - CAST($lo AS DOUBLE)) * $n / " +
      s"(CAST($hi AS DOUBLE) - CAST($lo AS DOUBLE))) END, 0.0), $top) AS BIGINT)"
  }

  /** [[zValue]] as ANSI SQL over already-quantized integer expressions. */
  def zValueSql(quantizedSql: Seq[String], bits: Int): String = {
    val k = quantizedSql.size
    val terms = for {
      (q, c) <- quantizedSql.zipWithIndex
      i <- 0 until bits
    } yield s"((($q >> $i) & 1) << ${i * k + c})"
    terms.mkString(" | ")
  }

  /** Adds `zCol` = z-value of `cols`, each linearly quantized against
    * its global min/max (one 1-row broadcast aggregate — the same
    * scalar-subquery shape as q17, a BroadcastNestedLoopJoin over one
    * row, never a CartesianProduct). */
  def withZValue(df: DataFrame, cols: Seq[String], zCol: String,
                 bits: Int = 16): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__lo_$c"), max(col(c)).as(s"__hi_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val qs = cols.map(c => quantize(col(c), col(s"__lo_$c"), col(s"__hi_$c"), bits))
    df.crossJoin(broadcast(bounds))
      .withColumn(zCol, zValue(qs, bits))
      .drop(cols.flatMap(c => Seq(s"__lo_$c", s"__hi_$c")): _*)
  }

  /** Z-ordered layout: range-shuffle on the z-value, sort within each
    * partition, drop the helper column. Every output file covers a
    * compact z-range, so per-file min-max stats are narrow on EVERY
    * layout column at once. */
  def layout(df: DataFrame, cols: Seq[String], numFiles: Int,
             bits: Int = 16): DataFrame =
    withZValue(df, cols, "__z", bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  def write(df: DataFrame, cols: Seq[String], numFiles: Int, path: String,
            bits: Int = 16): Unit =
    layout(df, cols, numFiles, bits).write.mode("overwrite").parquet(path)
}
