package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment (range) join: points ⋈ ranges on
  * `lo <= point <= hi` — IP-in-block lookups, value-in-band matching,
  * time-in-window attribution. Spark plans a raw inequality join as
  * BroadcastNestedLoopJoin (|P|×|R| comparisons) — fine for a tiny
  * range side, catastrophic at scale.
  *
  * This is the bucketized equi-join form: pick a bucket width ~ the
  * typical range length; each range explodes to the buckets it
  * overlaps (≈ length/width + 1 rows — bounded fan-out), each point
  * maps to exactly ONE bucket, and the join becomes an equi-join on
  * the bucket id followed by the exact containment filter. A point
  * meets a covering range in exactly one bucket (its own), so no
  * dedup pass is needed. Shuffles by bucket id → even distribution
  * for uniform data; skewed hot buckets fall to AQE skew handling or
  * [[SkewJoin]] salting.
  */
object RangeJoin {

  /** Equi-join shape for `points.pointCol BETWEEN ranges.loCol AND
    * ranges.hiCol`. `bucketWidth` must be > 0; ranges with hi < lo
    * are dropped (empty intervals). */
  def pointInRange(points: DataFrame, pointCol: String,
                   ranges: DataFrame, loCol: String, hiCol: String,
                   bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = floor(col(pointCol) / bucketWidth).cast("long")
    val rLo = floor(col(loCol) / bucketWidth).cast("long")
    val rHi = floor(col(hiCol) / bucketWidth).cast("long")
    val p = points.withColumn("__bucket", pb)
    val r = ranges
      .filter(col(hiCol) >= col(loCol))
      .withColumn("__bucket", explode(sequence(rLo, rHi)))
    p.join(r, "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
