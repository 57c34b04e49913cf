package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for exchange-free joins (SURVEY.md §4).
  *
  * At 100 TB the dominant cost of a fact⋈fact join (lineitem⋈orders,
  * events⋈events self-joins) is the shuffle of both sides. Writing the
  * tables bucketed by the join key moves that shuffle to write time,
  * once: every subsequent join on the key reads co-located buckets and
  * plans a SortMergeJoin with NO Exchange on either side (asserted by
  * BucketingSpec). Bucket counts must match across tables meant to be
  * joined, and should be sized so one bucket of the biggest table fits
  * an executor core's working set (e.g. 100 TB / 4096 buckets ≈ 25 GB
  * per bucket → pick thousands of buckets at that scale).
  */
object Bucketing {

  /** Writes `df` as a bucketed+sorted managed table at `path`.
    * Bucketing metadata lives in the session catalog — reads must go
    * through `spark.table(name)`, not `spark.read.parquet(path)`. */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(name)

  /** Exchange-free equi-join of two co-bucketed tables. */
  def cobucketedJoin(spark: SparkSession, left: String, right: String,
                     key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
