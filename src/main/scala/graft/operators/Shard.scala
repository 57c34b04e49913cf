package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic size-balanced shard assignment (SURVEY.md §2 C28):
  * spread documents across `numShards` output shards so per-shard
  * token totals come out near-equal — the step that turns a curated
  * corpus into the fixed training shards a data loader consumes.
  * Never `rand()`: a retried task, a re-run, or another engine must
  * assign every doc to the same shard.
  *
  * Semantics: docs are ranked by `(hash-bucket, weight DESC, id)` and
  * dealt round-robin (`rank % numShards`). Round-robin over a
  * size-descending deal is the classic LPT-style balance guarantee —
  * within each hash bucket, consecutive heavy docs land on distinct
  * shards.
  *
  * Scale design (100 TB): the rank is NEVER computed with a global
  * window (one partition holding the corpus). It decomposes two-level
  * exactly like [[Pack.packOffsets]]: a per-bucket `row_number` (the
  * shuffle key is the deterministic md5 bucket, 16 ways — raise via
  * `bucketHex` for more parallelism) plus broadcast bucket-count
  * offsets (a 16-row relation whose global window is benign). The
  * CORRECTNESS oracle computes the SAME rank with a single flat
  * `row_number() OVER (ORDER BY bucket, weight DESC, id)` — the
  * hash-match is the proof the two-level decomposition equals the
  * global sort. */
object Shard {

  /** Per-doc assignment: (idCol, weightCol, shard). `weightCol` must
    * be bigint (token counts). `bucketHex` = number of md5 hex digits
    * in the distribution key (1 → 16 buckets, 2 → 256, ...). */
  def assign(docs: DataFrame, idCol: String, weightCol: String,
             numShards: Int, bucketHex: Int = 1): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    require(bucketHex >= 1 && bucketHex <= 4, "bucketHex in 1..4")
    val d = docs.select(col(idCol), col(weightCol),
      substring(md5(col(idCol).cast("string")), 1, bucketHex).as("_bucket"))
    val wLocal = Window.partitionBy("_bucket")
      .orderBy(col(weightCol).desc, col(idCol))
    // the single-partition window runs over the 16^bucketHex-row
    // bucket-count relation only (the Pack.packOffsets stance)
    val wBucket = Window.orderBy("_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = d.groupBy("_bucket").agg(count(lit(1)).as("_n"))
      .withColumn("_base", coalesce(sum(col("_n")).over(wBucket), lit(0L)))
      .select(col("_bucket"), col("_base"))
    d.withColumn("_r", row_number().over(wLocal))
      .join(broadcast(offsets), "_bucket")
      .withColumn("shard",
        ((col("_base") + col("_r") - 1) % numShards).cast("int"))
      .drop("_bucket", "_r", "_base")
  }

  /** Deterministic epoch shuffle (SURVEY.md §2 C36): a seeded,
    * reproducible global permutation of the corpus — the ordering a
    * training run consumes for one epoch. Never `rand()`: every
    * retried task, re-run, and engine derives the same `position` for
    * the same `(seed, id)`, so epoch N of a run is replayable
    * bit-for-bit and changing the seed reshuffles. `position` is the
    * global 0-based rank under `md5(seed:id)`; `shard` deals positions
    * round-robin so a multi-reader loader takes every k-th document —
    * each shard is itself an unbiased sample of the corpus.
    *
    * Scale shape: the same two-level rank as [[assign]] — a per-bucket
    * `row_number` shuffled on the md5-prefix bucket (256 ways at the
    * default `bucketHex=2`; the hash bucket is a PREFIX of the sort
    * key, so bucket-major order IS global order) plus a broadcast
    * offsets relation whose single-partition window covers only the
    * bucket counts. No global sort, no single-partition window over
    * data. */
  def epochShuffle(docs: DataFrame, idCol: String, seed: Long,
                   numShards: Int, bucketHex: Int = 2): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    require(bucketHex >= 1 && bucketHex <= 4, "bucketHex in 1..4")
    // null ids coalesce to one sentinel hash key instead of silently
    // vanishing through the null-keyed join (their relative order is
    // undefined — they are indistinguishable rows — but every row
    // keeps exactly one position and the permutation stays contiguous)
    val d = docs.withColumn("_h",
      md5(concat(lit(seed.toString), lit(":"),
        coalesce(col(idCol).cast("string"), lit("")))))
      .withColumn("_bucket", substring(col("_h"), 1, bucketHex))
    val wLocal = Window.partitionBy("_bucket")
      .orderBy(col("_h"), col(idCol))
    val wBucket = Window.orderBy("_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = d.groupBy("_bucket").agg(count(lit(1)).as("_n"))
      .withColumn("_base", coalesce(sum(col("_n")).over(wBucket), lit(0L)))
      .select(col("_bucket"), col("_base"))
    d.withColumn("_r", row_number().over(wLocal))
      .join(broadcast(offsets), "_bucket")
      .withColumn("position", col("_base") + col("_r") - 1)
      .withColumn("shard", (col("position") % numShards).cast("int"))
      .drop("_h", "_bucket", "_r", "_base")
  }
}
