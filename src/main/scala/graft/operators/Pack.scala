package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window sequence packing (SURVEY.md §2 C17): lay every
  * document out at a contiguous token offset in a deterministic global
  * order (ascending id), then cut the stream into fixed-budget shards
  * — exactly how LLM pretraining concatenates a corpus and chops it at
  * context-length boundaries. Emits per document the start offset, the
  * shard its first token lands in, and whether it straddles a shard
  * boundary (training pipelines either split those or shift them).
  *
  * Scale design: the naive formulation is ONE ordered window over the
  * whole corpus — a single-partition cumsum, the textbook 100 TB
  * scale-killer. Here the prefix sum is two-level: documents bucket by
  * contiguous id range, each bucket cumsums locally under a
  * bucket-partitioned window (parallel across `numBuckets`), bucket
  * totals (numBuckets rows, KB-sized) cumsum on the only
  * single-partition window and broadcast back as per-bucket base
  * offsets. Equivalent to the global window for any bucketing that
  * preserves id order across buckets; PackSpec pins the equivalence
  * and PlanSpec pins that the full-corpus window partitions by bucket.
  */
object Pack {

  /** (idCol, weightCol, start_offset, shard, spans_boundary) for every
    * row of `docs`. `weightCol` must be a non-negative bigint (token
    * counts); offsets follow ascending `idCol` order. */
  def packOffsets(docs: DataFrame, idCol: String, weightCol: String,
                  budget: Long, numBuckets: Int = 256): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(numBuckets > 0, "numBuckets must be positive")
    // id range for contiguous bucketing — one tiny two-value aggregate;
    // ids need not be dense, buckets only need to preserve order
    val range = docs.agg(min(col(idCol)).cast("long"),
      max(col(idCol)).cast("long")).head()
    if (range.isNullAt(0))
      return docs.select(col(idCol), col(weightCol),
        lit(0L).as("start_offset"), lit(0L).as("shard"),
        lit(false).as("spans_boundary")).limit(0)
    val (minId, maxId) = (range.getLong(0), range.getLong(1))
    val width = ((maxId - minId) / numBuckets) + 1
    val b = docs.withColumn("_bucket",
      expr(s"(cast($idCol as bigint) - ${minId}L) div ${width}L"))
    val wLocal = Window.partitionBy("_bucket").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the single-partition window runs over numBuckets rows only
    val wBucket = Window.orderBy("_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy("_bucket").agg(sum(col(weightCol)).as("_btot"))
      .withColumn("_base", coalesce(sum(col("_btot")).over(wBucket), lit(0L)))
      .select(col("_bucket"), col("_base"))
    b.withColumn("_cum", sum(col(weightCol)).over(wLocal))
      .join(broadcast(offsets), "_bucket")
      .withColumn("start_offset", col("_base") + col("_cum") - col(weightCol))
      .withColumn("shard", expr(s"start_offset div ${budget}L"))
      .withColumn("spans_boundary",
        expr(s"(start_offset + $weightCol - 1) div ${budget}L") > col("shard"))
      .drop("_bucket", "_cum", "_base")
  }
}
