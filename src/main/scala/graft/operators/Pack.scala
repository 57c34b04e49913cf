package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * id QUANTILE (cut points from `percentile_approx`, so clustered or
  * sparse 64-bit ids still spread across ~all buckets — equal-width
  * range cuts would collapse two distant id clusters into one bucket
  * and its local cumsum back into the single-partition window this
  * operator exists to avoid), each bucket cumsums locally under a
  * bucket-partitioned window (parallel across `numBuckets`), bucket
  * totals (numBuckets rows, KB-sized) cumsum on the only
  * single-partition window and broadcast back as per-bucket base
  * offsets. Equivalent to the global window for any bucketing that
  * preserves id order across buckets — quantile cuts do (bucket(id) =
  * #cuts ≤ id is monotone in id), regardless of sketch accuracy, so
  * the approximation can only skew bucket SIZES, never offsets.
  * PackSpec pins the equivalence (incl. two-distant-clusters ids) and
  * PlanSpec pins that the full-corpus window partitions by bucket.
  */
object Pack {

  /** (idCol, weightCol, start_offset, shard, spans_boundary) for every
    * row of `docs`. `weightCol` must be a non-negative bigint (token
    * counts); offsets follow ascending `idCol` order. */
  def packOffsets(docs: DataFrame, idCol: String, weightCol: String,
                  budget: Long, numBuckets: Int = 256): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(numBuckets > 0, "numBuckets must be positive")
    // quantile cut points for order-preserving bucketing — one aggregate
    // over the corpus producing ≤ numBuckets-1 longs (bounded driver
    // row); ids need not be dense or uniform
    val probs = (1 until numBuckets).map(_.toDouble / numBuckets)
    val cuts: Seq[Long] =
      if (probs.isEmpty) Seq.empty // numBuckets == 1: everything in bucket 0
      else {
        val cutsRow = docs.agg(
          percentile_approx(col(idCol).cast("long"),
            typedLit(probs), lit(10000)).as("_cuts")).head()
        if (cutsRow.isNullAt(0)) // empty input
          return docs.select(col(idCol), col(weightCol),
            lit(0L).as("start_offset"), lit(0L).as("shard"),
            lit(false).as("spans_boundary")).limit(0)
        cutsRow.getSeq[Long](0)
      }
    // bucket = number of cut points ≤ id: monotone in id, so bucket
    // order == id order across buckets; duplicate cuts (few distinct
    // ids) just leave some buckets empty. Assigned by a balanced
    // binary-search CASE tree over the cuts — log₂(numBuckets)
    // comparisons per row, plain scalar expressions (a higher-order
    // `filter` lambda capturing the id column does not survive
    // optimizer alias inlining through the aggregate boundary), fully
    // codegen'd, map-only.
    val idL = col(idCol).cast("long")
    def search(loBucket: Int, hiBucket: Int): Column =
      if (loBucket == hiBucket) lit(loBucket.toLong)
      else {
        val mid = (loBucket + hiBucket + 1) / 2
        // bucket ≥ mid iff cuts(mid-1) ≤ id
        when(idL >= cuts(mid - 1), search(mid, hiBucket))
          .otherwise(search(loBucket, mid - 1))
      }
    val b = docs.withColumn("_bucket", search(0, cuts.length))
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

  /** C89 — the context-length operating curve: what each candidate
    * `budget` (context window) costs on THIS corpus, before anyone
    * commits a training config to it. For every budget, from ONE
    * offsets pass (the concatenated layout is budget-independent —
    * only the cut points move):
    *
    *  - `n_shards` — sequences the corpus packs into (ceil(T/B));
    *  - `n_straddlers` / `straddle_tokens` — documents a boundary
    *    cuts, the rows a split-or-shift policy must handle;
    *  - `shift_gap_tokens` — the FIRST-ORDER padding cost of the
    *    shift-to-boundary policy: Σ over SHIFTABLE straddlers (w ≤ B;
    *    an oversize doc is split under the policy, never shifted, so
    *    its gap — up to a full budget when it starts on a boundary —
    *    would only inflate the estimate) of the gap each shift would
    *    leave (B − offset mod B), ignoring cascade (shifts are
    *    data-dependent and sequential; the first-order sum is the
    *    standard sizing estimate and an upper-bound-shaped signal —
    *    exact under "split oversize, shift the rest" when shifts
    *    don't re-collide, which at straddle rates this curve
    *    surfaces is the common case);
    *  - `n_oversize` — documents longer than the budget itself: no
    *    policy saves them, they must chunk (C29) first;
    *  - `straddle_rate` — straddlers / docs, round4.
    *
    * Every value but the rate is an integer on the deterministic
    * layout, so the whole curve SQL-oracles. Shape: the single
    * offsets pass (two-level cumsum) + one budgets × docs map and a
    * budgets-sized aggregate. */
  def budgetCurve(docs: DataFrame, idCol: String, weightCol: String,
                  budgets: Seq[Long], numBuckets: Int = 256): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_ > 0),
      "budgets must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // offsets under ANY budget share the layout; 1L is a placeholder
    val laid = packOffsets(docs, idCol, weightCol, budget = 1L, numBuckets)
      .select(col(idCol), col(weightCol).cast("long").as("_w"),
        col("start_offset"))
    val w = col("_w")
    val b = col("budget")
    // `div` (never `/`): Spark's `/` on bigints is FLOAT division, and
    // a float-floored shard index drifts on large offsets
    budgets.toDF("budget").select(b.cast("long").as("budget")).crossJoin(laid)
      .select(b, w,
        (w > lit(0L) &&
          expr("((start_offset + _w - 1) div budget) != (start_offset div budget)"))
          .as("_straddles"),
        (w > b).as("_oversize"),
        (b - pmod(col("start_offset"), b)).as("_gap"))
      .groupBy(b)
      .agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        sum(w).as("total_tokens"),
        sum(when(col("_straddles"), 1L).otherwise(0L)).as("n_straddlers"),
        sum(when(col("_straddles"), w).otherwise(0L)).as("straddle_tokens"),
        sum(when(col("_straddles") && !col("_oversize"), col("_gap"))
          .otherwise(0L)).as("shift_gap_tokens"),
        sum(when(col("_oversize"), 1L).otherwise(0L)).as("n_oversize"))
      .select(b, col("n_docs"), col("total_tokens"),
        expr("(total_tokens + budget - 1) div budget").as("n_shards"),
        col("n_straddlers"), col("straddle_tokens"), col("shift_gap_tokens"),
        col("n_oversize"),
        graft.functions.TextFunctions.round4(
          col("n_straddlers").cast("double") /
            greatest(col("n_docs"), lit(1L))).as("straddle_rate"))
  }
}
