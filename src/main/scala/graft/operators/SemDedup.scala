package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Semantic (embedding-space) deduplication — SemDeDup-style
  * (SURVEY.md §2 C26): two documents are duplicates when their
  * embedding cosine exceeds a threshold, regardless of surface text
  * (paraphrases, translations, templated rewrites — everything the
  * lexical C1–C4 family misses).
  *
  * The reference pipeline stops at lexical identity (request_id
  * dedup); a training-data curation run over 100 TB needs the semantic
  * layer too, and the published recipe (SemDeDup, Abbas et al. 2023)
  * is exactly "cluster the embeddings, drop within-cluster pairs above
  * a cosine threshold, keep one representative".
  *
  * Scale design (100 TB): the all-pairs O(n²) join is never planned.
  * Candidates are generated within BLOCKS — here deterministic
  * sign-bit blocks (the first `bits` embedding components' signs, a
  * fixed random-hyperplane LSH with axis-aligned planes), which any
  * engine can recompute — and the pair join shuffles on the block key
  * only. Blocks above `maxBlock` are excluded from the pair join (an
  * m-row block expands to m²/2 pairs) and surfaced via
  * [[oversizeBlocks]] — the same quarantine-not-drop stance as the
  * minhash `maxBucket` cap. At cluster scale, raise `bits` so expected
  * block size n/2^bits stays bounded, or swap the blocker for IVF
  * cells ([[Ivf]]) — `duplicates` accepts any precomputed block
  * column via `blockExpr`.
  *
  * Greedy keep-lowest-id semantics (order-deterministic, engine
  * independent): a row is a duplicate iff SOME lower-id row in its
  * block has cosine ≥ threshold; its keeper is the LOWEST such id.
  * This is the chain-insensitive form (a dropped row can itself be
  * another row's keeper), which is what makes the rule expressible as
  * one EXISTS per row — no iterative clustering — and therefore
  * exactly reproducible by the DuckDB oracle.
  */
object SemDedup {

  /** Deterministic sign-bit block id from the first `bits` vector
    * components (MSB = component 1). Map-only, codegen'd. */
  def signBlock(vec: Column, bits: Int): Column =
    if (bits == 0) lit(0) // single block: exact (all-pairs) mode for tests/oracles
    else (0 until bits).map { i =>
      when(element_at(vec, i + 1) >= 0.0, lit(1 << (bits - 1 - i)))
        .otherwise(lit(0))
    }.reduce(_ + _)

  /** Within-block duplicate mapping: one row per DUPLICATE with its
    * keeper (lowest-id within-block neighbor at cosine ≥ `threshold`),
    * the neighbor count, and the strongest cosine (rounded 4 — the
    * hashable precision every float oracle in this repo uses).
    *
    * Plan shape: block sizes are counted first (one partial-agg'd
    * pass); blocks over `maxBlock` drop out of BOTH join sides before
    * the self-join, so the worst case is maxBlock²/2 pairs per block,
    * shuffled on the block key. The per-pair probe is the fused
    * codegen'd `graft_cosine`. */
  def duplicates(emb: DataFrame, idCol: String, vecCol: String,
                 bits: Int = 4, threshold: Double = 0.7,
                 maxBlock: Int = 65536,
                 blockExpr: Option[Column] = None): DataFrame = {
    val blocked = withBlockSize(emb, idCol, vecCol, bits, blockExpr)
      .filter(col("block_n") <= maxBlock)
    val a = blocked.select(col("block"), col(idCol).as("keeper_cand"),
      col("v").as("va"))
    val b = blocked.select(col("block"), col(idCol).as("dup_id"),
      col("v").as("vb"))
    a.join(b, Seq("block"))
      .filter(col("keeper_cand") < col("dup_id"))
      .withColumn("cos", cosineNative(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .groupBy(col("dup_id"))
      .agg(min(col("keeper_cand")).as("keeper_id"),
           count(lit(1)).as("n_neighbors"),
           round(max(col("cos")), 4).as("max_cosine"))
  }

  /** Rows with no lower-id semantic neighbor — the deduplicated
    * corpus. Anti-join on the [[duplicates]] relation (LeftAnti,
    * broadcast when small). */
  def survivors(emb: DataFrame, idCol: String, vecCol: String,
                bits: Int = 4, threshold: Double = 0.7,
                maxBlock: Int = 65536): DataFrame =
    emb.join(
      duplicates(emb, idCol, vecCol, bits, threshold, maxBlock)
        .select(col("dup_id").as(idCol)),
      Seq(idCol), "left_anti")

  /** Accounting for the `maxBlock` cap: one row per EXCLUDED block
    * with its size — count it, alert on it, or re-run the block
    * through [[Ivf]] cells / more bits for replay. Never silent. */
  def oversizeBlocks(emb: DataFrame, idCol: String, vecCol: String,
                     bits: Int = 4, maxBlock: Int = 65536,
                     blockExpr: Option[Column] = None): DataFrame =
    withBlockSize(emb, idCol, vecCol, bits, blockExpr)
      .filter(col("block_n") > maxBlock)
      .groupBy(col("block"))
      .agg(max(col("block_n")).as("block_size"))

  /** (id, v: array<double>, block, block_n) — the blocked relation
    * both the pair join and the accounting read. The block-size count
    * is a window over the block key so the relation stays one
    * pass (partial agg + single shuffle on `block`, which the pair
    * join reuses). */
  private def withBlockSize(emb: DataFrame, idCol: String, vecCol: String,
                            bits: Int, blockExpr: Option[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    emb.select(col(idCol),
        toDoubles(col(vecCol)).as("v"),
        blockExpr.getOrElse(signBlock(col(vecCol), bits)).as("block"))
      .withColumn("block_n", count(lit(1)).over(Window.partitionBy(col("block"))))
  }
}
