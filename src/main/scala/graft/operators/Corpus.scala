package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Training-data corpus curation: the composition a large-scale LLM
  * data pipeline runs over raw documents — exact dedup, then a quality
  * gate, emitting per-document stats for downstream sampling.
  *
  * Both stages are shuffle-light at 100 TB: dedup groups on a 128-bit
  * content hash (never raw text), the quality gate is a map-only pass,
  * and the survivor join is a semi-join on the id (broadcastable when
  * the survivor set is small relative to the corpus, co-partitioned
  * otherwise). Near-dup removal composes in front via
  * [[Dedup.minhashCandidatePairs]].
  *
  * Every lossy cap in the composition has an accounting relation —
  * run them beside the pipeline so capped work is counted, never
  * silently gone: [[Dedup.minhashDroppedBuckets]] /
  * [[Dedup.simhashDroppedBuckets]] for the `maxBucket` bucket caps,
  * [[Dedup.ngramDroppedGrams]] for the `maxDocFreq` hot-gram cap, and
  * [[graft.sources.FdrSource.loadWithQuarantine]] for skipped input
  * lines. [[Dedup.connectedComponents]] raises on a blown iteration
  * budget rather than returning partial labels.
  */
object Corpus {

  /** Exact-dedup survivors with token counts and quality, keeping only
    * documents whose rounded quality clears `minQuality`. */
  def curate(docs: DataFrame, textCol: String, idCol: String,
             minQuality: Double): DataFrame = {
    val survivors = Dedup.exactDedup(docs, textCol, idCol).select(idCol)
    scoreAndGate(docs.join(survivors, Seq(idCol), "left_semi"),
      textCol, idCol, minQuality)
  }

  /** One-pass near-dup removal: for every similar pair (a, b) with
    * a < b, the larger id is a "loser" and is dropped (keep-the-
    * smallest — the standard single-pass approximation of clustering;
    * a full transitive closure would need iterative connected
    * components for marginal gain on near-dup data). `pairs` is any
    * (doc1, doc2) relation with doc1 < doc2: exact
    * [[Dedup.ngramJaccardPairs]] here (deterministic, oracle-checked);
    * at 100 TB feed [[Dedup.minhashCandidatePairs]] verified by exact
    * Jaccard on the candidates only — same shape, same downstream. */
  def removeNearDups(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    docs.join(pairs.select(col("doc2").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Per-key frequency cap (SURVEY.md §2 C41): keep at most
    * `maxPerKey` documents per `keyCol` (domain, source, license…),
    * preferring the highest `scoreCol` with `idCol` as the
    * deterministic tie-break — the domain-balancing pass web-corpus
    * pipelines (RefinedWeb/FineWeb stance) run so one mega-domain
    * cannot dominate the training mix.
    *
    * 100 TB shape: the rank-≤-k filter sits directly on the window, so
    * Spark plans a WindowGroupLimit — each key keeps a k-row heap
    * map-side and no key ever fully sorts its documents; the shuffle
    * key is the (high-cardinality) domain. Emits `rk` so downstream
    * sampling can weight within the kept set. */
  def capPerKey(docs: DataFrame, keyCol: String, scoreCol: String,
                idCol: String, maxPerKey: Int): DataFrame = {
    require(maxPerKey > 0, "maxPerKey must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    docs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= maxPerKey)
  }

  /** Full curation: exact dedup → near-dup removal → quality gate,
    * with the exact posting-list Jaccard as the pair source
    * (deterministic, oracle-checked). */
  def curateFull(docs: DataFrame, textCol: String, idCol: String,
                 minQuality: Double, jaccardThreshold: Double,
                 ngram: Int = 3): DataFrame =
    curateFull(docs, textCol, idCol, minQuality,
      Dedup.ngramJaccardPairs(_, textCol, idCol, ngram, jaccardThreshold))

  /** Full curation with a caller-supplied near-dup pair source: any
    * exact-deduped docs → (doc1, doc2) relation with doc1 < doc2,
    * similarity threshold included (which is why this overload takes
    * none). At 100 TB pass the candidates-then-verify composition —
    * [[Dedup.minhashCandidatePairs]] confirmed by
    * [[Dedup.exactJaccardForPairs]] — which never runs a corpus-wide
    * pair join (OperatorsSpec C12b executes exactly that wiring). */
  def curateFull(docs: DataFrame, textCol: String, idCol: String,
                 minQuality: Double,
                 pairs: DataFrame => DataFrame): DataFrame = {
    val survivors = Dedup.exactDedup(docs, textCol, idCol).select(idCol)
    // Cache the deduped corpus once: the pair source reads it (twice,
    // in the candidates-then-verify composition), the anti-join reads
    // it, and the quality gate reads it — without a cut Catalyst
    // re-plans the scan + md5-groupBy + semi-join per consumer.
    // persist (lazy, serialized, disk-spilling) rather than
    // localCheckpoint: construction stays a pure builder (no eager
    // job), lineage stays recoverable on executor loss, and the blocks
    // are released by the ContextCleaner once the returned plan is
    // unreferenced. The same persist-the-deduped-snapshot step a
    // 100 TB pipeline runs (there, a reliable checkpoint/table).
    val exact = docs.join(survivors, Seq(idCol), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    scoreAndGate(removeNearDups(exact, idCol, pairs(exact)),
      textCol, idCol, minQuality)
  }

  /** Leak-free split (C30): rows where `valPred` holds become the
    * validation side (never dropped); train rows near-duplicating ANY
    * val row — `pairs` is a (doc1, doc2) similar-pair relation with
    * doc1 < doc2, exact or candidates-then-verify — are dropped, so
    * held-out metrics can't be inflated by near-dup leakage. Output:
    * (idCol, split). The leaky-id relation is two semi-join-sized
    * probes of `pairs` against the val ids (broadcastable — val is
    * the small split by construction). */
  def splitLeakfree(docs: DataFrame, idCol: String, valPred: Column,
                    pairs: DataFrame): DataFrame = {
    val withSplit = docs.withColumn("split",
      when(valPred, "val").otherwise("train"))
    val valIds = withSplit.filter(col("split") === "val").select(col(idCol))
    val leaky = pairs
      .join(valIds.withColumnRenamed(idCol, "doc1"), Seq("doc1"))
      .select(col("doc2").as(idCol))
      .unionByName(pairs
        .join(valIds.withColumnRenamed(idCol, "doc2"), Seq("doc2"))
        .select(col("doc1").as(idCol)))
      .distinct()
    withSplit.filter(col("split") === "train")
      .join(leaky, Seq(idCol), "left_anti")
      .select(col(idCol), col("split"))
      .unionByName(withSplit.filter(col("split") === "val")
        .select(col(idCol), col("split")))
  }

  private def scoreAndGate(docs: DataFrame, textCol: String, idCol: String,
                           minQuality: Double): DataFrame =
    docs.select(col(idCol),
        size(TextFunctions.tokens(col(textCol))).cast("bigint").as("n_tokens"),
        TextFunctions.round4(TextFunctions.qualityScore(col(textCol))).as("quality"))
      .filter(col("quality") >= minQuality)
}
