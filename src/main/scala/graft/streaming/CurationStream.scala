package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Streaming curation bridge (SURVEY.md §2 C-series in the ingest
  * path): the batch curation pipeline — quality gate + near-dup
  * screening — run INSIDE `foreachBatch`, so a document arriving in
  * micro-batch N+1 is screened against everything batch ≤ N accepted,
  * not only against its own batch. This is the C2e incremental-index
  * design made continuous: the corpus's minhash band buckets persist
  * under `indexDir`, each batch's delta is screened by
  * [[Dedup.incrementalMinhashPairs]] (bucket-join, never all-pairs),
  * and the survivors' buckets are APPENDED to the index — one
  * delta-sized pass per batch, no corpus recompute, the same shape at
  * 100 TB where `indexDir` is the persisted band-bucket snapshot.
  * Every `compactEvery` batches the accumulated appends FOLD into one
  * compacted snapshot ([[Dedup.compactBandBucketIndex]]), so the
  * per-trigger index read opens a bounded file count instead of one
  * file set per historical batch — without it, index-read cost grows
  * linearly with stream age (measured: CurationBench's index_files
  * trace).
  *
  * Duplicate policy: a new doc pairing with an ALREADY-INDEXED doc is
  * dropped (the corpus keeps its first-seen copy); within a batch the
  * smaller id wins — keep-the-smallest, exactly the batch pipeline's
  * rule ([[graft.operators.Corpus.removeNearDups]]).
  *
  * Exactly-once caveat: survivors land with their `batch_id`, so a
  * replayed batch (crash between the write and the checkpoint commit)
  * re-appends under the SAME batch_id and a reader dedups on it —
  * route the output through [[graft.ocsf.IdempotentSink]]'s two-phase
  * commit when at-most-once files are required. The INDEX append is
  * replay-safe by construction: re-appending the same buckets only
  * produces duplicate (band, bh) rows, and the pair screen dedups
  * pairs, so a replay can re-flag but never un-flag. */
object CurationStream {

  /** One micro-batch's accounting (the quarantine-not-drop stance:
    * everything removed is counted, nothing silently vanishes).
    * `secretsScrubbed` counts docs that carried ≥1 masked token —
    * scrubbed docs stay IN the corpus (masking, not dropping).
    * `indexFiles` is how many parquet files the index READ touched
    * this batch — the stream-age cost [[graft.operators.Dedup
    * .compactBandBucketIndex]] bounds; flat across triggers when
    * compaction is on. */
  final case class BatchCounts(batchId: Long, in: Long, lowQuality: Long,
                               duplicates: Long, kept: Long,
                               secretsScrubbed: Long = 0L,
                               indexFiles: Long = 0L)

  /** Screens `batch` against the persisted index, writes survivors to
    * `outDir` (with `batch_id` and their quality score) and appends
    * their band buckets to `indexDir`. Callable directly for backfills
    * and specs; [[start]] wires it into a streaming query.
    *
    * `scrubSecrets` runs [[graft.operators.Secrets.scrub]] (C40)
    * BEFORE quality/dedup, so a leaked credential never reaches the
    * lake, the minhash index, or the quality stats — and so two docs
    * differing only in their embedded keys dedup as the near-dups
    * they are. */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                   indexDir: String, outDir: String,
                   textCol: String, idCol: String,
                   minQuality: Double = 0.3,
                   scrubSecrets: Boolean = false,
                   compactEvery: Int = 0,
                   compactTierBytes: Long = 0L): BatchCounts = {
    val raw = batch.persist()
    val in =
      (if (scrubSecrets) graft.operators.Secrets.scrub(raw, textCol)
       else raw).persist()
    try {
      val nIn = in.count()
      val nScrubbed =
        if (scrubSecrets)
          graft.operators.Secrets.detect(raw, textCol, idCol)
            .filter(col("n_flagged") > 0).count()
        else 0L
      val passed = in
        .withColumn("quality",
          TextFunctions.round4(TextFunctions.qualityScore(col(textCol))))
        .filter(col("quality") >= minQuality)
        .persist()
      val nPassed = passed.count()
      val fs = new Path(indexDir).getFileSystem(
        spark.sessionState.newHadoopConf())
      val nIndexFiles: Long =
        if (!fs.exists(new Path(indexDir))) 0L
        else fs.listStatus(new Path(indexDir)).map(_.getPath.getName)
          .count(n => n.endsWith(".parquet") &&
            !n.startsWith("_") && !n.startsWith(".")).toLong
      val hasIndex = nIndexFiles > 0L
      // empty index: screen within-batch only (same code path — an
      // empty bucket relation contributes no cross pairs)
      val index =
        if (hasIndex) spark.read.parquet(indexDir)
        else Dedup.minhashBandBuckets(passed.limit(0), textCol, idCol)
      val pairs = Dedup.incrementalMinhashPairs(index, passed, textCol, idCol)
      val newIds = passed.select(col(idCol).cast("long").as("nid"))
      // drop the NEW side of every pair; when both sides are new, the
      // larger id (pairs are emitted with id_a < id_b)
      val dropIds = pairs
        .join(newIds.select(col("nid").as("id_a"), lit(true).as("a_new")),
          Seq("id_a"), "left")
        .join(newIds.select(col("nid").as("id_b"), lit(true).as("b_new")),
          Seq("id_b"), "left")
        .select(when(col("b_new").isNotNull, col("id_b"))
          .otherwise(col("id_a")).as("drop_id"))
        .distinct()
      val kept = passed.join(dropIds,
        col(idCol).cast("long") === col("drop_id"), "left_anti")
        .persist()
      val nKept = kept.count()
      kept.withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(outDir)
      // index the survivors only — a dropped duplicate must not keep
      // accumulating bucket entries for text the corpus rejected
      Dedup.minhashBandBuckets(kept, textCol, idCol)
        .write.mode("append").parquet(indexDir)
      // fold the accumulated appends every `compactEvery` batches so
      // the next batch's index read opens O(outFiles) files, not
      // O(stream age). Running it HERE honors the single-writer
      // contract, and a crash anywhere in the fold (or a replay of
      // this whole batch) only duplicates bucket rows — the screen
      // dedups pairs, so a replay re-flags but never un-flags.
      // tierBytes bounds each fold to the small append tail (settled
      // runs untouched) — the LSM-style amortization the r19 soak
      // motivated; 0 keeps the full fold
      if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
        Dedup.compactBandBucketIndex(spark, indexDir,
          tierBytes = compactTierBytes)
      passed.unpersist(); kept.unpersist()
      BatchCounts(batchId, nIn, nIn - nPassed, nPassed - nKept, nKept,
        nScrubbed, nIndexFiles)
    } finally { in.unpersist(); raw.unpersist(); () }
  }

  /** The continuous pipeline: `docs` is a STREAMING DataFrame with
    * (idCol: long-castable, textCol: string). Each micro-batch runs
    * [[processBatch]]; counts land on stderr (wire [[StreamMetrics]]
    * for the progress-based view). */
  def start(docs: DataFrame, indexDir: String, outDir: String,
            checkpointDir: String, textCol: String, idCol: String,
            minQuality: Double = 0.3,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
            scrubSecrets: Boolean = false,
            compactEvery: Int = 32,
            compactTierBytes: Long = 0L): StreamingQuery =
    docs.writeStream
      .queryName("graft-curation")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val c = processBatch(batch.sparkSession, batch, batchId,
          indexDir, outDir, textCol, idCol, minQuality, scrubSecrets,
          compactEvery, compactTierBytes)
        System.err.println(
          s"[graft-curation] batch=${c.batchId} in=${c.in} " +
            s"low_quality=${c.lowQuality} duplicates=${c.duplicates} " +
            s"kept=${c.kept} secrets_scrubbed=${c.secretsScrubbed} " +
            s"index_files=${c.indexFiles}")
        ()
      }
      .start()
}
