package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.SparkSpec

/** The streaming curation bridge: the C-series quality gate + near-dup
  * screen running in the ingest path, with the minhash index
  * accumulating across micro-batches — a duplicate arriving in batch
  * N+1 must be flagged against batch N's survivors. */
class CurationStreamSpec extends SparkSpec {

  import spark.implicits._

  private val textA = "the quick brown fox jumps over the lazy dog while " +
    "seventeen curious ravens watch from the old oak tree near the river bend"
  private val textC = "entirely different prose about distributed query " +
    "engines shuffling partitioned columnar data across many executor cores " +
    "with adaptive plans and broadcast joins"

  test("a duplicate arriving in batch N+1 is flagged against batch N's index") {
    val indexDir = Files.createTempDirectory("cur-idx").toString
    val outDir = Files.createTempDirectory("cur-out").toString
    // batch 0: two good docs
    val b0 = Seq((1L, textA), (2L, textC)).toDF("doc_id", "text")
    val c0 = CurationStream.processBatch(spark, b0, 0L, indexDir, outDir,
      "text", "doc_id")
    assert(c0 == CurationStream.BatchCounts(0L, 2, 0, 0, 2), c0.toString)
    // batch 1: a byte-identical duplicate of doc 1 (new id), one unique
    // doc, one low-quality doc
    val b1 = Seq((3L, textA), (4L, textC + " plus a genuinely new clause " +
      "describing watermarks and stateful aggregation semantics here"),
      (5L, "1234567890 000 111")).toDF("doc_id", "text")
    val c1 = CurationStream.processBatch(spark, b1, 1L, indexDir, outDir,
      "text", "doc_id")
    assert(c1.in == 3 && c1.lowQuality == 1, c1.toString)
    assert(c1.duplicates == 1,
      s"doc 3 must be flagged against batch 0's index: $c1")
    assert(c1.kept == 1, c1.toString)
    val out = spark.read.parquet(outDir)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 4L))
    // doc 3 was REJECTED, so its buckets must not be in the index: a
    // batch-2 replay of the same text still collides with doc 1 only
    val c2 = CurationStream.processBatch(spark,
      Seq((6L, textA)).toDF("doc_id", "text"), 2L, indexDir, outDir,
      "text", "doc_id")
    assert(c2.duplicates == 1 && c2.kept == 0, c2.toString)
  }

  test("tiered fold leaves settled runs untouched, folds only the append tail, and screens identically") {
    import graft.operators.Dedup
    def listIdx(dir: String): Seq[(String, Long)] = {
      val d = new java.io.File(dir)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(f => f.getName -> f.length()).sortBy(_._1).toSeq
    }
    val textB = "a further passage with wholly novel wording about columnar " +
      "encodings dictionary pages and run length bit packing hybrid schemes"
    def append(dir: String, docs: (Long, String)*): Unit =
      Dedup.minhashBandBuckets(docs.toDF("doc_id", "text"), "text", "doc_id")
        .write.mode("append").parquet(dir)
    val indexDir = Files.createTempDirectory("cur-tier-idx").toString
    append(indexDir, 1L -> textA, 2L -> textC)
    append(indexDir, 3L -> textB)
    // settle the first era into one run
    assert(Dedup.compactBandBucketIndex(spark, indexDir) >= 2)
    val run = listIdx(indexDir)
    assert(run.nonEmpty && run.forall(_._1.startsWith("compact-")))
    // a second era of small appends arrives
    append(indexDir, 10L -> (textA + " with an appended clause"))
    append(indexDir, 11L -> (textC + " and one more thought"))
    val beforeTier = listIdx(indexDir)
    // tier threshold above every append but below nothing else: the
    // run files are larger than the appends on this corpus — pick the
    // threshold between the two measured size ranges
    val runMax = run.map(_._2).max
    val appendSizes = beforeTier.filterNot(f => run.contains(f)).map(_._2)
    assert(appendSizes.nonEmpty && appendSizes.max < runMax,
      s"test precondition: appends $appendSizes vs run $run")
    val folded = Dedup.compactBandBucketIndex(spark, indexDir,
      tierBytes = appendSizes.max + 1)
    assert(folded == appendSizes.size, s"folded $folded of $appendSizes")
    val afterTier = listIdx(indexDir)
    // the settled run's files survived BY NAME (never rewritten)...
    assert(run.forall(afterTier.contains),
      s"settled run rewritten: $run vs $afterTier")
    // ...the appends are gone, replaced by a new small run
    assert(afterTier.size > run.size &&
      afterTier.forall(_._1.startsWith("compact-")), afterTier.toString)
    // and the screen over the tiered index flags exactly what the
    // single-run index would: doc 20 dups textA (indexed in the OLD
    // run), doc 21 dups doc 10's variant (indexed in the NEW run)
    val delta = Seq(20L -> textA,
      21L -> (textA + " with an appended clause")).toDF("doc_id", "text")
    val pairs = Dedup.incrementalMinhashPairs(
      spark.read.parquet(indexDir), delta, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pairs.contains((1L, 20L)) && pairs.contains((10L, 21L)),
      s"tiered index missed cross-era dups: $pairs")
  }

  test("index fold crash matrix: a crash at EVERY mutation boundary leaves the screen's verdicts identical; the re-run settles") {
    import graft.operators.Dedup
    import graft.ocsf.FaultFs
    spark.sparkContext.hadoopConfiguration
      .set("fs.faultfs.impl", classOf[FaultFs].getName)
    val textB = "one more unrelated narrative mentioning lakehouse table " +
      "formats snapshot isolation optimistic concurrency and manifest lists"
    def appendTo(dir: String, docs: (Long, String)*): Unit =
      Dedup.minhashBandBuckets(docs.toDF("doc_id", "text"), "text", "doc_id")
        .write.mode("append").parquet(dir)
    def build(dir: String): Unit = {
      appendTo(dir, 1L -> textA, 2L -> textC)
      appendTo(dir, 3L -> textB)
      appendTo(dir, 4L -> (textA + " lightly extended"))
    }
    def screen(dir: String): Set[(Long, Long)] =
      Dedup.incrementalMinhashPairs(spark.read.parquet(dir),
        Seq(20L -> textA, 21L -> textB).toDF("doc_id", "text"),
        "text", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def copyTree(src: java.nio.file.Path): String = {
      import scala.jdk.CollectionConverters._
      val dst = Files.createTempDirectory("cur-crash-copy")
      Files.walk(src).iterator().asScala.foreach { p =>
        val t = dst.resolve(src.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t)
      }
      "faultfs:" + dst
    }
    val proto = Files.createTempDirectory("cur-crash-proto")
    FaultFs.disarm()
    build("faultfs:" + proto)
    val reference = screen("faultfs:" + proto)
    assert(reference.nonEmpty, "planted dups must flag")
    // op total of a clean fold on a copy
    FaultFs.disarm()
    assert(Dedup.compactBandBucketIndex(spark, copyTree(proto)) >= 2)
    val n = FaultFs.ops
    FaultFs.disarm()
    assert(n >= 4, s"expected several fold mutations, got $n")
    (0L until n).foreach { k =>
      val c = copyTree(proto)
      FaultFs.arm(k)
      val crashed = try { Dedup.compactBandBucketIndex(spark, c); false }
        catch { case t: Throwable =>
          assert(FaultFs.causedByInjection(t), s"k=$k non-injected: $t"); true }
      FaultFs.disarm()
      // IN the crash window: whatever mix of originals / compacted
      // copies / tmp dirs the cut left, the screen re-flags exactly
      // the same pairs (duplicated bucket rows dedup; tmp is hidden)
      assert(screen(c) == reference, s"k=$k (crashed=$crashed) verdicts moved")
      // the NEXT fold settles the leftovers and verdicts still hold
      Dedup.compactBandBucketIndex(spark, c)
      assert(screen(c) == reference, s"k=$k verdicts moved after re-fold")
      val live = new java.io.File(c.stripPrefix("faultfs:")).listFiles()
        .map(_.getName).filter(f => f.endsWith(".parquet") &&
          !f.startsWith("_") && !f.startsWith("."))
      assert(live.forall(_.startsWith("compact-")),
        s"k=$k re-fold left unfolded appends: ${live.toSeq}")
      // and no crashed-attempt tmp dir survives the re-fold's sweep
      val tmps = new java.io.File(c.stripPrefix("faultfs:")).listFiles()
        .map(_.getName).filter(_.startsWith("_compact_tmp_"))
      assert(tmps.isEmpty, s"k=$k stale tmp dirs: ${tmps.toSeq}")
    }
  }

  test("scrubSecrets masks a planted credential before the lake and the index") {
    val indexDir = Files.createTempDirectory("cur-sec-idx").toString
    val outDir = Files.createTempDirectory("cur-sec-out").toString
    val key = "AKIAxQ7rT2mWp9ZbYv3e"
    val b0 = Seq((1L, s"$textA token $key here"), (2L, textC))
      .toDF("doc_id", "text")
    val c0 = CurationStream.processBatch(spark, b0, 0L, indexDir, outDir,
      "text", "doc_id", scrubSecrets = true)
    assert(c0.kept == 2 && c0.secretsScrubbed == 1, c0.toString)
    val landed = spark.read.parquet(outDir)
      .filter(col("doc_id") === 1L).select("text").as[String].collect()(0)
    assert(!landed.contains(key), "credential must not reach the lake")
    assert(landed.contains(graft.operators.Secrets.Mask))
    // a doc differing ONLY in its embedded key dedups against doc 1:
    // both scrub to the same text, so batch 1's copy is an exact dup
    val b1 = Seq((3L, s"$textA token AKIAzW4kN8vRq6XcJm2u here"))
      .toDF("doc_id", "text")
    val c1 = CurationStream.processBatch(spark, b1, 1L, indexDir, outDir,
      "text", "doc_id", scrubSecrets = true)
    assert(c1.duplicates == 1 && c1.kept == 0,
      s"key-rotated near-dup must collide after scrubbing: $c1")
  }

  test("mid-stream index compaction preserves every admission verdict, shrinks the file count, and survives a replay crash window") {
    import graft.operators.Dedup
    def listIndex(dir: String): Seq[String] = {
      val d = new java.io.File(dir)
      Option(d.listFiles()).getOrElse(Array.empty)
        .map(_.getName)
        .filter(n => n.endsWith(".parquet") &&
          !n.startsWith("_") && !n.startsWith(".")).toSeq.sorted
    }
    val textB = "yet another wholly distinct passage on tokenizer training " +
      "ladders pruning seed vocabularies with expectation maximization and " +
      "alphabet coverage floors intact"
    val batches = Seq(
      Seq(1L -> textA, 2L -> textC),
      Seq(3L -> textB),
      // probes: 4 dups textA (indexed batch 0), 5 dups textB (batch 1),
      // 6 is genuinely new
      Seq(4L -> textA, 5L -> textB,
        6L -> (textC + " extended with fresh clauses about stateful " +
          "stream processing checkpoints and watermark semantics")))
    def run(compactAfterBatch: Option[Int],
            replayDupes: Boolean = false): (Seq[CurationStream.BatchCounts], Seq[String], Seq[Long]) = {
      val indexDir = Files.createTempDirectory("cur-cmp-idx").toString
      val outDir = Files.createTempDirectory("cur-cmp-out").toString
      val counts = batches.zipWithIndex.map { case (docs, i) =>
        val c = CurationStream.processBatch(spark,
          docs.toDF("doc_id", "text"), i.toLong, indexDir, outDir,
          "text", "doc_id")
        if (compactAfterBatch.contains(i)) {
          val folded = Dedup.compactBandBucketIndex(spark, indexDir)
          assert(folded >= 2, s"expected a real fold, got $folded")
          // immediately after the fold — before the next batch appends
          // — the live index must be EXACTLY the compacted snapshot
          val afterFold = listIndex(indexDir)
          assert(afterFold.nonEmpty && afterFold.forall(_.startsWith("compact-")),
            s"post-fold index must be exactly compact-* files: $afterFold")
          if (replayDupes) {
            // crash-window simulation: a replayed append re-adds batch
            // i's survivor buckets BESIDE the compacted copy — the
            // documented harmless-duplicate state
            val survivors = spark.read.parquet(outDir)
              .filter(col("batch_id") <= i)
              .select(col("doc_id"), col("text"))
            Dedup.minhashBandBuckets(survivors, "text", "doc_id")
              .write.mode("append").parquet(indexDir)
          }
        }
        c
      }
      val kept = spark.read.parquet(outDir)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      (counts, listIndex(indexDir), kept)
    }
    val (plainCounts, plainFiles, plainKept) = run(None)
    val (cmpCounts, cmpFiles, cmpKept) = run(Some(1))
    // identical verdicts batch-for-batch (indexFiles may differ — drop it)
    def verdicts(cs: Seq[CurationStream.BatchCounts]) =
      cs.map(c => (c.batchId, c.in, c.lowQuality, c.duplicates, c.kept))
    assert(verdicts(cmpCounts) == verdicts(plainCounts),
      s"compaction changed admission verdicts:\n$cmpCounts\n$plainCounts")
    assert(cmpKept == plainKept)
    assert(cmpKept == Seq(1L, 2L, 3L, 6L), cmpKept.toString)
    // the post-compaction batch read fewer files than the plain run's
    assert(cmpCounts(2).indexFiles < plainCounts(2).indexFiles,
      s"compaction must shrink the index read: ${cmpCounts(2).indexFiles} " +
        s"vs ${plainCounts(2).indexFiles}")
    // end-of-run state: the compacted snapshot plus batch 2's appends
    assert(cmpFiles.exists(_.startsWith("compact-")) &&
      cmpFiles.exists(!_.startsWith("compact-")),
      s"final index must hold the compacted snapshot AND post-fold appends: $cmpFiles")
    // replay crash window: duplicated bucket rows re-flag, never un-flag
    val (repCounts, _, repKept) = run(Some(1), replayDupes = true)
    assert(verdicts(repCounts) == verdicts(plainCounts),
      s"replay duplicates changed verdicts:\n$repCounts\n$plainCounts")
    assert(repKept == plainKept)
    // and compaction is idempotent: folding the replayed state again
    // collapses the duplicate ids (array_distinct) without loss
  }

  test("the streaming query carries the index across real micro-batches") {
    val landing = Files.createTempDirectory("cur-stream-in")
    val indexDir = Files.createTempDirectory("cur-stream-idx").toString
    val outDir = Files.createTempDirectory("cur-stream-out").toString
    val ckpt = Files.createTempDirectory("cur-stream-ckpt").toString
    def writeDocs(name: String, docs: Seq[(Long, String)]): Unit =
      Files.write(landing.resolve(name), docs.map { case (id, t) =>
        s"""{"doc_id":$id,"text":"$t"}"""
      }.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    writeDocs("b0.json", Seq((10L, textA)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(landing.toString)
    // compactEvery = 1: every real micro-batch folds the index, so
    // this also exercises the in-stream compaction wiring end-to-end
    val q = CurationStream.start(stream, indexDir, outDir, ckpt,
      "text", "doc_id",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      compactEvery = 1)
    try {
      q.processAllAvailable() // batch 0: doc 10 accepted, indexed
      writeDocs("b1.json", Seq((11L, textA), (12L, textC)))
      q.processAllAvailable() // batch 1: 11 dups vs batch 0, 12 kept
      writeDocs("b2.json", Seq((13L, textC))) // dups vs COMPACTED index
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outDir)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 12L),
      "cross-batch duplicates (11 vs batch 0; 13 vs the COMPACTED index) must drop")
    assert(out.filter(col("doc_id") === 12L).select("batch_id")
      .head().getLong(0) >= 1L)
    // the live index is the folded snapshot, not one file-set per batch
    val idxFiles = Option(new java.io.File(indexDir).listFiles())
      .getOrElse(Array.empty).map(_.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
    assert(idxFiles.forall(_.startsWith("compact-")),
      s"in-stream compaction must have folded the appends: ${idxFiles.toSeq}")
  }
}
