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
    val q = CurationStream.start(stream, indexDir, outDir, ckpt,
      "text", "doc_id",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable() // batch 0: doc 10 accepted, indexed
      writeDocs("b1.json", Seq((11L, textA), (12L, textC)))
      q.processAllAvailable() // batch 1: 11 dups vs batch 0, 12 kept
    } finally q.stop()
    val out = spark.read.parquet(outDir)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 12L),
      "the cross-batch duplicate (doc 11) must be dropped against batch 0's index")
    assert(out.filter(col("doc_id") === 12L).select("batch_id")
      .head().getLong(0) >= 1L)
  }
}
