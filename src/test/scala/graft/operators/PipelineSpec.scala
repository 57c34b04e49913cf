package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** End-to-end curation composition — the README example executed on
  * real testdata: minhash-candidates→exact-verify dedup, benchmark
  * decontamination, then fixed-budget shard packing. Pins the
  * invariants each stage must preserve so the documented pipeline
  * cannot drift from the shipped operators. */
class PipelineSpec extends SparkSpec {

  test("dedup → decontaminate → pack composes end-to-end on testdata") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val total = docs.count()

    val curated = Corpus.curateFull(docs, "text", "doc_id", minQuality = 0.0,
      pairs = { deduped =>
        Dedup.exactJaccardForPairs(deduped, "text", "doc_id",
            Dedup.minhashCandidatePairs(deduped, "text", "doc_id"))
          .filter(col("jaccard") >= 0.5)
          .select(col("id_a").as("doc1"), col("id_b").as("doc2"))
      })
    val nCurated = curated.count()
    assert(nCurated > 0 && nCurated < total,
      s"dedup should drop the planted duplicates: $nCurated of $total")

    // screen against a stand-in eval set (the 10 smallest ids)
    val bench = Dedup.shingles(docs.filter(col("doc_id") < 10),
      "text", "doc_id", n = 5).select(col("gram"))
    val flagged = Dedup.contaminationHits(curated.join(docs, "doc_id"),
      "text", "doc_id", bench, n = 5)
    val clean = curated.join(flagged.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val nClean = clean.count()
    assert(nClean <= nCurated && nClean > 0)

    // pack what survived into 512-token shards
    val packed = Pack.packOffsets(clean.select(col("doc_id"), col("n_tokens")),
      "doc_id", "n_tokens", budget = 512)
    assert(packed.count() == nClean)
    // offsets are contiguous: total span == token sum, shards ordered
    val stats = packed.agg(
      sum(col("n_tokens")).as("toks"),
      max(col("start_offset") + col("n_tokens")).as("hi"),
      min(col("start_offset")).as("lo")).head()
    assert(stats.getLong(2) == 0L)
    assert(stats.getLong(0) == stats.getLong(1),
      s"offset span ${stats.getLong(1)} != token total ${stats.getLong(0)}")
  }

  test("scale config (q_doc_pipeline_scale) converges to the oracle config's survivors") {
    // the claim q_doc_pipeline_scale's rows-only status rests on: at
    // the planted testdata's duplication level (near-dups at Jaccard
    // ≈0.99, squarely inside MinHash-at-32×8's recall), candidates →
    // hashed pair-local verify drops exactly the docs the exact
    // posting-list join drops
    val sf = "/root/testdata/sf0.001"
    val full = graft.queries.DocQueries.qDocPipelineFull(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val scale = graft.queries.DocQueries.qDocPipelineScale(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(scale == full,
      s"survivor sets diverge: scale-only ${scale.diff(full).take(5)}, " +
        s"full-only ${full.diff(scale).take(5)}")
  }
}
