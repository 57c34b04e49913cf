package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavior specs for [[Dsir]] (C27) and [[Shard]] (C28) — the
  * CORRECTNESS hash-match pins engine parity; these pin the semantic
  * properties: weight direction/zero-point for DSIR, and rank
  * equivalence + balance for sharding. */
class DsirShardSpec extends SparkSpec {

  import spark.implicits._

  test("C27: target-like docs weigh higher; target==raw weighs ~zero") {
    val docs = Seq(
      (1L, "alpha alpha beta", "en"),
      (2L, "alpha beta alpha", "en"),
      (3L, "gamma delta gamma delta", "de"),
      (4L, "alpha beta alpha beta", "de") // de doc with en-like tokens
    ).toDF("doc_id", "text", "lang")
    val scored = Dsir.scoreDocs(docs, "text", "doc_id",
      Dsir.bucketLogRatios(docs, "text", col("lang") === "en"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored.size == 4, "every doc must score")
    // docs made of target-distribution tokens outweigh the off-target doc
    assert(scored(1L) > scored(3L) && scored(2L) > scored(3L) &&
           scored(4L) > scored(3L),
      s"en-like docs must outweigh the de-only doc: $scored")
    // when target == raw, lambda is ~0 everywhere (smoothing aside)
    val self = Dsir.scoreDocs(docs, "text", "doc_id",
      Dsir.bucketLogRatios(docs, "text", lit(true)))
      .agg(max(abs(col("log_weight")))).head().getDouble(0)
    assert(self < 0.05, s"self-weighting should be ~0, was $self")
  }

  test("C27b: per-doc weight is additive in its bucket counts") {
    // doubling a doc's tokens doubles its log-weight (bag-of-words
    // linearity — the property that makes the scoring map-only safe)
    val docs = Seq((1L, "alpha beta", "en"), (2L, "gamma", "de"))
      .toDF("doc_id", "text", "lang")
    val ratios = Dsir.bucketLogRatios(docs, "text", col("lang") === "en")
    val once = Dsir.scoreDocs(docs, "text", "doc_id", ratios)
      .filter(col("doc_id") === 1L).head().getDouble(1)
    val doubled = Dsir.scoreDocs(
      Seq((1L, "alpha beta alpha beta", "en")).toDF("doc_id", "text", "lang"),
      "text", "doc_id", ratios)
      .head().getDouble(1)
    assert(math.abs(doubled - 2 * once) < 1e-3,
      s"expected ~2x($once) got $doubled")
  }

  test("C28: two-level rank deal equals the flat global-window deal") {
    val rnd = new scala.util.Random(11)
    val docs = (1L to 300L).map(i => (i, 10L + rnd.nextInt(1000).toLong))
      .toDF("doc_id", "n_tokens")
    val assigned = Shard.assign(docs, "doc_id", "n_tokens", numShards = 8)
    // flat reference: one global row_number over (bucket, tokens desc, id)
    val flat = docs
      .withColumn("b", substring(md5(col("doc_id").cast("string")), 1, 1))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("b"), col("n_tokens").desc, col("doc_id"))))
      .select(col("doc_id"), ((col("rnk") - 1) % 8).cast("int").as("shard"))
    assert(assigned.select("doc_id", "shard")
      .except(flat).isEmpty, "two-level rank diverged from global sort")
    // deterministic: a second run assigns identically
    assert(Shard.assign(docs, "doc_id", "n_tokens", numShards = 8)
      .select("doc_id", "shard").except(assigned.select("doc_id", "shard"))
      .isEmpty)
  }

  test("C36: epoch shuffle is a contiguous permutation, seed-sensitive, null-id-safe") {
    import spark.implicits._
    val ids = (0L until 99L).map(Option(_)) :+ Option.empty[Long]
    val d = ids.toDF("doc_id")
    val out = Shard.epochShuffle(d, "doc_id", seed = 7L, numShards = 4)
      .select("doc_id", "position", "shard").collect()
    // every row (incl. the null id) holds exactly one position 0..n-1
    assert(out.length == 100)
    assert(out.map(_.getLong(1)).sorted.toSeq == (0L until 100L))
    // round-robin deal: shard sizes equal
    assert(out.groupBy(_.getInt(2)).values.map(_.size).toSet == Set(25))
    // deterministic for the same seed; a different seed reshuffles
    val again = Shard.epochShuffle(d, "doc_id", seed = 7L, numShards = 4)
      .select("doc_id", "position").collect()
      .map(r => Option(r.get(0)) -> r.getLong(1)).toMap
    out.foreach(r => assert(again(Option(r.get(0))) == r.getLong(1)))
    val other = Shard.epochShuffle(d, "doc_id", seed = 8L, numShards = 4)
      .select("doc_id", "position").collect()
      .map(r => Option(r.get(0)) -> r.getLong(1)).toMap
    assert(out.count(r => other(Option(r.get(0))) != r.getLong(1)) > 50,
      "a different seed must produce a different permutation")
  }

  test("C28b: shards come out token-balanced on skewed sizes") {
    // heavy-tailed weights: a naive contiguous split would put the
    // giants together; round-robin over the size-descending deal
    // spreads them
    val rnd = new scala.util.Random(3)
    val docs = (1L to 400L)
      .map(i => (i, math.pow(10, rnd.nextDouble() * 3).toLong + 1))
      .toDF("doc_id", "n_tokens")
    val totals = Shard.assign(docs, "doc_id", "n_tokens", numShards = 8)
      .groupBy("shard").agg(sum("n_tokens").as("t"))
      .select("t").as[Long].collect()
    assert(totals.length == 8)
    val ratio = totals.max.toDouble / totals.min
    info(f"shard token balance max/min = $ratio%.2f")
    assert(ratio < 1.6, s"shards unbalanced: max/min=$ratio")
  }
}
