package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** C17 — sequence packing: the two-level (bucket-parallel) prefix sum
  * must equal the naive global cumsum for any bucket count, and the
  * boundary flag must mark exactly the straddling documents. */
class PackSpec extends SparkSpec {

  import spark.implicits._

  test("two-level prefix sum equals the naive global cumsum at any bucket count") {
    // 100 docs, deterministic pseudo-random weights, sparse ids
    val docs = spark.range(100)
      .select((col("id") * 7 + 3).as("doc_id"),
        (pmod(xxhash64(col("id")), lit(50)) + 1).as("w"))
    val rows = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var cum = 0L
    val expect = rows.map { case (id, w) =>
      val start = cum; cum += w
      (id, (start, start / 7, (start + w - 1) / 7 > start / 7))
    }.toMap
    for (buckets <- Seq(1, 3, 16, 256)) {
      val got = Pack.packOffsets(docs, "doc_id", "w", budget = 7,
          numBuckets = buckets)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
      assert(got == expect, s"buckets=$buckets diverges from the global cumsum")
    }
  }

  test("clustered sparse ids spread across buckets (quantile cuts, not id range)") {
    // two distant id clusters: [0, 500) and [2^40, 2^40 + 500). Equal-
    // WIDTH range buckets would put each whole cluster in one bucket
    // and the per-bucket cumsum back on a single partition; quantile
    // cuts must keep ~all of the 64 buckets populated — and offsets
    // must still equal the naive global cumsum.
    val docs = spark.range(1000)
      .select(when(col("id") < 500, col("id"))
          .otherwise(col("id") - 500 + (1L << 40)).as("doc_id"),
        (pmod(xxhash64(col("id")), lit(50)) + 1).as("w"))
    val numBuckets = 64
    val rows = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var cum = 0L
    val expect = rows.map { case (id, w) =>
      val start = cum; cum += w
      (id, (start, start / 7, (start + w - 1) / 7 > start / 7))
    }.toMap
    val got = Pack.packOffsets(docs, "doc_id", "w", budget = 7,
      numBuckets = numBuckets)
    val gotMap = got.collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(gotMap == expect, "clustered ids diverge from the global cumsum")
    // bucket occupancy: re-derive the assignment the operator uses and
    // demand >= numBuckets/4 non-empty buckets on this bimodal id set
    val probs = (1 until numBuckets).map(_.toDouble / numBuckets)
    val cuts = docs.agg(
      percentile_approx(col("doc_id").cast("long"),
        typedLit(probs), lit(10000))).head().getSeq[Long](0)
    val nonEmpty = rows.map { case (id, _) => cuts.count(_ <= id) }.distinct.size
    assert(nonEmpty >= numBuckets / 4,
      s"only $nonEmpty of $numBuckets buckets populated — clustered ids collapsed")
  }

  test("straddle flag marks exactly the boundary-crossing docs") {
    val docs = Seq((1L, 5L), (2L, 5L), (3L, 2L)).toDF("doc_id", "w")
    // budget 8: doc1 [0,5) shard 0; doc2 [5,10) straddles into shard 1;
    // doc3 [10,12) shard 1
    val out = Pack.packOffsets(docs, "doc_id", "w", budget = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out == Map(1L -> ((0L, false)), 2L -> ((0L, true)), 3L -> ((1L, false))),
      out.toString)
  }

  test("empty input packs to an empty, correctly-typed result") {
    val docs = Seq.empty[(Long, Long)].toDF("doc_id", "w")
    val out = Pack.packOffsets(docs, "doc_id", "w", budget = 8)
    assert(out.count() == 0)
    assert(out.columns.toSeq ==
      Seq("doc_id", "w", "start_offset", "shard", "spans_boundary"))
  }
}
