package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Quantified accuracy of the approximate operators on the real
  * testdata tables — approximation is only a valid scale trade if the
  * error is bounded and measured. */
class AccuracySpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("C6b: IVF recall@20 rises with nprobe and is exact at full probe") {
    val emb = Tables.load(spark, sf, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 20)
      .collect().map(_.getLong(0)).toSet
    val index = Ivf.fit(emb, "vec_id", "embedding", numCentroids = 16, iters = 3)
    def recall(np: Int): Double = {
      val got = index.topK(0L, 20, np).collect().map(_.getLong(0)).toSet
      (exact & got).size / 20.0
    }
    // measured on this (deterministic) index: 0.65 / 0.80 / 0.85 / 1.0
    val r1 = recall(1); val r4 = recall(4); val r8 = recall(8); val r16 = recall(16)
    assert(r4 >= 0.75, s"recall@20 nprobe=4 degraded to $r4")
    assert(r8 >= 0.80, s"recall@20 nprobe=8 degraded to $r8")
    assert(r16 == 1.0, s"full probe must equal brute force, got $r16")
    assert(r1 <= r4 && r4 <= r8 && r8 <= r16, s"recall not monotone: $r1 $r4 $r8 $r16")
    index.unpersist()
  }

  test("B22: HLL approx distinct is within the advertised error bound") {
    val events = Tables.load(spark, sf, "events")
    val exact = events.select(countDistinct("user_id")).head().getLong(0)
    // default rsd = 0.05; 3 sigma ≈ 15% is a conservative flake-free bound
    val approx = events.select(approx_count_distinct("user_id")).head().getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.15, s"HLL error $err (exact=$exact approx=$approx)")
  }
}
