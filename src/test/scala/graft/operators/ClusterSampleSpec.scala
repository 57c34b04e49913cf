package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** C35 — cluster-balanced sampling: quotas hold exactly, the draw is
  * deterministic, and a dominant topic mode is capped to its quota
  * where a uniform draw would reproduce the skew. Cell semantics are
  * pinned against FROZEN orthogonal centroids (exact assignment);
  * k-means mode recovery itself is Ivf's contract (AccuracySpec). */
class ClusterSampleSpec extends SparkSpec {

  import spark.implicits._

  // 3 orthogonal directions in R^4 with heavy skew: 800 docs on mode
  // A, 150 on B, 50 on C (tiny deterministic jitter in the 4th dim so
  // vectors are distinct; cosine vs the true centroid stays ~1 and vs
  // the others ~0, so frozen-centroid assignment is exact)
  private def corpus = {
    val base = Map(0 -> Array(1.0, 0.0, 0.0, 0.0),
                   1 -> Array(0.0, 1.0, 0.0, 0.0),
                   2 -> Array(0.0, 0.0, 1.0, 0.0))
    (0 until 1000).map { i =>
      val mode = if (i < 800) 0 else if (i < 950) 1 else 2
      val eps = 0.01 * ((i * 2654435761L % 97).toDouble / 97.0)
      val v = base(mode).clone(); v(3) = eps
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private val modes: Seq[Array[Double]] = Seq(
    Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0),
    Array(0.0, 0.0, 1.0, 0.0))

  test("per-cell quota holds exactly; the dominant mode is capped") {
    val s = ClusterSample.sampleWithCentroids(corpus, "vec_id", "embedding",
      modes, perCell = 20)
    val byCell = s.groupBy("centroid_id")
      .agg(count(lit(1)).as("n"), first("cell_size").as("size"),
           countDistinct("cell_size").as("nsizes"))
      .collect().sortBy(_.getInt(0))
    assert(byCell.map(_.getLong(2)).toSeq == Seq(800L, 150L, 50L),
      "orthogonal-mode assignment must be exact")
    byCell.foreach { r =>
      assert(r.getLong(3) == 1L, "cell_size must be constant within a cell")
      assert(r.getLong(1) == math.min(20L, r.getLong(2)))
    }
    // corpus is 80% mode A; the balanced sample is 20/60 mode A
    val total = byCell.map(_.getLong(1)).sum
    assert(total == 60L && byCell.head.getLong(1) == 20L)
  }

  test("the draw is deterministic and centroid-frozen sampling is stable on append") {
    val c1 = ClusterSample.sampleWithCentroids(corpus, "vec_id", "embedding",
      modes, 10).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val c2 = ClusterSample.sampleWithCentroids(corpus, "vec_id", "embedding",
      modes, 10).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(c1 == c2, "same corpus + seed must draw the same sample")

    // day-2 append under the SAME frozen centroids: cells keep their
    // identity; the new doc only changes its own cell's candidate set
    val extra = Seq((2000L, Seq(0.0, 0.0, 1.0, 0.005)))
      .toDF("vec_id", "embedding")
    val day2 = ClusterSample.sampleWithCentroids(corpus.union(extra),
      "vec_id", "embedding", modes, perCell = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val changedCells = (c1 diff day2).map(_._2) ++ (day2 diff c1).map(_._2)
    assert(changedCells.forall(_ == 2),
      s"an append to cell 2 must not perturb other cells: $changedCells")
  }

  test("the end-to-end fit path keeps quotas and is run-to-run deterministic") {
    val s1 = ClusterSample.sample(corpus, "vec_id", "embedding", k = 3,
      perCell = 15, iters = 3)
    val rows1 = s1.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val byCell = s1.groupBy("centroid_id")
      .agg(count(lit(1)).as("n"), first("cell_size").as("size")).collect()
    byCell.foreach(r =>
      assert(r.getLong(1) == math.min(15L, r.getLong(2))))
    val rows2 = ClusterSample.sample(corpus, "vec_id", "embedding", k = 3,
      perCell = 15, iters = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows1 == rows2)
  }

  test("portable quantizer: assignment is the exact integer-L2 argmin with lowest-cell ties") {
    // brute-force the portable contract: quantize to 1e-6 integers,
    // seed cells = k smallest (md5(id), id), assign by integer squared
    // L2, ties to the lowest cell id — the engine-exact recipe the SQL
    // oracle replays
    val k = 4
    val data = corpus
    val sample = ClusterSample.samplePortable(data, "vec_id", "embedding",
      k = k, perCell = 7)
    val vecs = data.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).map(x => math.round(x * 1e6)).toArray)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val seeds = vecs.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(k).map(_._2)
    def cell(q: Array[Long]): Int =
      seeds.zipWithIndex.minBy { case (c, i) =>
        (c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum, i) }._2
    val expectAssign = vecs.map { case (id, q) => id -> cell(q) }.toMap
    val expectSizes = expectAssign.values.groupBy(identity).map { case (c, xs) => c -> xs.size }
    val got = sample.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    got.foreach { case (id, c, sz) =>
      assert(c == expectAssign(id), s"vec $id assigned $c, argmin says ${expectAssign(id)}")
      assert(sz == expectSizes(c).toLong, s"cell $c size $sz != ${expectSizes(c)}")
    }
    val perCellCounts = got.groupBy(_._2).map { case (c, xs) => c -> xs.length }
    perCellCounts.foreach { case (c, n) =>
      assert(n == math.min(7, expectSizes(c)), s"cell $c quota violated: $n")
    }
    // deterministic replay
    val again = ClusterSample.samplePortable(data, "vec_id", "embedding",
      k = k, perCell = 7).collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSet == again.toSet)
  }
}
