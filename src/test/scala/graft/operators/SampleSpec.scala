package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** C82 — token-proportional systematic sampling (PPS). The oracle
  * here is a driver-side brute-force replay of the same integer
  * arithmetic: cumulative offsets in ascending id order, step
  * S = max(1, T div k), md5-derived grid phase o, pick count = grid
  * points inside each document's token interval. */
class SampleSpec extends SparkSpec {

  import spark.implicits._

  private def mdPhase(seed: String): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(h.substring(0, 15), 16)
  }

  /** Brute-force replay: (id, w, start, picks) for every doc. */
  private def replay(ws: Seq[(Long, Long)], k: Long,
                     seed: String): Seq[(Long, Long, Long, Long)] = {
    val t = ws.map(_._2).sum
    val s = math.max(1L, t / k)
    val o = mdPhase(seed) % s
    def pts(x: Long): Long = if (x <= o) 0L else (x - o - 1) / s + 1
    var cum = 0L
    ws.sortBy(_._1).map { case (id, w) =>
      val start = cum; cum += w
      (id, w, start, pts(start + w) - pts(start))
    }
  }

  test("C82: pick counts match the brute-force grid replay exactly") {
    val ws = Seq((1L, 10L), (2L, 3L), (3L, 0L), (4L, 25L), (5L, 1L),
      (6L, 7L), (7L, 2L))
    val df = ws.toDF("doc_id", "w")
    val got = Sample.systematicPps(df, "doc_id", "w", k = 5L,
        seed = "spec-seed", numBuckets = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val want = replay(ws, 5L, "spec-seed").filter(_._4 >= 1)
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    // zero-weight docs are never picked
    assert(!got.exists(_._1 == 3L))
    // realized sample size is the exact grid count, k ± 1
    val t = ws.map(_._2).sum; val s = math.max(1L, t / 5L)
    val o = mdPhase("spec-seed") % s
    val gridCount = (t - o + s - 1) / s
    assert(got.map(_._4).sum == gridCount &&
      math.abs(gridCount - 5L) <= 1, s"grid $gridCount")
  }

  test("C82: a document longer than the step is always picked, with multiplicity") {
    // T = 100, k = 4 → S = 25; doc 2 spans 60 tokens → 2 or 3 picks
    val df = Seq((1L, 20L), (2L, 60L), (3L, 20L)).toDF("doc_id", "w")
    val got = Sample.systematicPps(df, "doc_id", "w", k = 4L, seed = "x")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.contains(2L) && got(2L) >= 2, s"long doc under-picked: $got")
  }

  test("C82: bucketing never changes the sample (two-level == global order)") {
    val ws = (1L to 200L).map(i => (i * 37 % 1009, i % 13 + 1))
      .map { case (id, w) => (id, w.toLong) }
    val df = ws.toDF("doc_id", "w")
    def run(buckets: Int) =
      Sample.systematicPps(df, "doc_id", "w", k = 17L, seed = "b",
          numBuckets = buckets)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    assert(run(1) == run(8) && run(8) == run(64))
    assert(run(8) == replay(ws, 17L, "b").filter(_._4 >= 1))
  }

  test("C82: empty and all-zero-weight corpora return empty, not divide-by-zero") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "w")
    assert(Sample.systematicPps(empty, "doc_id", "w", 5L, "e").count() == 0)
    val zeros = Seq((1L, 0L), (2L, 0L)).toDF("doc_id", "w")
    assert(Sample.systematicPps(zeros, "doc_id", "w", 5L, "e").count() == 0)
  }
}
