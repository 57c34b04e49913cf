package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** C75 filter-evaluation metrics: midrank AUC against hand-computed
  * values (including the tie case the midrank correction exists for)
  * and exact confusion counts at the threshold sweep. */
class EvalSpec extends SparkSpec {

  import spark.implicits._

  test("C75: AUC is 1.0 on perfect separation, 0.0 reversed, 0.5 on a constant score") {
    val perfect = Seq((0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)).toDF("score", "label")
    assert(Eval.rocAuc(perfect, "score", "label").head().getDouble(0) == 1.0)
    val reversed = Seq((0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)).toDF("score", "label")
    assert(Eval.rocAuc(reversed, "score", "label").head().getDouble(0) == 0.0)
    val constant = Seq((0.5, 0), (0.5, 0), (0.5, 1)).toDF("score", "label")
    assert(Eval.rocAuc(constant, "score", "label").head().getDouble(0) == 0.5)
  }

  test("C75: midrank tie correction matches the hand-computed rank sum") {
    // scores: 0.1(n), 0.5(n), 0.5(p), 0.9(p)
    // midranks: 1, 2.5, 2.5, 4 → Σranks⁺ = 6.5
    // AUC = (6.5 − 2·3/2) / (2·2) = 3.5/4 = 0.875
    val d = Seq((0.1, 0), (0.5, 0), (0.5, 1), (0.9, 1)).toDF("score", "label")
    val r = Eval.rocAuc(d, "score", "label").head()
    assert(r.getDouble(0) == 0.875, r.toString)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
  }

  test("C75: threshold sweep emits exact confusion counts (keep = score >= t)") {
    val d = Seq((0.2, 0), (0.4, 1), (0.6, 0), (0.8, 1)).toDF("score", "label")
    val rows = Eval.prAtThresholds(d, "score", "label", Seq(0.5))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // ≥0.5 keeps 0.6(n) and 0.8(p): tp=1 fp=1 fn=1 tn=1, P=R=0.5
    assert(rows.toSeq == Seq((1L, 1L, 1L, 1L, 0.5, 0.5)), rows.mkString(","))
  }

  test("C75: the histogram path never sorts the corpus — window input is score-distinct-sized") {
    // 100k rows but only 3 distinct scores: the orderBy window must sit
    // on the 3-row aggregate, which execution proves by not erroring on
    // a single-partition corpus-wide sort of this size in sub-seconds;
    // correctness is the assertable part
    val big = spark.range(90000L)
      .select((pmod(col("id"), lit(3L)) * 0.1).as("score"),
        (col("id") % 2L).cast("int").as("label"))
    val auc = Eval.rocAuc(big, "score", "label").head().getDouble(0)
    assert(auc == 0.5, s"balanced labels per score must give 0.5, got $auc")
  }

  test("C85: calibration buckets are decimal-exact, means and fractions hand-checked") {
    val g = Seq((0.05, 0), (0.05, 1), (0.15, 0), (0.95, 1), (1.0, 1),
      (0.3, 0)).toDF("score", "label")
    val got = Eval.calibration(g, "score", "label", bins = 10).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (0, 2L, 1L, 0.05, 0.5),
      (1, 1L, 0L, 0.15, 0.0),
      // 0.3 lands in bucket 3 — the IEEE floor(0.3*10)=2 trap avoided
      (3, 1L, 0L, 0.3, 0.0),
      // 1.0 clamps into the last bucket with 0.95
      (9, 2L, 2L, 0.975, 1.0)), got.toSeq.toString)
    // out-of-range scores land in well-defined edge buckets
    val oob = Seq((-0.2, 0), (1.4, 1)).toDF("score", "label")
    val ob = Eval.calibration(oob, "score", "label", bins = 10).collect()
      .map(r => r.getInt(0)).sorted
    assert(ob.toSeq == Seq(0, 9), ob.mkString(","))
  }

  test("C84: histogram drift — hand-computed buckets, gaps, and power-of-two exactness") {
    // side a: values 1,2,3,7 → buckets ⌊log2(v+1)⌋ = 1,1,2,3
    // side b: values 3,3    → bucket 2,2
    val a = Seq(1L, 2L, 3L, 7L).toDF("v")
    val b = Seq(3L, 3L).toDF("v")
    val got = Eval.histogramDrift(a, b, "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1, 2L, 0L, 0.5, 0.0, 0.5),    // cum_a 2/4, cum_b 0/2
      (2, 1L, 2L, 0.75, 1.0, 0.25),  // cum_a 3/4, cum_b 2/2
      (3, 1L, 0L, 1.0, 1.0, 0.0)), got.toSeq.toString)
    // power-of-two boundaries are exact: v = 2^k − 1 is the last value
    // of bucket k − 1... v+1 = 2^k lands bucket k, v+2 stays bucket k
    val edges = Seq(7L, 8L, 9L).toDF("v") // buckets 3, 3, 3 for v+1=8,9,10
    val eb = Eval.histogramDrift(edges, edges, "v").collect()
    assert(eb.length == 1 && eb.head.getInt(0) == 3, eb.mkString(","))
    // identical sides → zero gap everywhere
    assert(Eval.histogramDrift(a, a, "v")
      .agg(max(col("gap"))).head().getDouble(0) == 0.0)
    // one empty side → its cumulative share pins to 0.0, no divide error
    val empty = Seq.empty[Long].toDF("v")
    val oneSided = Eval.histogramDrift(a, empty, "v").collect()
    assert(oneSided.forall(_.getDouble(4) == 0.0))
  }

  private def agreement(rows: Seq[(String, Long, String, Int)]) =
    Eval.raterAgreement(rows.toDF("g", "item", "rater", "label"),
      "g", "item", "rater", "label").collect()
      .map(r => r.getString(0) -> r).toMap

  test("C95: unanimous raters give kappa NULL (pe=1), full disagreement gives po=0") {
    // group "u": 3 raters always vote 1 → po=1 but pe=1 → kappa undefined
    // group "d": 2 raters always split → po=0, pe=0.5, kappa=-1
    val rows =
      (1L to 4L).flatMap(i => Seq("r1", "r2", "r3").map(r => ("u", i, r, 1))) ++
      (1L to 4L).flatMap(i => Seq(("d", i, "r1", 0), ("d", i, "r2", 1)))
    val got = agreement(rows)
    val u = got("u")
    assert(u.getLong(1) == 4 && u.getLong(2) == 12) // items, ratings
    assert(u.getLong(4) == 4 * 6 && u.getLong(5) == 4 * 6, u) // all pairs agree
    assert(u.getDouble(6) == 1.0 && u.getDouble(7) == 1.0)
    assert(u.isNullAt(8), "pe=1 must yield NULL kappa")
    val d = got("d")
    assert(d.getDouble(6) == 0.0, d)     // po
    assert(d.getDouble(7) == 0.5, d)     // pe: two equal marginals
    assert(d.getDouble(8) == -1.0, d)    // kappa = (0-.5)/(1-.5)
  }

  test("C95: hand-computed Fleiss example with mixed votes and unequal raters per item") {
    // item 1: votes (1,1,0) → agree pairs 2; item 2: (1,1) → 2 of 2
    val rows = Seq(
      ("g", 1L, "a", 1), ("g", 1L, "b", 1), ("g", 1L, "c", 0),
      ("g", 2L, "a", 1), ("g", 2L, "b", 1))
    val g = agreement(rows)("g")
    assert(g.getLong(1) == 2 && g.getLong(2) == 5 && g.getLong(3) == 2)
    assert(g.getLong(4) == 4 && g.getLong(5) == 8) // agree=2+2, total=6+2
    assert(g.getDouble(6) == 0.5)                  // po
    // marginals: ones=4, zeros=1 → pe = (16+1)/25 = 0.68
    assert(g.getDouble(7) == 0.68)
    // kappa = (0.5-0.68)/(1-0.68) = -0.5625
    assert(g.getDouble(8) == -0.5625, g)
  }

  test("C95: a zero-pair group reports po and kappa as UNDEFINED, never a fabricated verdict") {
    val g = agreement(Seq(("g", 1L, "a", 1), ("g", 2L, "a", 0)))("g")
    assert(g.getLong(4) == 0 && g.getLong(5) == 0)
    // no pairwise evidence: po/kappa NULL — forcing po = 0 would mint
    // kappa = -pe/(1-pe) = -1 here, a strong systematic-disagreement
    // verdict from two singly-rated items
    assert(g.isNullAt(6), "po must be NULL with zero pairs")
    assert(g.isNullAt(8), "kappa must be NULL with zero pairs")
    assert(g.getDouble(7) == 0.5) // pe is marginal-only: still defined
  }
}
