package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Graded-similarity, semantics, and accounting specs for
  * [[SemDedup]] (C26). The CORRECTNESS hash-match pins the engine
  * parity on planted exact-scale dups; these pin the parts a 1.0-cosine
  * plant cannot: graded thresholds, the chain-insensitive greedy
  * keeper rule, the maxBlock quarantine, and the measured recall cost
  * of sign-bit blocking on perturbed near-dups. */
class SemDedupSpec extends SparkSpec {

  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("C26: graded thresholds — pairs above tau dedup, below survive") {
    // all first-4 signs positive => one block; cosines to a: b ~0.9997,
    // e ~0.9487, far-angle f ~0.71
    val emb = Seq(
      (1L, vec(1, 1, 1, 1, 0, 0, 0, 0)),                 // a
      (2L, vec(1, 1, 1, 1, 0.1, 0, 0, 0)),               // b ≈ a
      (3L, vec(1, 1, 0.5, 0.5, 0, 0, 0, 0)),             // e: cos(a,e)=0.9487
      (4L, vec(1, 0.1, 0.1, 0.1, 3, 0, 0, 0))            // f: far from all
    ).toDF("id", "v")
    val strict = SemDedup.duplicates(emb, "id", "v", bits = 4, threshold = 0.98)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    assert(strict == Set((1L, 2L)), s"tau=0.98 expected only (1,2): $strict")
    val loose = SemDedup.duplicates(emb, "id", "v", bits = 4, threshold = 0.9)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    assert(loose == Set((1L, 2L), (1L, 3L)), s"tau=0.9 expected (1,2),(1,3): $loose")
    val surv = SemDedup.survivors(emb, "id", "v", bits = 4, threshold = 0.9)
      .select("id").as[Long].collect().toSet
    assert(surv == Set(1L, 4L))
  }

  test("C26b: greedy keeper rule is chain-insensitive and keeper-min") {
    // angles 0°, 25°, 50° in the first-2 plane (plus tiny positive
    // padding to land in one block): cos(0,25)=cos(25,50)≈0.906 ≥ tau,
    // cos(0,50)≈0.643 < tau. EXISTS semantics: 2 dups onto 1, 3 dups
    // onto 2 (even though 2 is itself dropped), 1 survives alone.
    def ang(d: Double) = vec(math.cos(math.toRadians(d)),
      math.sin(math.toRadians(d)) + 1e-3, 1e-3, 1e-3, 0, 0, 0, 0)
    val emb = Seq((1L, ang(0)), (2L, ang(25)), (3L, ang(50))).toDF("id", "v")
    val dup = SemDedup.duplicates(emb, "id", "v", bits = 4, threshold = 0.87)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList.sorted
    assert(dup == List((2L, 1L, 1L), (3L, 2L, 1L)),
      s"expected chain 2<-1, 3<-2 with one neighbor each: $dup")
    // a second copy of angle 0 gives dup 2 two keeper candidates; min wins
    val emb2 = emb.unionByName(Seq((0L, ang(1))).toDF("id", "v"))
    val keeper2 = SemDedup.duplicates(emb2, "id", "v", bits = 4, threshold = 0.87)
      .filter(col("dup_id") === 2L).head()
    assert(keeper2.getAs[Long]("keeper_id") == 0L)
    assert(keeper2.getAs[Long]("n_neighbors") == 2L)
  }

  test("C26c: maxBlock cap quarantines the block into oversizeBlocks, not silence") {
    val crowd = (1L to 10L).map(i => (i, vec(1, 1, 1, 1, i * 0.001, 0, 0, 0)))
    val lone  = Seq((100L, vec(-1, 1, 1, 1, 0, 0, 0, 0)),
                    (101L, vec(-1, 1, 1, 1, 0.001, 0, 0, 0)))
    val emb = (crowd ++ lone).toDF("id", "v")
    val dup = SemDedup.duplicates(emb, "id", "v", bits = 4, threshold = 0.9,
      maxBlock = 5)
    // the crowded block is excluded wholesale; the small block still dedups
    assert(dup.select("dup_id").as[Long].collect().toSet == Set(101L))
    val over = SemDedup.oversizeBlocks(emb, "id", "v", bits = 4, maxBlock = 5)
      .collect()
    assert(over.length == 1 && over.head.getAs[Long]("block_size") == 10L)
    // cap high enough -> nothing accounted, crowd dedups to its min id
    assert(SemDedup.oversizeBlocks(emb, "id", "v", bits = 4, maxBlock = 100)
      .isEmpty)
    val full = SemDedup.duplicates(emb, "id", "v", bits = 4, threshold = 0.9)
    assert(full.filter(col("keeper_id") === 1L).count() == 9)
  }

  test("C26d: sign-block recall on perturbed near-dups is measured and bounded") {
    // 200 seeded random 16-dim vectors + a perturbed near-dup each;
    // bits=0 (single block) is the exact all-pairs reference, bits=4
    // the scale config. Blocking only loses a pair when a perturbation
    // flips one of the first 4 signs — rare for small noise, and the
    // measured figure documents exactly how rare.
    val rnd = new scala.util.Random(7)
    val base = (0 until 200).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
    }
    val dups = base.map { case (id, v) =>
      (id + 1000L, v.map(x => x + (rnd.nextGaussian() * 0.05).toFloat))
    }
    val emb = (base ++ dups).toDF("id", "v")
    val exact = SemDedup.duplicates(emb, "id", "v", bits = 0, threshold = 0.9)
      .select("dup_id").as[Long].collect().toSet
    val blocked = SemDedup.duplicates(emb, "id", "v", bits = 4, threshold = 0.9)
      .select("dup_id").as[Long].collect().toSet
    assert(blocked.subsetOf(exact), "blocking must not invent pairs")
    val recall = blocked.size.toDouble / exact.size
    info(f"sign-block(4) recall vs exact: $recall%.3f (${blocked.size}/${exact.size})")
    assert(exact.size >= 150, s"plant failed: only ${exact.size} exact dups")
    assert(recall >= 0.85, s"blocking recall degraded to $recall")
  }
}
