package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C44 — temperature-scaled source mixing
  * ([[DocQueries.temperatureCuts]] / `q_doc_mix_temperature`).
  *
  * Pins the limits that define the rule: T = 1 is proportional
  * sampling (identical rate for every source), T → ∞ converges to
  * C18's equal token split, intermediate T upweights low-resource
  * sources monotonically, zero-token sources sample nothing, and the
  * cuts are deterministic run-to-run. */
class MixSpec extends SparkSpec {
  import spark.implicits._

  // totals chosen well off any 1/65536 grid boundary so a 1-ulp pow
  // difference can never flip an integer cut in these assertions;
  // FOUR sources so the 10000 budget splits evenly (mixCuts uses
  // integer div — an uneven split would differ from the float path
  // by design, not by bug)
  private def totals = Seq(
    ("big", 700001L), ("mid", 90007L), ("small", 10009L), ("tiny", 4001L))
    .toDF("source", "src_tokens")

  private def cuts(t: Double, budget: Long = 10000L): Map[String, String] =
    DocQueries.temperatureCuts(totals, budget, t)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("T = 1 is proportional: every source gets the same rate") {
    val c = cuts(1.0)
    assert(c("big") == c("mid") && c("mid") == c("small"),
      s"proportional sampling must not rebalance: $c")
  }

  test("large T converges to the equal token split (C18's cuts)") {
    val eq = DocQueries.mixCuts(totals, 10000L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val c = cuts(1e9)
    assert(c == eq, s"T->inf must equal the equal split: $c vs $eq")
  }

  test("intermediate T upweights low-resource sources monotonically") {
    val c = cuts(2.0)
    // rate_i ∝ tokens_i^(1/T - 1): decreasing in tokens for T > 1
    assert(c("small") > c("mid") && c("mid") > c("big"),
      s"smaller sources must sample at higher rates: $c")
    // and strictly higher than their proportional (T=1) rate
    val p = cuts(1.0)
    assert(c("small") > p("small"), s"low-resource upweighted vs T=1: $c $p")
    assert(c("big") < p("big"), s"high-resource downweighted vs T=1: $c $p")
  }

  test("zero-token sources sample nothing; cuts are deterministic") {
    val withEmpty = Seq(("a", 5000L), ("none", 0L))
      .toDF("source", "src_tokens")
    val c = DocQueries.temperatureCuts(withEmpty, 1000L, 2.0)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(c("none") == "0000")
    assert(cuts(2.0) == cuts(2.0))
  }

  test("the query draws deterministically and only from sampled sources") {
    val out = DocQueries.qDocMixTemperature(spark, "/root/testdata/sf0.001")
    val a = out.orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val b = out.orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("C96: the repeat plan matches the hand-computed equal-split/ceil/cap/decay formula") {
    val sf = "/root/testdata/sf0.001"
    // independent JVM recomputation from the raw per-source token sums
    val perSrc = graft.sources.Tables.load(spark, sf, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(size(split(coalesce(col("text"), lit("")), " "))
          .cast("bigint")).as("u"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val nSrc = perSrc.size
    val target = 200000L / nSrc
    val got = DocQueries.qDocRepeatBudget(spark, sf).collect()
    assert(got.length == nSrc)
    got.foreach { r =>
      val (src, nDocs, u) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(perSrc(src) == ((nDocs, u)), s"$src totals")
      assert(r.getLong(3) == target)
      val k = if (u > 0) math.min(4L, math.max(1L, (target + u - 1) / u)) else 1L
      assert(r.getLong(4) == k, s"$src repeats")
      val alloc = math.min(k * u, target)
      assert(r.getLong(5) == alloc && r.getLong(6) == target - alloc, s"$src alloc")
      val den = 1L << (k - 1)
      val num = u * (den * 2 - 2) + (alloc - (k - 1) * u)
      assert(r.getLong(7) == num && r.getLong(8) == den, s"$src eff rational")
      // a one-epoch source's effective value IS its allocated tokens
      if (k == 1) assert(r.getLong(7) == alloc && r.getLong(8) == 1L)
      assert(r.getDouble(9) ==
        math.round(num.toDouble / den * 10000d) / 10000d, s"$src eff_tokens")
    }
    // the corpus must actually exercise the repeat regime (k > 1) or
    // the decay arithmetic above was never really tested
    assert(got.exists(_.getLong(4) > 1L), "no source repeats — raise the budget")
  }
}
