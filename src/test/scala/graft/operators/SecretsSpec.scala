package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C40 — high-entropy secret detection/scrubbing ([[Secrets]]).
  *
  * Pins: exact Shannon entropy on hand-computable tokens, the
  * integer candidate guards, planted-credential flagging vs natural
  * words, the scrub round-trip (flagged masked, rest byte-identical),
  * and null/empty safety. */
class SecretsSpec extends SparkSpec {
  import spark.implicits._

  private val Key = "AKIAxQ7rT2mWp9ZbYv3e" // 20 chars, near-uniform

  test("tokenEntropy matches hand-computed values") {
    val df = Seq("aabb", "abcd", "aaaa", "", "ab")
      .toDF("t").select(Secrets.tokenEntropy(col("t")).as("h"))
    val hs = df.as[Double].collect().toSeq
    assert(hs(0) == 1.0)          // {a:.5, b:.5}
    assert(hs(1) == 2.0)          // 4 uniform chars
    assert(hs(2) == 0.0)          // single symbol
    assert(hs(3) == 0.0)          // empty token guard
    assert(hs(4) == 1.0)
  }

  test("detect flags a planted credential but not natural words") {
    val d = Seq(
      (1L, s"please use token $Key for the api"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val r = Secrets.detect(d, "text", "doc_id").orderBy("doc_id").collect()
    assert(r(0).getLong(1) >= 1L, "credential is a candidate")
    assert(r(0).getLong(2) == 1L, "exactly the credential is flagged")
    assert(r(0).getSeq[String](4) == Seq(Key))
    assert(r(0).getDouble(3) > 3.5)
    assert(r(1).getLong(2) == 0L, "no natural word flags")
    assert(r(2).getLong(1) == 0L && r(2).getLong(2) == 0L,
      "null text reports zeros")
    assert(r(2).getDouble(3) == 0.0)
  }

  test("integer guards prune before the entropy cut") {
    // long but low-distinct (repeats) -> not a candidate
    val d = Seq((1L, "abababababababababab secret")).toDF("doc_id", "text")
    val r = Secrets.detect(d, "text", "doc_id",
      minLen = 16, minDistinct = 10).collect()(0)
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
  }

  test("scrub masks flagged tokens and leaves the rest byte-identical") {
    val d = Seq((1L, s"alpha $Key beta"), (2L, "plain words only"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Secrets.scrub(d, "text").orderBy("doc_id")
      .select("text").as[String].collect().toSeq
    assert(out(0) == s"alpha ${Secrets.Mask} beta")
    assert(out(1) == "plain words only")
    assert(out(2) == null)
  }

  test("scrub passes unflagged docs through byte-identical, tabs/newlines included") {
    val weird = "col1\tcol2\nrow  with   runs of spaces"
    val d = Seq((1L, weird), (2L, s"pre\tfix $Key post")).toDF("doc_id", "text")
    val out = Secrets.scrub(d, "text").orderBy("doc_id")
      .select("text").as[String].collect().toSeq
    assert(out(0) == weird, "secret-free doc must not be rewritten at all")
    // flagged doc: only space-delimited tokens re-join; the tab stays
    // inside its token (literal-space contract, TextFunctions.tokens)
    assert(out(1) == s"pre\tfix ${Secrets.Mask} post")
  }

  test("detect tokenizes on the literal single space (oracle contract)") {
    // the credential is glued to a tab: under \s+ it would split out and
    // flag; under the literal-space contract the tab-joined token has
    // extra chars and different entropy — pin that it still flags as one
    // token and that a newline-embedded natural phrase yields no flags
    val d = Seq(
      (1L, s"alpha\nbeta gamma delta"),
      (2L, s"x $Key y"))
      .toDF("doc_id", "text")
    val r = Secrets.detect(d, "text", "doc_id", minLen = 6, minDistinct = 5)
      .orderBy("doc_id").collect()
    assert(r(0).getLong(2) == 0L, "natural words with newline: no flags")
    assert(r(1).getSeq[String](4) == Seq(Key))
  }

  test("scrub is idempotent: a second pass changes nothing") {
    val d = Seq((1L, s"alpha $Key beta"), (2L, "plain words"),
      (3L, "x AKIAzW4kN8vRq6XcJm2u AKIAxQ7rT2mWp9ZbYv3e y"))
      .toDF("doc_id", "text")
    val once = Secrets.scrub(d, "text")
    val twice = Secrets.scrub(once, "text")
    assert(once.orderBy("doc_id").select("text").as[String].collect().toSeq ==
      twice.orderBy("doc_id").select("text").as[String].collect().toSeq)
  }

  test("maxCandidates scores only the prefix, counts all, and accounts the cut") {
    // doc 1: secret at position 2 of 3 candidates — a cap of 2 still
    // scores it; doc 2: secret at position 3 — a cap of 2 cuts it, and
    // the truncation report says exactly what was left unscored
    val d = Seq(
      (1L, s"and candZ1x2w $Key candZ3y4v plain"),
      (2L, s"candZ1x2w candZ3y4v $Key"))
      .toDF("doc_id", "text")
    val capped = Secrets.detect(d, "text", "doc_id",
        minLen = 6, minDistinct = 5, maxCandidates = 2)
      .orderBy("doc_id").collect()
    assert(capped(0).getLong(1) == 3L && capped(0).getLong(2) == 1L, capped(0).toString)
    assert(capped(0).getSeq[String](4) == Seq(Key))
    assert(capped(1).getLong(1) == 3L && capped(1).getLong(2) == 0L,
      s"cap must cut the unscored tail: ${capped(1)}")
    val acct = Secrets.truncationReport(d, "text", "doc_id",
        minLen = 6, minDistinct = 5, maxCandidates = 2)
      .orderBy("doc_id").collect()
    assert(acct.length == 2 && acct.forall(_.getLong(2) == 1L), acct.mkString(","))
    // the default cap is inert: identical relation with and without it
    val unc = Secrets.detect(d, "text", "doc_id", minLen = 6, minDistinct = 5)
      .orderBy("doc_id").collect()
    val wide = Secrets.detect(d, "text", "doc_id", minLen = 6, minDistinct = 5,
      maxCandidates = 100).orderBy("doc_id").collect()
    assert(unc.map(_.toString).toSeq == wide.map(_.toString).toSeq)
    assert(Secrets.truncationReport(d, "text", "doc_id",
      minLen = 6, minDistinct = 5).isEmpty)
  }

  test("q_doc_secrets thresholds are discrete on the synthetic corpus") {
    // every candidate's entropy must sit clear of the 3.5 cut so the
    // float comparison can never disagree across engines
    val d = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val margin = Secrets.detect(d, "text", "doc_id",
        minLen = 6, minDistinct = 5, minEntropy = 3.5)
      .select(max(col("max_entropy"))).collect()(0).getDouble(0)
    assert(margin < 3.4, s"candidate entropy $margin too close to the 3.5 cut")
  }
}
