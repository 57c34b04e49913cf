package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavior edges of the doc-query surface that the SQL oracles can't
  * reach with the synthetic tables. */
class DocQueriesSpec extends SparkSpec {

  test("C18: a zero-token source gets cut 0, not an ANSI divide-by-zero") {
    import spark.implicits._
    val totals = Seq(("web", 9000L), ("empty", 0L), ("books", 1000L))
      .toDF("source", "src_tokens")
    // under ANSI mode the unguarded `div` would throw here
    val cuts = DocQueries.mixCuts(totals, totalBudget = 10000L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cuts("empty") == "0000") // samples nothing: no bucket < '0000'
    // the non-degenerate sources keep their integer-arithmetic cutoffs:
    // (10000 div 3) * 65536 div 9000 = 24270 = 0x5ece
    assert(cuts("web") == "5ece")
    assert(cuts("books") == "zzzz") // 3333*65536/1000 > 65536 → keep all
  }

  test("C24: freqItems sketch is superset-sound above support; verified top-k is exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def t(i: Int) = f"t$i%02d"
    // skewed term stream: t(i) occurs i times, 1275 tokens total
    val terms = (1 to 50).flatMap(i => Seq.fill(i)(t(i))).toDF("term")
    val cands = terms.stat.freqItems(Seq("term"), support = 0.01)
      .head.getSeq[String](0)
    // Misra–Gries soundness: every term with frequency > support·N
    // (13 > 12.75) must appear among the candidates
    (13 to 50).map(t).foreach(x => assert(cands.contains(x), x))
    // exact verify over candidates reproduces the brute-force top-20
    val top = terms.filter(col("term").isin(cands: _*))
      .groupBy("term").agg(count(lit(1)).as("occurrences"))
      .orderBy(col("occurrences").desc, col("term").asc)
      .limit(20).collect().map(_.getString(0)).toSeq
    assert(top == (50 to 31 by -1).map(t))
  }

  test("C24: flat-tail corpus degrades gracefully — support auto-quarters to exact top-20") {
    import spark.implicits._
    // Adversarial tail: 30 head terms at 8 occurrences each sit UNDER
    // the initial support bar (0.001 × 10000 = 10), so attempt #1's
    // exactness guard must trip; at support/4 the bar is 2.5 < 8 and
    // the verified top-20 is exact — no manual tuning.
    val head = (1 to 30).flatMap(i => Seq.fill(8)(f"head$i%02d"))
    val tail = (1 to 9760).map(i => s"tail$i")
    val toks = head ++ tail
    val docs = toks.grouped(100).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val top = DocQueries.heavyHitters(docs, "text", k = 20, support = 0.001)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.length == 20)
    assert(top.forall(_._2 == 8L))
    // ties rank (count desc, term asc): head01..head20 exactly
    assert(top.map(_._1).toSeq == (1 to 20).map(i => f"head$i%02d"))
  }

  test("C24: a headless corpus exhausts retries and raises, not silently truncates") {
    import spark.implicits._
    val docs = (1 to 100).map(i =>
      (i.toLong, (1 to 100).map(j => s"u${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      DocQueries.heavyHitters(docs, "text", k = 20, support = 0.001, maxRetries = 0)
    }
    assert(e.getMessage.contains("no frequency head"))
  }

  test("C30: leak-free split drops only train docs that near-dup a val doc") {
    import spark.implicits._
    import graft.operators.{Corpus, Dedup}
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (6L, base),                                  // val (md5 prefix < 2000)
      (1L, base),                                  // train exact dup of val -> drop
      (2L, base.replace("dog", "cat")),            // train near-dup of val -> drop
      (3L, "completely different content about engines at massive scale"),
      (19L, "another validation document with its own unique words here")
    ).toDF("doc_id", "text")
    val out = Corpus.splitLeakfree(docs, "doc_id",
      substring(md5(col("doc_id").cast("string")), 1, 4) < "2000",
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(6L -> "val", 19L -> "val", 3L -> "train"),
      s"expected val kept, leaky train dropped: $out")
  }

  test("C22: redactPii scrubs emails, IPs, phones and long digit runs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = Seq(
      "mail alice.smith+spam@corp.example.com now",
      "from 192.168.001.7 to 10.0.0.255",
      "call +14155550123 today",
      "acct 4000123412341234 ref 123456789",
      "clean text with no pii at all 12345678") // 8 digits: below threshold
      .toDF("text")
      .select(graft.functions.TextFunctions.redactPii(col("text")).as("r"))
      .collect().map(_.getString(0))
    assert(out(0) == "mail <EMAIL> now")
    assert(out(1) == "from <IP> to <IP>")
    assert(out(2) == "call <PHONE> today")
    assert(out(3) == "acct <ID> ref <ID>")
    assert(out(4) == "clean text with no pii at all 12345678")
  }

  test("C22: redaction order — an IP is one <IP>, not digit-run shrapnel") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // an email whose local part holds a 10-digit run, then an IP whose
    // octets would match \d{1,3} pieces: earlier patterns must win
    val out = Seq("id 1234567890@x.example and 255.255.255.255 end")
      .toDF("text")
      .select(graft.functions.TextFunctions.redactPii(col("text")).as("r"))
      .head().getString(0)
    assert(out == "id <EMAIL> and <IP> end")
  }

  test("C22: graft_redact_pii SQL function matches the DataFrame form") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val texts = Seq("a@b.example then 1.2.3.4 then +12345678 then 987654321",
      "nothing to redact here")
    texts.toDF("text").createOrReplaceTempView("redact_in")
    val viaSql = spark.sql("SELECT graft_redact_pii(text) AS r FROM redact_in")
      .collect().map(_.getString(0)).toSeq
    val viaDf = texts.toDF("text")
      .select(graft.functions.TextFunctions.redactPii(col("text")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(viaSql == viaDf)
    assert(viaSql.head == "<EMAIL> then <IP> then <PHONE> then <ID>")
  }

  test("C22: redactPii is idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val once = Seq("a@b.example 1.2.3.4 +12345678 987654321 tail")
      .toDF("text")
      .select(graft.functions.TextFunctions.redactPii(col("text")).as("r"))
    val twice = once
      .select(graft.functions.TextFunctions.redactPii(col("r")).as("r"))
    assert(once.head().getString(0) == twice.head().getString(0))
  }

  test("C52: gopher metrics — hand-computed edges the corpus never produces") {
    import spark.implicits._
    // 48 distinct tokens incl. 2 stopwords — fails ONLY the count floor
    val stop48 = ((1 to 46).map(i => f"tok$i%02d") ++ Seq("the", "a")).mkString(" ")
    val d = Seq(
      (1L, ""),                                    // empty text
      (2L, "word"),                                // single token
      (3L, Seq.fill(60)("spam").mkString(" ")),    // fully repeated
      (4L, ((1 to 58).map(i => f"tok$i%02d") ++ Seq("the", "a")).mkString(" ")),
      (5L, stop48))                                // 48 < 50 tokens
      .toDF("doc_id", "text")
    val m = DocQueries.gopherMetrics(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    // empty text: split('') = [''] → 1 zero-length token, nothing divides by 0
    assert(m(1L).getLong(1) == 1L && m(1L).getDouble(2) == 0.0)
    assert(m(1L).getInt(6) == 0)
    // single token: top_frac = 1, no bigrams → dup 0.0
    assert(m(2L).getDouble(3) == 1.0 && m(2L).getDouble(4) == 0.0)
    // fully repeated doc: top_frac 1.0, every bigram identical → dup = 1 - 1/59
    assert(m(3L).getDouble(3) == 1.0)
    assert(m(3L).getDouble(4) == BigDecimal(1.0 - 1.0 / 59)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(m(3L).getInt(6) == 0) // fails keep: top_frac and stop_hits
    // 60 distinct-ish tokens incl. 2 stopwords: passes every rule
    assert(m(4L).getLong(1) == 60L && m(4L).getLong(5) == 2L
      && m(4L).getInt(6) == 1)
    // 48 tokens: fails ONLY the word-count floor
    assert(m(5L).getLong(5) == 2L && m(5L).getInt(6) == 0)
  }

  test("C55: datasheet quantile ladder and dup rate are exact on a hand-set") {
    import spark.implicits._
    // one source, token counts 1..5 → p50 = 3, p25 = 2, p90 = 4.6 (R-7)
    val d = (1 to 5).map(i => ("s", "en", Seq.fill(i)("w").mkString(" ")))
      .toDF("source", "lang", "text")
      .union(Seq(("s", "en", "w")).toDF("source", "lang", "text")) // dup of i=1
    val r = DocQueries.datasheet(d).collect().head
    val byName = r.schema.fieldNames.zipWithIndex.toMap
    assert(r.getLong(byName("n_docs")) == 6L)
    assert(r.getLong(byName("n_distinct_texts")) == 5L)
    assert(r.getDouble(byName("p50_tokens")) == 2.5) // 1,1,2,3,4,5 → (2+3)/2
    assert(r.getDouble(byName("p90_tokens")) == 4.5) // R-7: 4 + 0.5·(5-4)
    assert(r.getDouble(byName("dup_rate")) ==
      BigDecimal(1.0 - 5.0 / 6).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("C79: overlap matrix orients docs with their sources in both join directions") {
    import spark.implicits._
    // near-identical docs across sources; pair ids land on BOTH sides
    // of the a<b orientation so a swapped-source bug would miscount
    val base = (1 to 40).map(i => f"tok$i%02d").mkString(" ")
    val d = Seq(
      (1L, "zeta", base), (2L, "alpha", base),  // alpha<zeta, id_a=1 is zeta
      (3L, "alpha", base + " x"), (4L, "zeta", base + " x")
    ).toDF("doc_id", "source", "text")
    val docsDf = d.select(col("doc_id"), col("text"), col("source"),
      length(col("text")).as("n_chars"), lit("en").as("lang"))
    // drive the same program the query runs, against this corpus
    val pairs = graft.operators.Dedup.simhashPairs(docsDf, "text", "doc_id", maxDist = 3)
    val src = docsDf.select(col("doc_id"), col("source"))
    val out = pairs
      .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")), "id_b")
      .select(
        when(col("sa") <= col("sb"), col("sa")).otherwise(col("sb")).as("source_a"),
        when(col("sa") <= col("sb"), col("sb")).otherwise(col("sa")).as("source_b"),
        when(col("sa") <= col("sb"), col("id_a")).otherwise(col("id_b")).as("doc_a"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("doc_a")).as("n_docs_a"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // all four docs are near-dups of each other → 4 cross pairs, 1+1 intra
    val cross = out(("alpha", "zeta"))
    assert(cross._1 == 4L, out.toString)
    // doc_a carries the alpha side: docs 2 and 3 → 2 distinct
    assert(cross._2 == 2L, out.toString)
    assert(out(("alpha", "alpha"))._1 == 1L && out(("zeta", "zeta"))._1 == 1L)
  }

  test("C72: funnel stages chain (in_i == kept_{i-1}) and dedup counts only post-filter survivors") {
    import spark.implicits._
    // passes every gopher rule: 60 distinct tokens incl. 2 stopwords
    val good = ((1 to 58).map(i => f"tok$i%02d") ++ Seq("the", "a")).mkString(" ")
    val d = Seq(
      (1L, "en", good),               // survives all stages (keeper)
      (2L, "en", good),               // exact dup of 1 → dropped at stage 4 only
      (3L, "fr", good),               // dropped at stage 1 (lang)
      (4L, "en", "short junk text"),  // dropped at quality (3 words → ~0.06)
      (5L, "en", good + " extraone")  // distinct → survives
    ).toDF("doc_id", "lang", "text")
    val rows = DocQueries.funnelReport(d)
      .collect().sortBy(_.getInt(0))
    val byStage = rows.map(r => r.getString(1) ->
      (r.getLong(2), r.getLong(3))).toMap
    assert(byStage("lang_en") == (5L, 4L), byStage)
    assert(byStage("quality") == (4L, 3L), byStage)   // drops the short doc
    assert(byStage("gopher")._2 == 3L, byStage)
    assert(byStage("exact_dedup") == (3L, 2L), byStage) // dup of keeper dropped
    // the chain invariant: docs_in of stage i == docs_kept of stage i-1
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == a.getLong(3), s"chain broken at ${b.getString(1)}")
    }
    // tokens_kept ≤ tokens_in on every stage, pct in (0,1]
    rows.foreach { r =>
      assert(r.getLong(5) <= r.getLong(4))
      assert(r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0)
    }
  }

  test("C80: PMI collocations — hand-computed values, support threshold, phrase ranking") {
    import spark.implicits._
    // 11 tokens, 9 bigrams. "new york" repeats (a phrase), "the cat"
    // repeats but 'the' is frequent so its PMI is lower, every other
    // bigram is a hapax and must fall under minCount = 2.
    val d = Seq(
      (1L, "new york new york city"),
      (2L, "the cat the dog the cat")
    ).toDF("doc_id", "text")
    val out = DocQueries.collocations(d, minCount = 2L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out.keySet == Set("new york", "the cat"), out.keySet)
    def pmi4(c12: Long, c1: Long, c2: Long): Double = {
      val v = math.log((c12 / 9.0) / ((c1 / 11.0) * (c2 / 11.0)))
      // mirrors round4: round(x·10⁴)/10⁴ with Spark's HALF_UP
      BigDecimal(v * 10000d)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 10000d
    }
    assert(out("new york") == ((2L, 2L, 2L, pmi4(2, 2, 2))), out("new york"))
    assert(out("the cat") == ((2L, 3L, 2L, pmi4(2, 3, 2))), out("the cat"))
    // the phrase outranks the stopword-led pair: p(new)·p(york) is the
    // smaller denominator
    assert(out("new york")._4 > out("the cat")._4)
  }

  test("C81: centroid outliers — hand-computed cosines, away-pointing flagged, zero-vector guard") {
    import spark.implicits._
    // label 0 centroid-sum = (1,1); label 1 = (1,0) (the zero vector
    // contributes nothing)
    val e = Seq(
      (1L, Array(1f, 0f), 0),
      (2L, Array(1f, 1f), 0),
      (3L, Array(-1f, 0f), 0),
      (4L, Array(0f, 0f), 1),
      (5L, Array(1f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = DocQueries.centroidOutliers(e)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(out(1L) == ((0.7071, false)), out(1L)) // 1/√2
    assert(out(2L) == ((1.0, false)), out(2L))    // along the centroid
    assert(out(3L) == ((-0.7071, true)), out(3L)) // points away → outlier
    assert(out(4L) == ((0.0, false)), out(4L))    // zero vector: guarded
    assert(out(5L) == ((1.0, false)), out(5L))
  }

  test("C98: OOV coverage matches an independent recomputation; rates bounded; totals conserve") {
    val sf = "/root/testdata/sf0.001"
    // independent JVM recomputation of vocab + coverage
    val toks = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("lang"), col("source"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val vocab = toks.groupBy(_._3).view.mapValues(_.length).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(1000).map(_._1).toSet
    val want = toks.groupBy(t => (t._1, t._2)).map { case (k, xs) =>
      k -> ((xs.length.toLong, xs.count(x => vocab(x._3)).toLong))
    }
    val got = DocQueries.qDocOov(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (tot, inv)) =>
      val (gTot, gInv, rate) = got(k)
      assert(gTot == tot && gInv == inv, s"$k: ($gTot,$gInv) vs ($tot,$inv)")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(rate == math.round((1.0 - inv.toDouble / tot) * 10000d) / 10000d)
    }
    // conservation: group totals sum to the corpus token count
    assert(got.values.map(_._1).sum == toks.length.toLong)
  }

  test("C99: diversity is 1 effective source on a monoculture, n on a perfectly even mix") {
    import spark.implicits._
    // build via the same shape the query uses, on planted relations
    val mono = Seq.fill(10)(("en", "only")).toDF("lang", "source")
      .withColumn("doc_id", lit(1L)).withColumn("text", lit("x"))
      .withColumn("n_chars", lit(1L))
    // qDocDiversity reads docs(dir) — recompute its aggregation inline
    def diversity(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sources"), sum(col("n")).as("n_docs"),
        sum(col("n") * col("n")).as("sum_sq"))
      .select(col("lang"),
        round((col("n_docs") * col("n_docs")).cast("double") /
          col("sum_sq").cast("double") * 10000d) / 10000d)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(diversity(mono)("en") == 1.0)
    val even = (1 to 4).flatMap(i => Seq.fill(5)(("de", s"s$i")))
      .toDF("lang", "source")
    assert(diversity(even)("de") == 4.0, "4 equal sources = 4 effective")
    // and the registered query agrees with its own SQL-shaped recompute
    val q = DocQueries.qDocDiversity(spark, "/root/testdata/sf0.001")
      .collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      assert(r.getDouble(4) >= 1.0 - 1e-9 &&
        r.getDouble(4) <= r.getLong(1).toDouble + 1e-9,
        s"effective sources must lie in [1, n_sources]: $r")
    }
  }

  test("C48/C53b: trained-rule stash wiring is live — encode keys join oracleSql after running, and a wrong-dir pin drops them") {
    // deterministic membership check for the conditionally-oracled
    // keys (the ContractSpec set exempts them from drift detection in
    // both directions, so a broken stash would otherwise degrade the
    // driver gate silently): run the encoders, then the keys MUST be
    // in oracleSql — and a dump pinned to a DIFFERENT corpus dir must
    // drop them rather than emit a wrong-corpus mirror.
    val sf = "/root/testdata/sf0.001"
    try {
      DocQueries.pinOracleDir(sf)
      assert(DocQueries.qDocBpeEncode(spark, sf).count() > 0)
      assert(DocQueries.qDocUnigramEncode(spark, sf).count() > 0)
      assert(DocQueries.qEmbPca(spark, sf).count() > 0)
      assert(graft.SparkEntry.oracleSql.contains("q_doc_bpe_encode"),
        "bpe-encode stash did not surface its generated mirror")
      assert(graft.SparkEntry.oracleSql.contains("q_doc_unigram_encode"),
        "unigram-encode stash did not surface its generated mirror")
      assert(graft.SparkEntry.oracleSql.contains("q_emb_pca"),
        "pca-basis stash did not surface its generated mirror")
      DocQueries.pinOracleDir("/not/the/trained/dir")
      assert(!graft.SparkEntry.oracleSql.contains("q_doc_bpe_encode"),
        "stale bpe mirror leaked past a mismatched dir pin")
      assert(!graft.SparkEntry.oracleSql.contains("q_doc_unigram_encode"),
        "stale unigram mirror leaked past a mismatched dir pin")
      assert(!graft.SparkEntry.oracleSql.contains("q_emb_pca"),
        "stale pca mirror leaked past a mismatched dir pin")
    } finally DocQueries.pinOracleDir(null)
  }
}
