package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions

/** Specs for the non-SQL-expressible dedup/similarity operators
  * (C2/C3/C6) and the scale property that none of them ever plans an
  * all-pairs (cartesian) join. */
class OperatorsSpec extends SparkSpec {

  import spark.implicits._

  def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again"), // near dup of 1
    (4L, "completely different content about spark query engines at scale")
  ).toDF("doc_id", "text")

  test("C1: exact dedup keeps one survivor per distinct text") {
    val out = Dedup.exactDedup(docs, "text", "doc_id")
    assert(out.count() == 3)
    val dup = out.filter(col("n_copies") === 2).head()
    assert(dup.getAs[Long]("doc_id") == 1L) // min id survives
  }

  test("C2: minhash-LSH finds exact and near dups, no cartesian product") {
    val pairs = Dedup.minhashCandidatePairs(docs, "text", "doc_id",
      numHashes = 32, bands = 8, ngram = 3)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), s"exact dup pair missing from $got")
    assert(got.contains((1L, 3L)) || got.contains((2L, 3L)),
      s"near dup pair missing from $got")
    assert(!got.exists { case (a, b) => Set(a, b).contains(4L) },
      s"unrelated doc paired in $got")
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "LSH must not go all-pairs")
  }

  test("C3: simhash — identical docs identical, near dups close, different far") {
    val sh = Dedup.simhash(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(dist(sh(1L), sh(3L)) < dist(sh(1L), sh(4L)),
      s"near-dup hamming ${dist(sh(1L), sh(3L))} should beat ${dist(sh(1L), sh(4L))}")
  }

  test("C3: lane-packed simhash equals the per-bit ±1 vote reference (r20)") {
    // reference: recompute every doc's 64 vote sums token-by-token on
    // the driver with the same md5-derived bits, pack, compare
    val expected = docs.collect().map { r =>
      val id = r.getLong(0)
      val toks = r.getString(1).split(" ", -1).filter(_.nonEmpty).distinct
      val votes = Array.fill(64)(0L)
      toks.foreach { t =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        val hi = java.lang.Long.parseLong(hex.substring(0, 8), 16)
        val lo = java.lang.Long.parseLong(hex.substring(8, 16), 16)
        (0 until 64).foreach { k =>
          val h = if (k < 32) lo else hi
          votes(k) += (if (((h >> (k % 32)) & 1L) == 1L) 1L else -1L)
        }
      }
      var packed = 0L
      (0 until 63).foreach(k => if (votes(k) > 0) packed |= (1L << k))
      if (votes(63) > 0) packed |= Long.MinValue
      id -> packed
    }.toMap
    val got = Dedup.simhash(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"lane-packed simhash diverged: $got vs $expected")
  }

  test("C3: simhash raises loudly past 524287 distinct tokens per doc (lane guard)") {
    // 525k distinct tokens: above the lane guard, while each bit's
    // ones-count (~n/2) stays below the 2^19 top-lane ANSI ceiling, so
    // the assert_true fires deterministically (beyond ~1M, ANSI's own
    // in-flight sum overflow would raise first — loud either way)
    val big = Seq((1L, (0 until 525000).map("t" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val e = intercept[Throwable] {
      Dedup.simhash(big, "text", "doc_id").collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + messages(t.getCause)
    assert(messages(e).contains("simhash lane overflow"),
      s"expected the loud lane guard, got: ${messages(e).take(300)}")
  }

  test("C47: map-side winnow fingerprints equal the windowed-min reference (r20)") {
    import org.apache.spark.sql.expressions.Window
    val k = 4; val w = 8
    val corpus = docs
    val grams = corpus
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("toks")) - k),
          i => substring(md5(concat_ws(" ",
            slice(col("toks"), i + lit(1), lit(k)))), 1, 16)))
        .as(Seq("pos", "h")))
    val win = Window.partitionBy("doc_id").orderBy(col("pos")).rowsBetween(0, w - 1)
    val ref = grams.select(col("doc_id"), min(col("h")).over(win).as("fp"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = Dedup.winnowFingerprints(corpus, "text", "doc_id", k, w)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == ref, s"map-side winnowing diverged from the windowed min")
  }

  test("C4: ngram jaccard exact pair scores 1.0") {
    val out = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 1.0)
  }

  test("C6: LSH ANN buckets cosine pairs without cartesian join") {
    val vecs = (0L until 40L).map { i =>
      val base = Array.tabulate(8)(d => math.sin(i + d).toFloat)
      (i, base)
    }.toDF("vec_id", "embedding")
    val pairs = Similarity.lshCosinePairs(spark, vecs, "vec_id", "embedding",
      bits = 2, tables = 4, dim = 8, threshold = 0.9)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "LSH ANN must not go all-pairs")
    assert(pairs.count() > 0)
  }

  test("C5: brute-force top-k broadcasts the query side") {
    val vecs = (0L until 20L).map(i => (i, Array.tabulate(8)(d => (i + d).toFloat)))
      .toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 5)
    assert(topk.count() == 5)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query vector should broadcast:\n$plan")
  }

  test("C6b: IVF with full probe equals brute force; partial probe recalls most") {
    val vecs = (0L until 60L).map(i => (i, Array.tabulate(8)(d => math.sin(i * 3 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // probing every cell makes IVF exhaustive → identical to brute force
    val full = Ivf.topK(spark, vecs, "vec_id", "embedding", 0L, 10,
        numCentroids = 4, nprobe = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == exact)
    // partial probe returns a subset of true neighbors, in order
    val partial = Ivf.topK(spark, vecs, "vec_id", "embedding", 0L, 10,
        numCentroids = 4, nprobe = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(partial.nonEmpty)
    assert(partial.subsetOf(
      Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 60)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet))
  }

  test("C10: rolling hash is order-sensitive, fingerprint is not") {
    val d = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val rh = d.select(TextFunctions.rollingHash(col("text"))).collect().map(_.getLong(0))
    assert(rh(0) != rh(1))
    val same = Seq((1L, "alpha beta"), (2L, "alpha beta")).toDF("doc_id", "text")
      .select(TextFunctions.rollingHash(col("text"))).collect().map(_.getLong(0))
    assert(same(0) == same(1))
  }

  test("C3b: simhash pairs find exact+near dups within hamming 3, not the far doc") {
    // SimHash's near-dup radius needs enough tokens for one swap to
    // flip only margin-zero bits (flip count ~ 64/sqrt(n)): at 200
    // distinct tokens a single-token change lands at hamming 2 under
    // the md5 bit family, while a disjoint-token doc sits ~32
    val base = (0 until 200).map(i => s"w$i").mkString(" ")
    val near = ("zzz" +: (1 until 200).map(i => s"w$i")).mkString(" ")
    val far = (0 until 200).map(i => s"x$i").mkString(" ")
    val d = Seq((1L, base), (2L, base), (3L, near), (4L, far))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(d, "text", "doc_id", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair.get((1L, 2L)).contains(0), pairs.mkString(",")) // exact dup
    assert(byPair.contains((1L, 3L)) && byPair.contains((2L, 3L)),
      s"near dup not found: ${pairs.mkString(",")}") // one-word change
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated doc matched: ${pairs.mkString(",")}")
    val plan = Dedup.simhashPairs(d, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("C2d: maxBucket cap is accounted, not silent") {
    // 8 identical docs → every band hashes them into one 8-id bucket
    val mega = (1L to 8L).map(i => (i, "same text repeated over and over for the bucket"))
      .toDF("doc_id", "text")
    val dropped = Dedup.minhashDroppedBuckets(mega, "text", "doc_id",
      numHashes = 32, bands = 8, maxBucket = 4)
    val sizes = dropped.select("bucket_size").collect().map(_.getInt(0))
    assert(sizes.length == 8 && sizes.forall(_ == 8), // one dropped bucket per band
      s"expected 8 dropped buckets of size 8, got ${sizes.mkString(",")}")
    // and the capped pair expansion emits nothing for that cluster
    assert(Dedup.minhashCandidatePairs(mega, "text", "doc_id",
      numHashes = 32, bands = 8, maxBucket = 4).count() == 0)
    // uncapped: accounting empty, pairs present
    assert(Dedup.minhashDroppedBuckets(mega, "text", "doc_id").count() == 0)
    // same contract on the simhash side (4 pigeonhole bands at maxDist=3)
    val simDropped = Dedup.simhashDroppedBuckets(mega, "text", "doc_id",
      maxDist = 3, maxBucket = 4)
    val simSizes = simDropped.select("bucket_size").collect().map(_.getInt(0))
    assert(simSizes.length == 4 && simSizes.forall(_ == 8), simSizes.mkString(","))
    assert(Dedup.simhashPairs(mega, "text", "doc_id", maxBucket = 4).count() == 0)
  }

  test("C2e: incremental candidates cover delta pairs, never corpus-corpus") {
    // corpus: docs 1,2 (exact dups of each other); delta: 3 (near dup
    // of 1/2) and 4 (unrelated). The batch path finds (1,2),(1,3),(2,3);
    // the incremental path must find the delta pairs but NOT (1,2).
    val corpus = docs.filter(col("doc_id") <= 2)
    val delta = docs.filter(col("doc_id") >= 3)
    val idx = Dedup.minhashBandBuckets(corpus, "text", "doc_id")
    val inc = Dedup.incrementalMinhashPairs(idx, delta, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!inc.contains((1L, 2L)), s"corpus-corpus pair re-derived: $inc")
    assert(inc.contains((1L, 3L)) || inc.contains((2L, 3L)),
      s"delta-corpus near-dup missed: $inc")
    assert(!inc.exists { case (a, b) => a == 4L || b == 4L },
      s"unrelated delta doc paired: $inc")
    // batch equivalence: incremental ∪ known-corpus-pairs ⊇ batch pairs
    val batch = Dedup.minhashCandidatePairs(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val corpusPairs = Dedup.minhashCandidatePairs(corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.subsetOf(inc ++ corpusPairs), s"batch=$batch inc=$inc corpus=$corpusPairs")
  }

  test("C2e: a re-run delta overlapping the index emits no degenerate self-pairs") {
    // doc 1 is in the corpus index AND re-arrives in the delta (retry
    // after partial failure): the (1,1) pair would downstream delete
    // the doc as its own near-duplicate
    val corpus = docs.filter(col("doc_id") <= 2)
    val idx = Dedup.minhashBandBuckets(corpus, "text", "doc_id")
    val rerun = Dedup.incrementalMinhashPairs(idx,
        docs.filter(col("doc_id") <= 2), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rerun.forall { case (a, b) => a != b }, s"self-pair emitted: ${rerun.toSeq}")
  }

  test("C3c: incremental simhash equals batch pairs minus the known corpus pairs") {
    val corpus = docs.filter(col("doc_id") <= 2)
    val delta = docs.filter(col("doc_id") >= 3)
    val idx = Dedup.hammingBandBuckets(
      Dedup.simhash(corpus, "text", "doc_id"), "doc_id", "simhash",
      maxDist = 7)
    val inc = Dedup.incrementalSimhashPairs(idx, delta, "text", "doc_id",
        maxDist = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val batch = Dedup.simhashPairs(docs, "text", "doc_id", maxDist = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val corpusPairs = Dedup.simhashPairs(corpus, "text", "doc_id", maxDist = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // no caps engage at this size, so the split is exact
    assert(inc == batch -- corpusPairs, s"inc=$inc batch=$batch corpus=$corpusPairs")
    assert(!inc.exists { case (a, b, _) => (a, b) == ((1L, 2L)) },
      "corpus-corpus pair re-derived")
  }

  test("C3c: a re-run delta overlapping the index emits no degenerate self-pairs") {
    val corpus = docs.filter(col("doc_id") <= 2)
    val idx = Dedup.hammingBandBuckets(
      Dedup.simhash(corpus, "text", "doc_id"), "doc_id", "simhash")
    val rerun = Dedup.incrementalSimhashPairs(idx, corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rerun.forall { case (a, b) => a != b }, s"self-pair: ${rerun.toSeq}")
    // the exact-dup cross pair is still reported exactly once
    assert(rerun.toSeq.count(_ == ((1L, 2L))) == 1, rerun.toSeq.toString)
  }

  test("C83: delta admission issues one planted verdict per screen") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content about spark query engines at scale")
    ).toDF("doc_id", "text")
    val delta = Seq(
      // exact copy of corpus doc 1 → exact_dup
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      // one appended token: Jaccard 10/11 ≈ 0.91 → near_dup
      (11L, "the quick brown fox jumps over the lazy dog again and again indeed"),
      // same DISTINCT token set as doc 1, shuffled: simhash hamming 0,
      // but almost no shared 3-grams → signature_dup, not near_dup
      (12L, "dog the lazy quick brown fox again jumps over and"),
      // unrelated → new
      (13L, "fresh unrelated material covering streaming watermark semantics"),
      // exact copy of delta doc 13 (larger id) → intra-delta exact_dup
      (14L, "fresh unrelated material covering streaming watermark semantics")
    ).toDF("doc_id", "text")
    val got = Dedup.deltaAdmission(
        corpusExactIdx = corpus.select(md5(col("text")).as("h")),
        corpusMinhashIdx = Dedup.minhashBandBuckets(corpus, "text", "doc_id"),
        corpusSimhashIdx = Dedup.hammingBandBuckets(
          Dedup.simhash(corpus, "text", "doc_id"), "doc_id", "simhash"),
        corpusTexts = corpus, delta = delta,
        textCol = "text", idCol = "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(10L -> "exact_dup", 11L -> "near_dup",
      12L -> "signature_dup", 13L -> "new", 14L -> "exact_dup"), got.toString)
  }

  test("C83: day-0 bootstrap — an empty corpus admits the first drop minus its own dups") {
    val corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val delta = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (11L, "the quick brown fox jumps over the lazy dog again and again"),
      (12L, "completely different content about spark query engines at scale")
    ).toDF("doc_id", "text")
    val got = Dedup.deltaAdmission(
        corpusExactIdx = corpus.select(md5(col("text")).as("h")),
        corpusMinhashIdx = Dedup.minhashBandBuckets(corpus, "text", "doc_id"),
        corpusSimhashIdx = Dedup.hammingBandBuckets(
          Dedup.simhash(corpus, "text", "doc_id"), "doc_id", "simhash"),
        corpusTexts = corpus, delta = delta,
        textCol = "text", idCol = "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(10L -> "new", 11L -> "exact_dup", 12L -> "new"),
      got.toString)
  }

  test("C4e: verify scores short-doc candidate pairs as 0.0 instead of dropping them") {
    // doc 2 has fewer than n=3 tokens → zero shingles; SimHash (token
    // based) can still propose the pair, and verify must ANSWER it
    val shorty = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta"))
      .toDF("doc_id", "text")
    val pair = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = Dedup.exactJaccardForPairs(shorty, "text", "doc_id", pair).collect()
    assert(out.length == 1, "candidate pair vanished from the verify output")
    assert(out.head.getDouble(2) == 0.0, out.head.toString)
    // capped path answers too
    val capped = Dedup.exactJaccardForPairs(shorty, "text", "doc_id", pair,
      maxGrams = 10).collect()
    assert(capped.length == 1 && capped.head.getDouble(2) == 0.0)
  }

  test("C8: quality is case-insensitive and 0.0 (not null) on empty docs") {
    import graft.functions.TextFunctions
    val qs = Seq((1L, "HELLO WORLD"), (2L, ""), (3L, "hello world"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(qs(2L) == 0.0, s"empty doc must score 0.0, got ${qs(2L)}")
    // uppercase letters count as alphabetic: same text, same score
    assert(qs(1L) == qs(3L), s"case must not change quality: $qs")
  }

  test("C6: ANN guards — unknown IVF query id is empty, LSH dim mismatch fails fast") {
    val vecs = (0L until 60L)
      .map(i => (i, Array.tabulate(8)(d => math.sin(i * 3 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val index = Ivf.fit(vecs, "vec_id", "embedding", numCentroids = 4, iters = 2)
    assert(index.topK(queryId = 999999L, k = 5, nprobe = 2).isEmpty,
      "unknown query id must return empty, not crash")
    // wrong dim: every dot would go null and all vectors would share
    // bucket 0 — an all-pairs blow-up. Must fail loudly instead.
    val e = intercept[Exception] {
      Similarity.lshCosinePairs(spark, vecs, "vec_id", "embedding",
        dim = 4).count()
    }
    assert(e.getMessage != null && e.getMessage.toLowerCase.contains("dim"),
      e.toString)
  }

  test("C33: hard negatives exclude near-dups and the query itself; candidate path agrees") {
    // query 0 = (1,0); 1 = scaled copy (cosine 1.0, a near-dup);
    // 2-4 = mid-similarity background; 5 = orthogonal
    val e = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(5.0f, 0.0f)),       // exact-direction dup: excluded
      (2L, Seq(0.9f, 0.5f)),
      (3L, Seq(0.7f, 0.7f)),
      (4L, Seq(0.3f, 0.9f)),
      (5L, Seq(0.0f, 1.0f))        // orthogonal: rank last
    ).toDF("vec_id", "embedding")
    val out = Similarity.hardNegatives(e, "vec_id", "embedding",
        e.filter(col("vec_id") === 0L), k = 3, dupThreshold = 0.95)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toList.sortBy(_._2)
    // dup (1) and self (0) never appear; top-3 by cosine are 2, 3, 4
    assert(out == List((2L, 1L), (3L, 2L), (4L, 3L)), out.toString)
    // ANN-candidate path scores only the supplied pairs but ranks the
    // same when the candidate set covers the brute-force survivors
    val cands = Seq((0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L), (0L, 1L))
      .toDF("query_id", "cand_id")
    val viaCands = Similarity.hardNegatives(e, "vec_id", "embedding",
        e.filter(col("vec_id") === 0L), k = 3, dupThreshold = 0.95,
        candidates = Some(cands))
      .collect().map(r => (r.getLong(1), r.getLong(3))).toList.sortBy(_._2)
    assert(viaCands == out, viaCands.toString)
  }

  test("C32: span duplication counts shared windows once, keeps short docs") {
    val corpus = Seq(
      (1L, "one two three four five six"),        // 3 spans, shares 1 with doc 2
      (2L, "zzz one two three four qqq"),         // 3 spans, shares 1 with doc 1
      (3L, "alpha beta gamma delta epsilon"),     // 2 spans, none shared
      (4L, "tiny doc"),                           // < span tokens: 0 spans
      (5L, "rep rep rep rep rep rep rep")         // one DISTINCT span looping 4x
    ).toDF("doc_id", "text")
    val out = Dedup.spanDuplication(corpus, "text", "doc_id", span = 4)
    val rows = out.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows(1L) == ((3L, 1L, 0.3333)), rows(1L).toString)
    assert(rows(2L) == ((3L, 1L, 0.3333)), rows(2L).toString)
    assert(rows(3L) == ((2L, 0L, 0.0)), rows(3L).toString)
    // short doc is REPORTED with zero spans, never dropped
    assert(rows(4L) == ((0L, 0L, 0.0)), rows(4L).toString)
    // a span repeating inside ONE doc is not "shared": df counts docs
    assert(rows(5L) == ((1L, 0L, 0.0)), rows(5L).toString)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("C49: span scrub removes repeated tiles, keeps the first occurrence, reconstructs docs") {
    val corpus = Seq(
      (1L, "hdr one hdr two body a body b"),   // tiles(2): [hdr one][hdr two][body a][body b]
      (2L, "hdr one hdr two other x other y"), // repeats doc1's first two tiles
      (3L, "body a fresh z tail"),             // repeats [body a]; ragged tail [tail]
      (4L, ""),                                // empty doc survives
      (5L, "hdr one")                          // repeats [hdr one] a third time
    ).toDF("doc_id", "text")
    val out = Dedup.spanScrub(corpus, "text", "doc_id", span = 2)
    val rows = out.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1 is the global first occurrence of every one of its tiles
    assert(rows(1L) == (("hdr one hdr two body a body b", 4L, 0L)), rows(1L).toString)
    // doc 2 loses the two tiles doc 1 already owns
    assert(rows(2L) == (("other x other y", 4L, 2L)), rows(2L).toString)
    // doc 3 loses [body a]; the ragged tail [tail] is never eligible
    assert(rows(3L) == (("fresh z tail", 3L, 1L)), rows(3L).toString)
    // empty doc: one short tile, kept, clean_text stays empty
    assert(rows(4L) == (("", 1L, 0L)), rows(4L).toString)
    // third occurrence of [hdr one] also dropped — keeper is global-min
    assert(rows(5L) == (("", 1L, 1L)), rows(5L).toString)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("C49: intra-doc repeats keep only the earliest tile; idempotent on scrubbed text") {
    val corpus = Seq(
      (7L, "dup a dup a dup a uniq b"),
      (8L, "x y")
    ).toDF("doc_id", "text")
    val out = Dedup.spanScrub(corpus, "text", "doc_id", span = 2)
    val m = out.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(m(7L) == (("dup a uniq b", 2L)), m(7L).toString)
    assert(m(8L) == (("x y", 0L)), m(8L).toString)
    // scrubbing the scrubbed corpus changes nothing
    val again = Dedup.spanScrub(
      out.select(col("doc_id"), col("clean_text").as("text")),
      "text", "doc_id", span = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again.values.forall(_ == 0L), again.toString)
  }

  test("C19: contamination screening flags exactly the overlapping docs") {
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon tail words here"), // contains the bench 5-gram
      (11L, "totally unrelated text with no shared sequences at all"),
      (12L, "prefix alpha beta gamma delta epsilon and alpha beta gamma delta epsilon again")
    ).toDF("doc_id", "text")
    val bench = Seq((0L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val hits = Dedup.contaminationHits(corpus, "text", "doc_id",
        Dedup.shingles(bench, "text", "doc_id", n = 5), n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 12 repeats the gram but distinct shingling counts it once
    assert(hits == Map(10L -> 1L, 12L -> 1L), hits.toString)
    // the broadcast probe never plans an all-pairs join
    val plan = Dedup.contaminationHits(corpus, "text", "doc_id",
      Dedup.shingles(bench, "text", "doc_id", n = 5), n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("C19b: bloom screen is a superset of the exact screen with bounded over-flagging") {
    // 200 docs sharing a template vocabulary; docs 0-9 are the "bench"
    val corpus = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(j =>
        concat(lit("w"), pmod(col("id") * 31 + j * 7, lit(500)))): _*).as("text"))
    val bench = Dedup.shingles(corpus.filter(col("doc_id") < 10),
      "text", "doc_id", n = 5).select(col("gram"))
    val rest = corpus.filter(col("doc_id") >= 10)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = toMap(Dedup.contaminationHits(rest, "text", "doc_id", bench, n = 5))
    val bloom = toMap(Dedup.contaminationHitsBloom(rest, "text", "doc_id", bench,
      n = 5, expectedGrams = 1000L, fpp = 0.01))
    // no false negatives: every exact hit is flagged with >= its count
    exact.foreach { case (id, hits) =>
      assert(bloom.getOrElse(id, 0L) >= hits, s"doc $id: bloom ${bloom.get(id)} < exact $hits")
    }
    // bounded one-sided error: spurious flags stay near fpp of the corpus
    val spurious = bloom.keySet.diff(exact.keySet).size
    assert(spurious <= 10, s"$spurious docs spuriously flagged of ${190 - exact.size} clean")
    // still a broadcast probe, never an all-pairs join
    val plan = Dedup.contaminationHitsBloom(rest, "text", "doc_id", bench, n = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("C4c: maxDocFreq hot-gram cap is accounted, not silent") {
    // "the quick brown" (and the rest of the shared prefix) appears in
    // docs 1-3; a df cap of 2 drops those grams from the posting join
    val dropped = Dedup.ngramDroppedGrams(docs, "text", "doc_id", maxDocFreq = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dropped.nonEmpty && dropped.values.forall(_ == 3), dropped.toString)
    assert(dropped.contains("the quick brown"), dropped.keys.mkString("|"))
    // the capped run loses exactly those grams' contribution: the
    // 1-2 exact-dup pair now intersects only on grams with df <= 2
    val capped = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      threshold = 0.0, maxDocFreq = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val uncapped = Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(capped.getOrElse((1L, 2L), 0.0) < uncapped((1L, 2L)),
      s"capped=$capped uncapped=$uncapped")
    // default cap is far above any test corpus: accounting is empty
    assert(Dedup.ngramDroppedGrams(docs, "text", "doc_id").count() == 0)
  }

  test("C4b: exact Jaccard for given pairs matches the corpus-wide join") {
    val cands = Dedup.minhashCandidatePairs(docs, "text", "doc_id")
    val verified = Dedup.exactJaccardForPairs(docs, "text", "doc_id", cands)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val full = Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    verified.foreach { case (pair, j) =>
      assert(full.get(pair).contains(j), s"$pair: pair-local $j vs full ${full.get(pair)}")
    }
    assert(verified((1L, 2L)) == 1.0)
  }

  test("C4d: pair verify is bounded-width on a 100k-gram doc and the KMV cap estimates") {
    // two book-length docs, ~100k distinct word 3-grams each, sharing
    // half their token range → exact 3-gram Jaccard 49998/149998
    def text(from: Int, until: Int) =
      (from until until).map(i => s"t$i").mkString(" ")
    val big = Seq(
      (1L, text(0, 100000)),
      (2L, text(50000, 150000))
    ).toDF("doc_id", "text")
    val pair = Seq((1L, 2L)).toDF("id_a", "id_b")

    // row width is 8 B per gram by construction: the gram set meets the
    // pair join as array<bigint> (hashed), never the raw gram strings
    // (~10 B/gram of text would make this a multi-MB row)
    val sets = Dedup.hashedGramSets(big, "text", "doc_id")
    assert(sets.schema("grams").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false))
    val nGrams = sets.select(size(col("grams"))).collect().map(_.getInt(0))
    assert(nGrams.forall(_ == 99998), s"distinct gram counts ${nGrams.toSeq}")

    val exact = Dedup.exactJaccardForPairs(big, "text", "doc_id", pair)
    val j = exact.head().getDouble(2)
    assert(j == math.rint(49998.0 / 149998 * 10000) / 10000, s"exact hashed jaccard $j")

    // the KMV cap bounds what meets the join — 8 B × 2000 = 16 KB rows
    // even for this book-length doc — at bounded estimation error
    val cappedWidths = Dedup.hashedGramSets(big, "text", "doc_id",
      maxGrams = 2000).select(size(col("grams"))).collect().map(_.getInt(0))
    assert(cappedWidths.forall(_ <= 2000), s"capped widths ${cappedWidths.toSeq}")
    val est = Dedup.exactJaccardForPairs(big, "text", "doc_id", pair,
      maxGrams = 2000).head().getDouble(2)
    // bottom-k sketch error ~1/sqrt(k) ≈ 0.022 at k=2000
    assert(math.abs(est - j) < 0.06, s"KMV estimate $est vs exact $j")

    // asymmetric containment — the case a naive |A_k∩B_k|/|A_k∪B_k|
    // quotient underestimates ~2× (B-only hashes far beyond A's sketch
    // horizon inflate the denominator): the union-bottom-k estimator
    // must stay inside the same ~1/sqrt(k) band
    val contained = Seq(
      (1L, text(0, 10000)),   // ~10k grams, all inside doc 2
      (2L, text(0, 100000))   // ~100k grams
    ).toDF("doc_id", "text")
    val jc = Dedup.exactJaccardForPairs(contained, "text", "doc_id", pair)
      .head().getDouble(2)
    assert(math.abs(jc - 0.1) < 0.001, s"containment exact $jc")
    val jcEst = Dedup.exactJaccardForPairs(contained, "text", "doc_id", pair,
      maxGrams = 2000).head().getDouble(2)
    assert(math.abs(jcEst - jc) < 0.03,
      s"KMV containment estimate $jcEst vs exact $jc (naive quotient gives ~${jc / 2})")
  }

  test("C12b: curateFull with minhash-candidates-then-verify equals the exact path") {
    val exact = Corpus.curateFull(docs, "text", "doc_id",
      minQuality = 0.0, jaccardThreshold = 0.5)
    // the 100 TB composition: LSH proposes, exact Jaccard confirms on
    // candidates only — wired through the pluggable pair source
    val viaCandidates = Corpus.curateFull(docs, "text", "doc_id",
      minQuality = 0.0,
      pairs = { deduped =>
        val cands = Dedup.minhashCandidatePairs(deduped, "text", "doc_id")
        Dedup.exactJaccardForPairs(deduped, "text", "doc_id", cands)
          .filter(col("jaccard") >= 0.5)
          .select(col("id_a").as("doc1"), col("id_b").as("doc2"))
      })
    assert(viaCandidates.collect().map(_.getLong(0)).sorted.toSeq ==
      exact.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("C6d: IVF assignment is plan-size-independent — k=512 fits in bounded time") {
    // 2000 deterministic pseudo-random vectors, dim 8
    val vecs = spark.range(2000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        j => pmod(xxhash64(col("id"), j), lit(997)).cast("float") / 997f).as("embedding"))
    val index = Ivf.fit(vecs, "vec_id", "embedding", numCentroids = 512, iters = 1)
    assert(index.centroids.length == 512)
    assert(index.assigned.count() == 2000)
    val cids = index.assigned.select("centroid_id").distinct()
      .collect().map(_.getInt(0))
    assert(cids.forall(c => c >= 0 && c < 512), s"cid out of range: ${cids.min}..${cids.max}")
    index.unpersist()
  }

  test("C16: connected components cluster transitively where keep-smallest cannot") {
    val verts = (1L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // component {1,2,3} via the chain (2,3),(1,3) — doc 2 never appears
    // as the larger side, so keep-smallest would KEEP it; clustering
    // must label it 1. {4,5} is a plain pair; 6 is a singleton.
    val pairs = Seq((2L, 3L), (1L, 3L), (4L, 5L)).toDF("doc1", "doc2")
    val comp = Dedup.connectedComponents(verts, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
                       4L -> 4L, 5L -> 4L, 6L -> 6L), comp.toString)
    // keep-smallest (drop doc2s) keeps {1, 2, 4, 6}: doc 2 survives
    val keepSmallest = verts.join(
      pairs.select(col("doc2").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      .collect().map(_.getLong(0)).toSet
    assert(keepSmallest == Set(1L, 2L, 4L, 6L))
    // one-representative-per-component keeps {1, 4, 6}: strictly tighter
    assert(comp.values.toSet == Set(1L, 4L, 6L))
    // a 4-long chain needs >1 propagation round to converge
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc1", "doc2")
    val chained = Dedup.connectedComponents(
        (1L to 4L).map(i => (i, "")).toDF("doc_id", "text"), "doc_id", chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chained.values.forall(_ == 1L), chained.toString)
  }

  test("C16b: label propagation iterates edge-incident vertices only") {
    // 10,000-vertex corpus, but only 7 vertices touch any pair — the
    // iterated relation must be edge-sized (7 rows), never corpus-sized
    val verts = spark.range(1, 10001).select(col("id").as("doc_id"), lit("t").as("text"))
    val pairs = Seq((1L, 2L), (2L, 3L), (50L, 51L), (60L, 61L)).toDF("doc1", "doc2")
    val r = Dedup.propagateMinLabels(pairs)
    assert(r.converged, s"rounds=${r.rounds}")
    assert(r.labels.count() == 7, "labels must cover edge-incident vertices only")
    // full result still covers the whole corpus, singletons self-labeled
    val full = Dedup.connectedComponents(verts, "doc_id", pairs)
    assert(full.count() == 10000)
    val labeled = full.filter(col("doc_id") =!= col("component"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labeled == Map(2L -> 1L, 3L -> 1L, 51L -> 50L, 61L -> 60L), labeled.toString)
  }

  test("C16c: maxIter exhaustion raises instead of returning wrong labels") {
    // a 6-chain has diameter 5: 2 rounds cannot converge it
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("doc1", "doc2")
    val verts = (1L to 6L).map(i => (i, "")).toDF("doc_id", "text")
    val partial = Dedup.propagateMinLabels(chain, maxIter = 2)
    assert(!partial.converged && partial.rounds == 2)
    val ex = intercept[IllegalStateException] {
      Dedup.connectedComponents(verts, "doc_id", chain, maxIter = 2,
        driverMaxEdges = 0) // force the distributed loop
    }
    assert(ex.getMessage.contains("converge"), ex.getMessage)
    // with budget it converges and labels the whole chain 1
    val ok = Dedup.connectedComponents(verts, "doc_id", chain,
        driverMaxEdges = 0)
      .collect().map(r => r.getLong(1)).toSet
    assert(ok == Set(1L))
  }

  test("C16d: driver union-find and distributed propagation label identically") {
    // deterministic pseudo-random graph: 300 vertices, 150 edges
    val verts = spark.range(300).select(col("id").as("doc_id"), lit("t").as("text"))
    val pairs = spark.range(150).select(
        pmod(xxhash64(col("id")), lit(300)).as("a"),
        pmod(xxhash64(col("id") + 1000), lit(300)).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("doc1"),
              greatest(col("a"), col("b")).as("doc2"))
    val viaDriver = Dedup.connectedComponents(verts, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaSpark = Dedup.connectedComponents(verts, "doc_id", pairs,
        driverMaxEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaSpark)
    assert(viaDriver.size == 300)
  }

  test("B24: as-of join matches ties, latest-before otherwise, null when none") {
    val l = Seq((1L, 100L, "e1"), (1L, 205L, "e2"), (2L, 50L, "e3"))
      .toDF("k", "ts", "id")
    val r = Seq((1L, 100L), (1L, 200L), (1L, 300L)).toDF("k", "ts")
    val out = AsOfJoin.asOf(l, r, "k", "ts", Seq("ts" -> "r_ts"))
      .orderBy("id").select("id", "r_ts").collect()
      .map(row => row.getString(0) -> (if (row.isNullAt(1)) -1L else row.getLong(1)))
    assert(out.toSeq == Seq("e1" -> 100L, "e2" -> 200L, "e3" -> -1L), out.mkString(","))
  }

  test("B24b: as-of match is row-level — a null value in the matched row stays null") {
    val l = Seq((1L, 250L, "e1")).toDF("k", "ts", "id")
    val r = Seq((1L, 100L, Some("old")), (1L, 200L, None))
      .toDF("k", "ts", "v")
    // the most recent right row (ts=200) has v=null; per-column
    // ignoreNulls would smuggle "old" from ts=100 past it
    val row = AsOfJoin.asOf(l, r, "k", "ts", Seq("v" -> "r_v", "ts" -> "r_ts")).head()
    assert(row.getAs[Long]("r_ts") == 200L)
    assert(row.isNullAt(row.fieldIndex("r_v")), row.toString)
    // and no-match still yields null, not a fabricated struct
    val none = AsOfJoin.asOf(Seq((2L, 10L, "e")).toDF("k", "ts", "id"), r,
      "k", "ts", Seq("v" -> "r_v")).head()
    assert(none.isNullAt(none.fieldIndex("r_v")))
  }

  test("B24c: a null-ts right row never matches (ASOF ignores null keys)") {
    val l = Seq((1L, 50L, "early")).toDF("k", "ts", "id")
    // the null-ts row sorts FIRST under asc ordering — unfiltered it
    // would become "the most recent right row" for every early left row
    val r = Seq((1L, Some(100L), "real"), (1L, None, "phantom"))
      .toDF("k", "ts", "v")
    val row = AsOfJoin.asOf(l, r, "k", "ts", Seq("v" -> "r_v")).head()
    assert(row.isNullAt(row.fieldIndex("r_v")),
      s"null-ts right row must not match: $row")
  }

  test("B25: range join matches boundaries inclusively, once per pair, no NL join") {
    val points = Seq((1L, 5.0), (2L, 10.0), (3L, 25.0), (4L, -3.0)).toDF("id", "v")
    val ranges = Seq(("a", 0.0, 10.0), ("b", 10.0, 20.0), ("c", 24.0, 26.0))
      .toDF("name", "lo", "hi")
    val out = RangeJoin.pointInRange(points, "v", ranges, "lo", "hi", bucketWidth = 7.0)
    val pairs = out.select("id", "name").collect().map(r => (r.getLong(0), r.getString(1)))
    // 5→a; 10→a AND b (inclusive boundaries); 25→c; -3 matches nothing
    assert(pairs.sorted.toSeq == Seq((1L, "a"), (2L, "a"), (2L, "b"), (3L, "c")))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
  }

  test("C6c: bucketed IVF round-trips and the probe prunes cell directories") {
    val vecs = (0L until 60L).map(i => (i, Array.tabulate(8)(d => math.sin(i * 3 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val index = Ivf.fit(vecs, "vec_id", "embedding", numCentroids = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf-bucketed")
    index.writeBucketed(dir.toString)

    // layout: one directory per non-empty cell + hidden centroid table
    val entries = java.nio.file.Files.list(dir).toArray.map(_.toString)
    assert(entries.exists(_.contains("centroid_id=")), entries.mkString(","))
    assert(entries.exists(_.endsWith("_centroids")))

    val loaded = Ivf.load(spark, dir.toString, "vec_id")
    assert(loaded.assigned.count() == 60)
    assert(loaded.centroids.length == 4)

    // the loaded index probes identically to the in-memory one
    val mem = index.topK(0L, 10, nprobe = 4).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val disk = loaded.topK(0L, 10, nprobe = 4).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(disk == mem)

    // a partial probe's isin(centroid_id) is a PartitionFilter on the
    // bucketed scan — cells are pruned before IO, not post-filtered
    val probePlan = loaded.assigned
      .filter(col("centroid_id").isin(0, 1))
      .queryExecution.executedPlan.toString
    assert(probePlan.contains("PartitionFilters") && probePlan.contains("centroid_id"),
      probePlan)
    index.unpersist()
  }

  test("C47: winnowing theorem — a shared run of w+k-1 tokens always yields a shared fingerprint") {
    import spark.implicits._
    // k=4, w=8: any shared run of >= 11 tokens must be caught.
    // Doc 1 and 2 share EXACTLY an 11-token run embedded in otherwise
    // disjoint text; doc 3 shares nothing that long.
    val run = (1 to 11).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma delta $run epsilon zeta eta theta"),
      (2L, s"one two three four five $run six seven eight nine ten"),
      (3L, "totally different words that overlap with nothing else here at all")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, "text", "doc_id", k = 4, w = 8,
        minShared = 1, maxDocFreq = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"guaranteed pair missed: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), pairs.toString)
  }

  test("C47: fingerprints are sparse (~2/(w+1) of grams) and the df cap is accounted") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh",
      "ii", "jj", "kk", "ll", "mm", "nn", "oo", "pp")
    val docs = (1L to 60L).map(i =>
      (i, (1 to 120).map(_ => words(rnd.nextInt(words.length))).mkString(" ")))
      .toDF("doc_id", "text")
    val nGrams = 60 * (120 - 4 + 1)
    val nFp = Dedup.winnowFingerprints(docs, "text", "doc_id", k = 4, w = 8)
      .count()
    // expected density 2/(w+1) ~ 0.22 of grams; assert well under the
    // every-gram posting relation with slack for distinct-collapsing
    assert(nFp < nGrams * 0.45, s"winnowing not sparse: $nFp of $nGrams")
    // 16 words ^ 4-grams over 60 random docs: some fingerprints recur
    // in > maxDocFreq docs, and every one dropped is accounted
    val dropped = Dedup.winnowDroppedFingerprints(docs, "text", "doc_id",
      k = 4, w = 8, maxDocFreq = 5).collect()
    assert(dropped.forall(_.getLong(1) > 5))
    val pairsCapped = Dedup.winnowPairs(docs, "text", "doc_id",
      k = 4, w = 8, minShared = 1, maxDocFreq = 5).count()
    val pairsFull = Dedup.winnowPairs(docs, "text", "doc_id",
      k = 4, w = 8, minShared = 1, maxDocFreq = 10000).count()
    if (dropped.nonEmpty)
      assert(pairsCapped <= pairsFull,
        s"cap must only remove candidates: $pairsCapped vs $pairsFull")
  }

  test("C54: decontam scrub removes exactly the covered spans, keeps the doc") {
    val bench = Seq("secret eval answer").toDF("text")
      .select(lit(1L).as("doc_id"), col("text"))
    val benchGrams = Dedup.shingles(bench, "text", "doc_id", n = 3)
      .select(col("gram"))
    val corpus = Seq(
      (10L, "intro words secret eval answer outro words"), // one hit mid-doc
      (11L, "secret eval answer"),                          // entirely contaminated
      (12L, "secret eval clean no full gram here"),         // partial overlap: no 3-gram hit
      (13L, "a secret eval answer b secret eval answer c")  // two hits
    ).toDF("doc_id", "text")
    val out = Dedup.decontamScrub(corpus, "text", "doc_id", benchGrams, n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(10L) == (("intro words outro words", 7L, 3L)), out(10L).toString)
    assert(out(11L) == (("", 3L, 3L)), out(11L).toString)
    // a 2-token prefix of an eval gram is NOT contamination at n=3
    assert(out(12L) == (("secret eval clean no full gram here", 7L, 0L)),
      out(12L).toString)
    assert(out(13L) == (("a b c", 9L, 6L)), out(13L).toString)
  }

  test("C54: overlapping hit windows union their covered positions, not double-remove") {
    // eval grams "x y z" and "y z w" overlap in the corpus run "x y z w":
    // covered positions are the union {1,2,3,4}, so exactly 4 tokens go
    val bench = Seq((1L, "x y z w")).toDF("doc_id", "text")
    val grams = Dedup.shingles(bench, "text", "doc_id", n = 3).select(col("gram"))
    val corpus = Seq((20L, "x y z w tail one two")).toDF("doc_id", "text")
    val out = Dedup.decontamScrub(corpus, "text", "doc_id", grams, n = 3)
      .collect().head
    assert(out.getString(1) == "tail one two")
    assert(out.getLong(3) == 4L)
  }

  test("C56: MMR displaces a near-duplicate in favor of a diverse item; λ=1 is pure relevance") {
    // query along e1. Hand-computed at λ=0.4 after pick #1 (=id 1),
    // with the TRUE SIGNED max-sim of Carbonell–Goldstein (an
    // anti-correlated candidate's negative max-sim is a boost, not
    // clamped to 0):
    //   id 2 (near-copy):  0.4·0.999 − 0.6·sim(2,1)=1.0     → −0.2004
    //   id 3 (diverse):    0.4·0.6   − 0.6·sim(3,1)=0.6354  → −0.1412
    //   id 4 (anti-query): 0.4·(−1)  − 0.6·(−0.999)         → +0.1994 ← wins
    // pick #3: id 3 (−0.1412) beats the near-copy (−0.2004).
    val vecs = Seq(
      (0L, Array(1.0, 0.0, 0.0)),           // query
      (1L, Array(0.999, 0.045, 0.0)),       // most relevant
      (2L, Array(0.999, 0.045, 0.0)),       // exact near-copy of 1
      (3L, Array(0.6, 0.8, 0.0)),           // diverse, rel 0.6
      (4L, Array(-1.0, 0.0, 0.0))           // anti-query
    ).toDF("vec_id", "embedding")
    val mmr = Similarity.mmrTopK(vecs, "vec_id", "embedding", queryId = 0L,
        k = 3, lambda = 0.4, poolSize = 10)
      .orderBy("rk").collect().map(_.getLong(1)).toSeq
    // the anti-query is maximal diversity under the signed formula;
    // the near-copy's margin dies to the diversity penalty both rounds
    assert(mmr == Seq(1L, 4L, 3L), mmr.toString)
    // λ=1: diversity term vanishes → exactly the relevance order
    val rel = Similarity.mmrTopK(vecs, "vec_id", "embedding", queryId = 0L,
        k = 4, lambda = 1.0, poolSize = 10)
      .orderBy("rk").collect().map(_.getLong(1)).toSeq
    assert(rel == Seq(1L, 2L, 3L, 4L), rel.toString)
    // determinism: same inputs → same ranking
    val again = Similarity.mmrTopK(vecs, "vec_id", "embedding", queryId = 0L,
        k = 3, lambda = 0.4, poolSize = 10)
      .orderBy("rk").collect().map(_.getLong(1)).toSeq
    assert(again == mmr)
  }

  test("C56: MMR measurably diversifies the real-embedding top-10 vs pure relevance") {
    // the operator's reason to exist, quantified on the actual
    // testdata embeddings: the MMR set must be internally LESS
    // similar than the pure-relevance set at comparable relevance
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    def vecsOf(ids: Seq[Long]): Seq[Array[Double]] = {
      val m = emb.filter(col("vec_id").isin(ids: _*))
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("v"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      ids.map(m)
    }
    def meanPairCos(vs: Seq[Array[Double]]): Double = {
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
        d / math.sqrt(na * nb)
      }
      val ps = for (i <- vs.indices; j <- (i + 1) until vs.size) yield cos(vs(i), vs(j))
      ps.sum / ps.size
    }
    val mmrIds = Similarity.mmrTopK(emb, "vec_id", "embedding", queryId = 0L,
        k = 10, lambda = 0.5, poolSize = 100)
      .collect().map(_.getLong(1)).toSeq
    val relIds = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queryId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSeq
    val dMmr = meanPairCos(vecsOf(mmrIds))
    val dRel = meanPairCos(vecsOf(relIds))
    info(f"mean pairwise cosine: relevance=$dRel%.3f mmr=$dMmr%.3f")
    assert(dMmr < dRel,
      f"MMR set must be more diverse: mmr=$dMmr%.3f vs relevance=$dRel%.3f")
  }

  test("C56: MMR over an ANN candidate pool matches brute force when the pool covers it") {
    // the 100 TB retrieve stage: candidates from a probe instead of a
    // full corpus scan. When the probe pool CONTAINS the brute-force
    // top-poolSize (here: top-40 ids from the exact scan, MMR pool of
    // 20), the re-rank must be identical — the probe only prunes rows
    // the TakeOrdered would have dropped anyway.
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val probe = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 40).select(col("vec_id"))
    val full = Similarity.mmrTopK(emb, "vec_id", "embedding", queryId = 0L,
        k = 5, lambda = 0.5, poolSize = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val probed = Similarity.mmrTopK(emb, "vec_id", "embedding", queryId = 0L,
        k = 5, lambda = 0.5, poolSize = 20, candidates = Some(probe))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(probed == full, s"$probed vs $full")
    // a RESTRICTING pool is honored: only probe members can be ranked
    val tiny = probe.limit(3)
    val tinyIds = tiny.collect().map(_.getLong(0)).toSet
    val ranked = Similarity.mmrTopK(emb, "vec_id", "embedding", queryId = 0L,
        k = 5, lambda = 0.5, poolSize = 20, candidates = Some(tiny))
      .collect().map(_.getLong(1)).toSet
    assert(ranked.subsetOf(tinyIds) && ranked.size == 3)
  }

  test("C58: incremental exact dedup drops corpus-known hashes, collapses intra-delta copies") {
    val corpusIdx = Seq("seen before", "also seen")
      .toDF("text").select(md5(col("text")).as("h"))
    val delta = Seq(
      (100L, "seen before"),   // known to the corpus → dropped
      (101L, "brand new one"), // survives
      (102L, "twin text"),     // intra-delta copy, min id → survives w/ count 2
      (103L, "twin text"),
      (104L, "brand new two")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalExactDedup(corpusIdx, delta, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(101L -> 1L, 102L -> 2L, 104L -> 1L), out.toString)
  }

  // ---- C70 edit-distance fuzzy pairs -------------------------------

  /** 120-char base key (> Dedup.EditKeyLen) with edits at the given
    * 0-based positions substituted to 'Z'. */
  private def editedDoc(positions: Int*): String = {
    val base = ("the quick brown fox jumps over the lazy dog while the " +
      "spark engine shuffles partitions across executors at scale " +
      "today ok").toCharArray
    positions.foreach(p => base(p) = 'Z')
    new String(base)
  }

  test("C70: substitution near-dups pair with exact distances; far docs never pair") {
    val fuzz = Seq(
      (1L, editedDoc()),            // base
      (2L, editedDoc(7)),           // 1 substitution
      (3L, editedDoc(3, 40, 77)),   // 3 substitutions, spread over 3 segments
      (4L, editedDoc(2, 22, 42, 62, 82)), // 5 subs > maxDist=4 hits all 5 segments
      (5L, "completely different content with no structural relation to " +
           "the probe document family whatsoever in any of its characters")
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(fuzz, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 2L)) == 1L && got((1L, 3L)) == 3L, got.toString)
    assert(got((2L, 3L)) == 4L, got.toString) // edits at disjoint positions add
    // 5 substitutions: beyond threshold AND touches every segment — absent
    assert(!got.keySet.exists { case (a, b) => Set(a, b).contains(4L) })
    assert(!got.keySet.exists { case (a, b) => Set(a, b).contains(5L) })
    val plan = Dedup.editDistancePairs(fuzz, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "blocking must not go all-pairs")
  }

  test("C70: pigeonhole blocking is complete for substitution-only edits (brute-force cross-check)") {
    // every pair of docs differing by ≤ maxDist substitutions of the
    // same base must be found — edits placed adversarially (segment
    // boundaries, same segment, spread out)
    val variants = Seq(
      (10L, editedDoc()), (11L, editedDoc(19)), (12L, editedDoc(20)),
      (13L, editedDoc(19, 20, 39, 40)), (14L, editedDoc(99)),
      (15L, editedDoc(0, 1, 2, 3)), (16L, editedDoc(96, 97, 98, 99))
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(variants, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val keys = variants.collect().map(r => r.getLong(0) -> r.getString(1).take(Dedup.EditKeyLen)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (a <- keys.keys; b <- keys.keys if a < b) {
      val truth = lev(keys(a), keys(b))
      if (truth <= Dedup.EditMaxDist)
        assert(got.get((a, b)).contains(truth.toLong),
          s"pair ($a,$b) ed=$truth missing or wrong: ${got.get((a, b))}")
      else assert(!got.contains((a, b)), s"pair ($a,$b) ed=$truth over threshold emitted")
    }
  }

  test("C70: indel near-dups band via shifted probes (brute-force cross-check)") {
    // r14 declared indels a recall gap; the shifted-probe grid closes
    // it — every pair within maxDist TOTAL edits (subs AND indels, at
    // adversarial positions: key start, segment boundaries, net-zero
    // shift, the maxDist boundary) must be found with its exact
    // distance
    val base = editedDoc()
    def del(s: String, p: Int): String = s.take(p) + s.drop(p + 1)
    def ins(s: String, p: Int): String = s.take(p) + "Q" + s.drop(p)
    val variants = Seq(
      (20L, base),
      (21L, del(base, 10)),                    // single deletion
      (22L, ins(base, 10)),                    // single insertion
      (23L, ins(base, 0)),                     // insertion at the very front
      (24L, del(base, 0)),                     // deletion at the very front
      (25L, del(del(base, 50), 5)),            // 2 deletions, distinct segments
      (26L, del(ins(base, 30), 70)),           // ins+del, net shift 0
      (27L, Seq(85, 65, 45, 25).foldLeft(base)(del)), // 4 dels = maxDist
      (28L, { val c = del(base, 55).toCharArray; c(15) = 'Z'; new String(c) })
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(variants, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val keys = variants.collect()
      .map(r => r.getLong(0) -> r.getString(1).take(Dedup.EditKeyLen)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    var inRange = 0
    for (a <- keys.keys; b <- keys.keys if a < b) {
      val truth = lev(keys(a), keys(b))
      if (truth <= Dedup.EditMaxDist) {
        inRange += 1
        assert(got.get((a, b)).contains(truth.toLong),
          s"indel pair ($a,$b) ed=$truth missing or wrong: ${got.get((a, b))}")
      } else assert(!got.contains((a, b)), s"pair ($a,$b) ed=$truth over threshold emitted")
    }
    assert(inRange >= 8, s"fixture too weak: only $inRange in-range pairs")
  }

  test("C70: edit screen recall is 1.0 per distance bucket on a planted subs+indel corpus") {
    val base = editedDoc()
    def del(s: String, p: Int): String = s.take(p) + s.drop(p + 1)
    def ins(s: String, p: Int): String = s.take(p) + "Q" + s.drop(p)
    val d = Seq(
      (30L, base), (31L, del(base, 40)), (32L, ins(base, 0)),
      (33L, editedDoc(7)), (34L, editedDoc(3, 40, 77)),
      (35L, del(del(base, 80), 20))
    ).toDF("doc_id", "text")
    val rows = Dedup.editScreenEval(d, "text", "doc_id").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(5) == 1.0,
        s"recall < 1 at distance bucket ${r.getDouble(2)}: $r")
    }
  }

  // ---- C73 maximal duplicated token spans --------------------------

  // run00..run19 carries content-defined anchors at gram starts 3 and
  // 5 (md5 mod 4 — verified offline), so recall is deterministic here
  private val run20 = (0 until 20).map(i => f"run$i%02d")
  private def doc(pre: Seq[String], post: Seq[String]): String =
    (pre ++ run20 ++ post).mkString(" ")

  test("C73: shared runs report exact maximal extents at each offset pair") {
    val d = Seq(
      (1L, doc(Seq("p1a", "p1b", "p1c", "p1d", "p1e"), Seq("s1a", "s1b"))),
      (2L, doc((1 to 9).map(i => s"p2$i"), Seq("s2a"))),
      (3L, doc(Nil, Seq("s3a", "s3b", "s3c")))
    ).toDF("doc_id", "text")
    val got = Dedup.maximalSpans(d, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3), r.getLong(4), r.getInt(5))).toMap
    // exact extents: the run is 20 tokens, boundaries differ — and the
    // two same-diagonal anchors collapse to ONE span per pair
    assert(got.size == 3, got.toString)
    assert(got((1L, 2L)) == (6, 10, 20L, 0), got.toString)
    assert(got((1L, 3L)) == (6, 1, 20L, 0), got.toString)
    assert(got((2L, 3L)) == (10, 1, 20L, 0), got.toString)
    val plan = Dedup.maximalSpans(d, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("C73: maxExt-bounded extents are flagged truncated, never silently clipped") {
    val d = Seq(
      (1L, doc(Seq("p1a", "p1b", "p1c"), Seq("s1a"))),
      (2L, doc(Seq("q2a", "q2b", "q2c", "q2d"), Seq("s2a")))
    ).toDF("doc_id", "text")
    val rows = Dedup.maximalSpans(d, "text", "doc_id",
      minTokens = 8, maxExt = 4).collect()
    assert(rows.nonEmpty)
    // every reported span hit the bound: flagged, and shorter than the
    // true 20-token run it sits inside
    rows.foreach { r =>
      assert(r.getInt(5) == 1, s"unflagged clipped span: $r")
      assert(r.getLong(4) < 20L)
    }
    // the unbounded call recovers the full run
    val full = Dedup.maximalSpans(d, "text", "doc_id").collect()
    assert(full.length == 1 && full.head.getLong(4) == 20L)
  }

  test("C73: boilerplate anchors are capped with accounting, and the cap is visible") {
    // 21 docs share the run → every run anchor has df 21 > maxDocFreq 20
    val d = (1 to 21).map(i =>
      (i.toLong, doc(Seq(s"pre${i}a", s"pre${i}b"), Seq(s"post$i"))))
      .toDF("doc_id", "text")
    val spans = Dedup.maximalSpans(d, "text", "doc_id")
    assert(spans.isEmpty, "capped anchors must drop their candidates")
    val dropped = Dedup.spanDroppedAnchors(d, "text", "doc_id")
      .collect().map(r => r.getLong(1))
    assert(dropped.length == 2 && dropped.forall(_ == 21L),
      s"expected the 2 run anchors dropped at df=21: ${dropped.mkString(",")}")
  }

  test("C74: scrub keeps the first occurrence, removes every later copy, and is idempotent") {
    val d = Seq(
      (1L, doc(Seq("p1a", "p1b", "p1c", "p1d", "p1e"), Seq("s1a", "s1b"))),
      (2L, doc((1 to 9).map(i => s"p2$i"), Seq("s2a"))),
      (3L, doc(Nil, Seq("s3a", "s3b", "s3c")))
    ).toDF("doc_id", "text")
    val out = Dedup.maximalSpanScrub(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // first occurrence (min doc id) survives untouched
    assert(out(1L)._3 == 0L && out(1L)._1.contains("run00"), out(1L))
    // later copies lose exactly the 20-token run, keep their unique frame
    assert(out(2L) == ((1 to 9).map(i => s"p2$i").mkString(" ") + " s2a", 30L, 20L))
    assert(out(3L) == ("s3a s3b s3c", 23L, 20L))
    // idempotent: a second pass over the scrubbed corpus removes nothing
    val again = Dedup.maximalSpanScrub(
      Dedup.maximalSpanScrub(d, "text", "doc_id")
        .select(col("doc_id"), col("clean_text").as("text")),
      "text", "doc_id")
    assert(again.filter(col("n_removed") > 0).isEmpty, "scrub must be idempotent")
  }

  test("C78: screen eval recalls planted exact dups at 1.0 and accounts candidate efficiency") {
    val base = (1 to 40).map(i => f"tok$i%02d").mkString(" ")
    val d = Seq(
      (1L, base), (2L, base),                       // exact dup: jaccard 1.0
      (3L, base.replace("tok05", "zzz05")
        .replace("tok25", "zzz25")),                // near dup of 1
      (4L, (1 to 40).map(i => f"oth$i%02d").mkString(" ")) // unrelated
    ).toDF("doc_id", "text")
    val out = Dedup.screenEval(d, "text", "doc_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // the jaccard-1.0 bucket must be fully recalled
    val top = out(("minhash", "recall", 1.0))
    assert(top._1 >= 1L && top._3 == 1.0, out.toString)
    // every true pair above the dedup threshold was found here
    val truthBuckets = out.collect { case (("minhash", "recall", b), v)
      if b >= 0 => v }
    assert(truthBuckets.map(_._1).sum >= 2L)
    assert(truthBuckets.forall { case (t, h, _) => h <= t })
    // precision row: true candidates never exceed candidates emitted,
    // and the exact dup (identical signature → every band collides)
    // is always among them
    val eff = out(("minhash", "precision", -1.0))
    assert(eff._1 >= eff._2 && eff._2 >= 1L, eff.toString)
  }

  test("C70 eval: edit screen recall is 1.0 on planted substitutions AND indels") {
    // 120-char keys (> EditKeyLen=100, so full grid), distance via
    // substitutions at spread positions vs a 1-char deletion
    val base = ('a' to 'z').mkString * 5 // 130 chars
    def sub(s: String, at: Int, c: Char) = s.updated(at, c)
    val d = Seq(
      (1L, base),
      (2L, sub(base, 10, 'Z')),                      // dist 1 (sub)
      (3L, sub(sub(sub(base, 5, 'X'), 50, 'Y'), 95, 'Q')), // dist 3 vs 1 (subs)
      (4L, base.patch(60, "", 1)),                   // dist 1 vs 1 (deletion)
      (5L, "short unrelated text")
    ).toDF("doc_id", "text")
    val out = Dedup.editScreenEval(d, "text", "doc_id").collect()
      .map(r => r.getDouble(2) -> (r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    // substitution-regime truth exists at several distances and every
    // sub-only pair is recalled (the pigeonhole guarantee)
    assert(out.nonEmpty, "no truth buckets")
    // dist-3 bucket holds (1,3): pure substitutions → recalled
    assert(out(3.0)._1 >= 1L, out.toString)
    // the deletion pair (1,4) lands in the dist-2 truth bucket (the
    // deletion plus the end-of-key shift on the 100-char prefix) and
    // the shifted-probe grid recalls it — r14's declared indel gap,
    // closed this round: EVERY bucket's recall is 1.0
    assert(out.contains(2.0) && out.values.forall(_._3 == 1.0), out.toString)
    // the report stays internally consistent: n_num <= n_denom, ratio
    assert(out.values.forall { case (t, h, r0) =>
      h <= t && math.abs(r0 - math.rint(h.toDouble / t * 10000) / 10000) < 1e-9 })
    // screen precision is 1 by construction: every screen pair is in truth
    val screenPairs = Dedup.editDistancePairs(d, "text", "doc_id").count()
    assert(out.values.map(_._2).sum <= out.values.map(_._1).sum)
    assert(screenPairs >= out(3.0)._2, "screen lost verified pairs")
  }

  test("C70: hot prefix buckets are capped with accounting, not silently") {
    // 12 docs sharing segment 0 exactly; maxBucket=8 drops that bucket
    val base = editedDoc()
    val shared = (0 until 12).map(i =>
      (100L + i, base.take(20) + s" tail variant number $i " + base.drop(44))).toDF("doc_id", "text")
    val dropped = Dedup.editDroppedBuckets(shared, "text", "doc_id", maxBucket = 8)
      .collect()
    assert(dropped.exists(r => r.getInt(2) == 12), dropped.mkString(","))
  }
}
