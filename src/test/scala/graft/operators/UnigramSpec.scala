package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** C53 — unigram-LM trainer oracle: an INDEPENDENT sequential
  * implementation of the same Viterbi-EM (same seeding, same
  * tie-breaks) must produce the identical vocabulary, usages and
  * segmentations as the distributed Catalyst version. */
class UnigramSpec extends SparkSpec {

  import spark.implicits._

  // ---------------------------------------------------------------
  // sequential reference trainer (plain Scala, no Spark)
  // ---------------------------------------------------------------
  private def refWordCounts(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }

  private def refSeed(words: Map[String, Long], maxPieceLen: Int,
                      seedSize: Int): Map[String, Long] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, wc) <- words; s <- 0 until w.length;
         e <- (s + 1) to math.min(w.length, s + maxPieceLen))
      counts(w.substring(s, e)) = counts.getOrElse(w.substring(s, e), 0L) + wc
    val top = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(seedSize)
    val chars = counts.filter(_._1.length == 1)
    (top ++ chars).toMap
  }

  /** Viterbi with the SAME tie-break as the fold: edges scanned in
    * (end asc, start asc) order, strict-< relaxation. */
  private def refSegment(w: String, cost: Map[String, Double],
                         maxPieceLen: Int): Seq[String] = {
    val n = w.length
    val costs = Array.fill(n + 1)(1e18); costs(0) = 0.0
    val froms = Array.fill(n + 1)(-1)
    for (e <- 1 to n; s <- math.max(0, e - maxPieceLen) until e) {
      cost.get(w.substring(s, e)).foreach { c =>
        if (costs(s) + c < costs(e)) { costs(e) = costs(s) + c; froms(e) = s }
      }
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var p = n
    while (p > 0) { val s = froms(p); out.prepend(w.substring(s, p)); p = s }
    out.toSeq
  }

  private def refEmStep(words: Map[String, Long], usage: Map[String, Long],
                        maxPieceLen: Int): Map[String, Long] = {
    val tot = usage.values.sum.toDouble
    val cost = usage.map { case (p, u) => p -> -math.log(u / tot) }
    val next = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, wc) <- words; p <- refSegment(w, cost, maxPieceLen))
      next(p) = next.getOrElse(p, 0L) + wc
    // alphabet floor — the same coverage rule as Unigram.train
    val alphabet = words.keysIterator.flatMap(_.toSeq).map(_.toString).toSet
    (next ++ alphabet.filterNot(next.contains).map(_ -> 1L)).toMap
  }

  private def refTrain(texts: Seq[String], vocabSize: Int, maxPieceLen: Int,
                       seedSize: Int, emIters: Int,
                       pruneRounds: Int): Map[String, Long] = {
    val words = refWordCounts(texts)
    var usage = refSeed(words, maxPieceLen, seedSize)
    var round = 0
    while (round <= pruneRounds) {
      for (_ <- 0 until emIters)
        usage = refEmStep(words, usage, maxPieceLen)
      if (round < pruneRounds) {
        val chars = usage.filter(_._1.length == 1)
        val multi = usage.filter(_._1.length > 1).toSeq
          .sortBy { case (p, u) => (-u, p) }
          .take(math.max(0, vocabSize - chars.size))
        usage = chars ++ multi
      }
      round += 1
    }
    usage
  }

  private val corpus = Seq(
    "low low low lower lower lowest",
    "new newer newest newest widest wide wide",
    "the slow slower sloth lowers the bar",
    "wide wider widest low slow glow")

  test("C53: distributed trainer matches the sequential reference exactly") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Unigram.train(spark, docs, "text",
        vocabSize = 12, maxPieceLen = 4, seedSize = 40,
        emIters = 2, pruneRounds = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refTrain(corpus, vocabSize = 12, maxPieceLen = 4,
      seedSize = 40, emIters = 2, pruneRounds = 1)
    assert(got == want,
      s"only-in-spark=${got.keySet -- want.keySet} " +
        s"only-in-ref=${want.keySet -- got.keySet} " +
        s"diff=${got.collect { case (k, v) if want.get(k).exists(_ != v) => (k, v, want(k)) }}")
  }

  test("C53: Viterbi picks the min-cost segmentation; coverage holds for unseen-ish words") {
    val words = Seq(("abc", 1L), ("axc", 1L)).toDF("word", "wc")
    // "abc" as one piece costs 1.0 < a+b+c = 3.0; "axc" must fall back
    // to characters (x only exists as a char piece)
    val vocab = Seq(("abc", 1.0), ("ab", 0.9), ("a", 1.0), ("b", 1.0),
        ("c", 1.0), ("x", 1.0))
      .toDF("piece", "cost")
    val seg = Unigram.viterbiSegment(words, vocab, maxPieceLen = 4)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(seg("abc") == Seq("abc"), seg.toString) // 1.0 beats ab+c = 1.9
    assert(seg("axc") == Seq("a", "x", "c"), seg.toString)
  }

  test("C53: equal-cost tie resolves to the smallest start (longest last piece)") {
    // "ab" via [a][b] costs 2.0; via [ab] costs 2.0 — at end 2 the
    // edge (s=0, 'ab') sorts before (s=1, 'b') and relaxation is
    // strict-<, so the smallest-start path settles first and wins:
    // ["ab"]. The assert compares against the reference segmentation
    // so the two implementations can never disagree silently.
    val words = Seq(("ab", 1L)).toDF("word", "wc")
    val vocab = Seq(("ab", 2.0), ("a", 1.0), ("b", 1.0)).toDF("piece", "cost")
    val seg = Unigram.viterbiSegment(words, vocab, maxPieceLen = 4)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    val ref = refSegment("ab", Map("ab" -> 2.0, "a" -> 1.0, "b" -> 1.0), 4)
    assert(seg("ab") == ref, s"spark=${seg("ab")} ref=$ref")
  }

  test("C53: pruning never drops single characters; vocab meets the target") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val vocab = Unigram.train(spark, docs, "text",
        vocabSize = 8, maxPieceLen = 4, seedSize = 40,
        emIters = 1, pruneRounds = 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val chars = corpus.flatMap(_.split("\\s+")).flatMap(_.toSeq).toSet
    val pieces = vocab.map(_._1).toSet
    // every character still IN USE by a best path is present
    assert(vocab.nonEmpty)
    assert(pieces.forall(p => p.length == 1 || p.length <= 4))
    assert(pieces.filter(_.length == 1).subsetOf(chars.map(_.toString)))
    // usages are positive and logprobs finite
    assert(vocab.forall(_._2 > 0))
  }

  test("C53b: encodeDocs segments documents word-for-word like the reference; reconstruction is lossless") {
    val docs = (corpus ++ Seq("")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val usage = refTrain(corpus, vocabSize = 12, maxPieceLen = 4,
      seedSize = 40, emIters = 2, pruneRounds = 1)
    val tot = usage.values.sum.toDouble
    val cost = usage.map { case (p, u) => p -> -math.log(u / tot) }
    val vocabDf = cost.toSeq.toDF("piece", "cost")
    val got = Unigram.encodeDocs(docs, "doc_id", "text", vocabDf,
        maxPieceLen = 4)
      .select("doc_id", "tokens", "n_words", "n_tokens")
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[String](1), r.getLong(2), r.getLong(3)))).toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      val words = t.split("\\s+").filter(_.nonEmpty).toSeq
      val want = words.flatMap(w => refSegment(w, cost, 4))
      assert(got(i.toLong)._1 == want, s"doc $i: ${got(i.toLong)._1} vs $want")
      assert(got(i.toLong)._2 == words.size)
      // lossless: concatenating each word's pieces re-derives the text
      assert(got(i.toLong)._1.mkString == words.mkString)
    }
    // wordless doc keeps its row with empty tokens
    assert(got(corpus.length.toLong) == ((Seq(), 0L, 0L)))
  }

  test("C53bp: the integer-cost portable encoder segments identically to the float path away from quantization ties") {
    // the r17 hash-green config: costs 1e6-quantized to BIGINT. On a
    // vocab whose cost gaps are far above 1e-6 (any real trained
    // vocab), quantization cannot flip an argmin — the portable and
    // float encoders must agree document-for-document.
    val docs = (corpus ++ Seq("")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val usage = refTrain(corpus, vocabSize = 12, maxPieceLen = 4,
      seedSize = 40, emIters = 2, pruneRounds = 1)
    val tot = usage.values.sum.toDouble
    val cost = usage.map { case (p, u) => p -> -math.log(u / tot) }
    val vocabDf = cost.toSeq.toDF("piece", "cost")
    val vocabQ = cost.map { case (p, c) =>
      (p, math.round(c * 1e6)) }.toSeq.toDF("piece", "qcost")
    def dump(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "tokens", "n_words", "n_tokens", "n_unk")
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[String](1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val flt = dump(Unigram.encodeDocs(docs, "doc_id", "text", vocabDf,
      maxPieceLen = 4))
    val prt = dump(Unigram.encodeDocsPortable(docs, "doc_id", "text", vocabQ,
      maxPieceLen = 4))
    assert(prt == flt,
      s"portable encoder must match the float path:\n$prt\n$flt")
  }

  test("C53p: the integer-cost portable TRAINER matches the float path away from quantization ties; qcosts recompute exactly") {
    // the r18 hash-green gate config: the whole EM ladder under
    // 1e6-quantized costs. On a corpus whose Viterbi cost gaps are far
    // above 1e-6 (any real one), quantization cannot flip a
    // segmentation argmin, so the portable vocab/usages must equal
    // both the float trainer's AND the sequential reference's.
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val flt = Unigram.train(spark, docs, "text",
        vocabSize = 12, maxPieceLen = 4, seedSize = 40,
        emIters = 2, pruneRounds = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val prt = Unigram.trainPortable(spark, docs, "text",
        vocabSize = 12, maxPieceLen = 4, seedSize = 40,
        emIters = 2, pruneRounds = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(prt.map(t => t._1 -> t._2).toMap == flt,
      s"portable trainer must match the float path:\n${prt.toSeq.sorted}\n$flt")
    // the emitted qcost is exactly the quantized −ln(usage/tot) of the
    // FINAL usages — the one float hop, reproducible from the integers
    val tot = prt.map(_._2).sum.toDouble
    prt.foreach { case (p, u, q) =>
      val want = BigDecimal(-math.log(u / tot) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      assert(q == want, s"qcost($p): got $q want $want")
    }
  }

  test("C53p: a corpus word longer than the mirror's DP unroll bound fails LOUDLY, never diverges silently") {
    val docs = Seq((1L, "short supercalifragilistic word")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Unigram.trainPortable(spark, docs, "text",
        vocabSize = 8, maxPieceLen = 3, seedSize = 16,
        emIters = 1, pruneRounds = 1, mirrorMaxWordLen = 8)
    }
    assert(e.getMessage.contains("unroll"), e.getMessage)
  }

  test("C53p: an entirely wordless corpus trains portably to an empty vocab") {
    val docs = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val vocab = Unigram.trainPortable(spark, docs, "text",
      vocabSize = 8, maxPieceLen = 3, seedSize = 16,
      emIters = 1, pruneRounds = 1)
    assert(vocab.count() == 0L)
    assert(vocab.columns.toSeq == Seq("piece", "usage", "qcost"))
  }

  test("C53u: out-of-alphabet words encode as <unk> and are counted, never dropped") {
    val usage = refTrain(corpus, vocabSize = 12, maxPieceLen = 4,
      seedSize = 40, emIters = 2, pruneRounds = 1)
    val tot = usage.values.sum.toDouble
    val vocabDf = usage.map { case (p, u) => p -> -math.log(u / tot) }
      .toSeq.toDF("piece", "cost")
    // "ZZQX" shares no character with the training alphabet; "aZb"
    // is partially matchable (a, b in-vocab) but has no full cover
    val docs = Seq((1L, "aba ZZQX aba"), (2L, "aZb")).toDF("doc_id", "text")
    val got = Unigram.encodeDocs(docs, "doc_id", "text", vocabDf,
        maxPieceLen = 4)
      .select("doc_id", "tokens", "n_words", "n_unk")
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[String](1), r.getLong(2), r.getLong(3)))).toMap
    val (t1, nw1, nu1) = got(1L)
    assert(nw1 == 3L, "every word counts, including the unk")
    assert(nu1 == 1L)
    assert(t1.count(_ == Unigram.UnkPiece) == 1)
    assert(!t1.exists(p => p.contains("Z") || p.contains("Q")),
      "no raw out-of-vocab bytes leak into the token stream")
    val (t2, nw2, nu2) = got(2L)
    assert((t2, nw2, nu2) == ((Seq(Unigram.UnkPiece), 1L, 1L)),
      "a partially-matchable word must become <unk>, not a garbage backtrack")
  }

  test("C53: an entirely wordless corpus trains to an empty vocab, not a NaN cascade") {
    val docs = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val vocab = Unigram.train(spark, docs, "text",
      vocabSize = 8, maxPieceLen = 3, seedSize = 16,
      emIters = 1, pruneRounds = 1)
    assert(vocab.count() == 0L)
    assert(vocab.columns.toSeq == Seq("piece", "usage", "logprob"))
  }

  test("C53: null/empty docs contribute nothing; training is deterministic") {
    val docs = (corpus ++ Seq("", null)).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def run() = Unigram.train(spark, docs, "text",
        vocabSize = 10, maxPieceLen = 3, seedSize = 30,
        emIters = 1, pruneRounds = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val a = run(); val b = run()
    assert(a == b)
    val clean = Unigram.train(spark,
      corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "text",
      vocabSize = 10, maxPieceLen = 3, seedSize = 30,
      emIters = 1, pruneRounds = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == clean, "empty/null docs must not change the vocabulary")
  }
}
