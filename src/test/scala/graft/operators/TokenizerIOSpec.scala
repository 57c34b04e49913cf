package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tokenizer-artifact interop ([[TokenizerIO]]): a vocabulary trained
  * in the lake must survive export → reload with DOCUMENT-IDENTICAL
  * encodings — otherwise the training stack tokenizes differently
  * than the pipeline that curated the data, the classic
  * train/serve-skew trap. Also pins the JSON shape (HF tokenizer.json
  * model block), id assignment, string escaping, and the unk
  * conventions on both sides. */
class TokenizerIOSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private val docs = corpus(
    "low low lower lowest", "new newer newest low",
    "wide wider widest new", "low newer lowest wide")

  private def collectTokens(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Seq[String]] =
    df.select("doc_id", "tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

  test("BPE: train -> export -> reload -> encoding is document-identical") {
    val merges = Bpe.learnMerges(spark, docs, "text", numMerges = 12,
      minPairCount = 2L)
    val alphabet = Bpe.vocab(docs, "text", Seq.empty)
      .select("subword").collect().map(_.getString(0)).toSeq
    val before = collectTokens(Bpe.encodeDocs(docs, "doc_id", "text", merges))

    val path = java.nio.file.Files.createTempDirectory("tokio")
      .resolve("bpe.json").toString
    TokenizerIO.writeBpe(spark, path, alphabet, merges)
    val (vocab, reloaded) = TokenizerIO.parseBpe(TokenizerIO.read(spark, path))
    // rank order and rule content survive byte-exactly
    assert(reloaded.map(m => (m.rank, m.left, m.right, m.merged)) ==
      merges.map(m => (m.rank, m.left, m.right, m.merged)))
    // ids dense from 0, alphabet first, merged products after
    assert(vocab.values.toSeq.sorted == (0 until vocab.size))
    assert(alphabet.toSet.subsetOf(vocab.keySet))
    assert(merges.forall(m => vocab.contains(m.merged)))
    val after = collectTokens(
      Bpe.encodeDocs(docs, "doc_id", "text",
        TokenizerIO.loadBpeMerges(spark, path)))
    assert(after == before, "reloaded rules changed an encoding")
    // every emitted token is in the exported vocab (the training stack
    // can id-map the stream without OOV surprises)
    assert(before.values.flatten.toSet.subsetOf(vocab.keySet))
  }

  test("Unigram: train -> export -> reload -> encoding is document-identical") {
    val vocab = Unigram.train(spark, docs, "text", vocabSize = 24,
      maxPieceLen = 4, seedSize = 128, emIters = 2, pruneRounds = 1)
    val asCost = vocab.select(col("piece"), (-col("logprob")).as("cost"))
    val before = collectTokens(
      Unigram.encodeDocs(docs, "doc_id", "text", asCost, maxPieceLen = 4))

    val path = java.nio.file.Files.createTempDirectory("tokio")
      .resolve("unigram.json").toString
    TokenizerIO.writeUnigram(spark, path, vocab)
    val json = TokenizerIO.read(spark, path)
    // unk contract: id 0, scored strictly below every real piece
    val entries = TokenizerIO.parseUnigram(json)
    assert(entries.size == vocab.count())
    assert(json.contains(s"""["${Unigram.UnkPiece}""""))
    val reloaded = TokenizerIO.loadUnigramVocab(spark, path)
    val after = collectTokens(
      Unigram.encodeDocs(docs, "doc_id", "text", reloaded, maxPieceLen = 4))
    assert(after == before, "reloaded vocab changed an encoding")
    // logprobs survive with enough precision that costs are equal to
    // the double-rounding floor
    val origCosts = asCost.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    reloaded.collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - origCosts(r.getString(0))) < 1e-9,
        s"cost drift for piece ${r.getString(0)}")
    }
  }

  test("JSON escaping survives hostile piece content") {
    val hostile = Seq(("a\"b", 10L, -1.5), ("c\\d", 5L, -2.25),
      ("tab\tpiece", 3L, -3.0)).toDF("piece", "usage", "logprob")
    val json = TokenizerIO.unigramJson(hostile)
    val back = TokenizerIO.parseUnigram(json)
    assert(back.toSet == Set(("a\"b", -1.5), ("c\\d", -2.25),
      ("tab\tpiece", -3.0)))
    val (v, m) = TokenizerIO.parseBpe(
      TokenizerIO.bpeJson(Seq("a\"", "\\"), Seq(Bpe.Merge(0, "a\"", "\\", "a\"\\", 7L))))
    assert(v.contains("a\"\\") && m.head.merged == "a\"\\")
  }

  test("a foreign HF-style BPE model block loads (merges only, no pair counts)") {
    // hand-written file in the public format, not produced by bpeJson
    val json = """{"model":{"type":"BPE","vocab":{"l":0,"o":1,"w</w>":2,"lo":3},
      "merges":["l o","lo w</w>"]}}""".stripMargin
    val (_, merges) = TokenizerIO.parseBpe(json)
    assert(merges.map(m => (m.rank, m.merged)) ==
      Seq((0, "lo"), (1, "low</w>")))
    val enc = collectTokens(
      Bpe.encodeDocs(corpus("low low"), "doc_id", "text", merges))
    assert(enc(0L) == Seq("lo", "w</w>", "lo", "w</w>") ||
      enc(0L) == Seq("low</w>", "low</w>"))
    // wrong type is rejected loudly
    intercept[IllegalArgumentException] {
      TokenizerIO.parseBpe("""{"model":{"type":"Unigram","vocab":[]}}""")
    }
  }
}
