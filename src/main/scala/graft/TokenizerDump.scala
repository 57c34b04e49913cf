package graft

/** One-command tokenizer-artifact dump: train the C39 BPE and C53
  * unigram tokenizers on a corpus and write both as HF-style
  * `tokenizer.json` model files ([[graft.operators.TokenizerIO]]).
  *
  *   sbt "runMain graft.TokenizerDump /root/testdata/sf0.01 /tmp/tok"
  *
  * writes `<outDir>/bpe.json` and `<outDir>/unigram.json`; optional
  * 3rd/4th args override the BPE merge count (default 48) and unigram
  * vocab size (default 64) — the in-repo query settings. */
object TokenizerDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TokenizerDump <sfDir> <outDir> [numMerges] [vocabSize]")
    val (sfDir, outDir) = (args(0), args(1))
    val numMerges = if (args.length > 2) args(2).toInt else 48
    val vocabSize = if (args.length > 3) args(3).toInt else 64
    val spark = GraftSession.get()
    import graft.operators.{Bpe, TokenizerIO, Unigram}
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")

    val merges = Bpe.learnMerges(spark, docs, "text",
      numMerges = numMerges, minPairCount = 2L, batch = 16)
    val alphabet = Bpe.vocab(docs, "text", Seq.empty)
      .select("subword").collect().map(_.getString(0)).toSeq
    TokenizerIO.writeBpe(spark, s"$outDir/bpe.json", alphabet, merges)
    println(s"[tokenizer] bpe.json: ${alphabet.size} base symbols + " +
      s"${merges.size} merges -> $outDir/bpe.json")

    val vocab = Unigram.train(spark, docs, "text",
      vocabSize = vocabSize, maxPieceLen = 5, seedSize = 256,
      emIters = 2, pruneRounds = 1)
    TokenizerIO.writeUnigram(spark, s"$outDir/unigram.json", vocab)
    println(s"[tokenizer] unigram.json: ${vocab.count()} pieces -> " +
      s"$outDir/unigram.json")
    spark.stop()
  }
}
