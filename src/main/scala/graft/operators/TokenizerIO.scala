package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tokenizer-artifact interop: serialize the trainers' outputs
  * ([[Bpe.learnMerges]] C39, [[Unigram.train]] C53) in the
  * Hugging Face `tokenizer.json` MODEL shape, and reconstruct the
  * encoder inputs from such a file — so a vocabulary trained in the
  * lake is loadable by a standard training stack, and a tokenizer
  * trained elsewhere can drive [[Bpe.encodeDocs]] /
  * [[Unigram.encodeDocs]] over 100 TB. Without this the trained
  * tokenizer is trapped in the lake: the packed shards (C17/C28) are
  * ready, but the model-side tokenizer could not be built from the
  * same rules.
  *
  * Format notes (both are the documented public `tokenizers` JSON):
  *  - BPE: `{"model":{"type":"BPE","vocab":{token:id,...},
  *    "merges":["left right",...]}}` — merges in rank order (array
  *    position IS the rank), ids dense: alphabet first (sorted), then
  *    each merge's product in rank order. Symbols never contain
  *    whitespace (the word table splits on `\s+`), so the
  *    space-joined merge encoding is unambiguous.
  *  - Unigram: `{"model":{"type":"Unigram","unk_id":0,
  *    "vocab":[["<unk>",0.0],["piece",logprob],...]}}` — logprobs are
  *    ln p (what [[Unigram.train]] emits), `<unk>` at id 0 matching
  *    [[Unigram.UnkPiece]]'s encode-side contract.
  *
  * Scale shape: tokenizer artifacts are vocab-sized — thousands of
  * rows, bounded by construction — so (de)serialization is a driver
  * operation by design, like every codebook in this repo (PQ
  * centroids, DSIR weights). Paths go through the Hadoop FileSystem
  * API so the artifact lands on the same store as the lake
  * (`s3a://`, `hdfs://`, local). JSON parsing uses Jackson, which
  * ships on the Spark classpath. */
object TokenizerIO {

  // ---------------------------------------------------------- render

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    } + "\""

  private def jnum(v: Double): String =
    if (v == v.floor && !v.isInfinite && math.abs(v) < 1e15) v.toLong.toString
    else String.format(java.util.Locale.ROOT, "%.10g", Double.box(v))

  /** The BPE model JSON. `alphabet` is the base (single-character)
    * symbol set — pass [[Bpe.vocab]] over the training corpus with
    * zero merges, or any superset; merged tokens are appended in rank
    * order after it, each id one past the last. */
  def bpeJson(alphabet: Seq[String], merges: Seq[Bpe.Merge]): String = {
    val base = alphabet.distinct.sorted
    val tokens = base ++ merges.sortBy(_.rank).map(_.merged)
    val seen = scala.collection.mutable.LinkedHashMap[String, Int]()
    tokens.foreach(t => if (!seen.contains(t)) seen(t) = seen.size)
    val vocab = seen.map { case (t, i) => s"${jstr(t)}:$i" }
      .mkString("{", ",", "}")
    val ms = merges.sortBy(_.rank)
      .map(m => jstr(s"${m.left} ${m.right}")).mkString("[", ",", "]")
    s"""{"version":"1.0","model":{"type":"BPE","vocab":$vocab,"merges":$ms}}"""
  }

  /** The Unigram model JSON from [[Unigram.train]]'s
    * `(piece, usage, logprob)` output (or any relation with `piece`
    * and `logprob` columns). Pieces sort by descending logprob then
    * piece — a deterministic id order — with `<unk>` prepended at
    * id 0, scored one nat below the worst real piece so external
    * Viterbi implementations prefer any real segmentation. */
  def unigramJson(vocab: DataFrame): String = {
    import org.apache.spark.sql.functions.col
    val pieces = vocab.select(col("piece"), col("logprob").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .sortBy { case (p, lp) => (-lp, p) }.toSeq
    val unkScore =
      if (pieces.isEmpty) 0.0 else pieces.map(_._2).min - 1.0
    val entries = ((Unigram.UnkPiece, unkScore) +: pieces)
      .map { case (p, lp) => s"[${jstr(p)},${jnum(lp)}]" }
      .mkString("[", ",", "]")
    s"""{"version":"1.0","model":{"type":"Unigram","unk_id":0,"vocab":$entries}}"""
  }

  // ------------------------------------------------------------ parse

  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Merges (rank = array position) and the token→id vocab of a BPE
    * model JSON — [[bpeJson]]'s inverse, and a loader for any HF-style
    * BPE `tokenizer.json` model block. The merges alone are what
    * [[Bpe.encodeDocs]] replays; `pairCount` is not part of the
    * interchange format and reloads as 0. */
  def parseBpe(json: String): (Map[String, Int], Seq[Bpe.Merge]) = {
    val model = mapper.readTree(json).path("model")
    require(model.path("type").asText() == "BPE",
      s"not a BPE model: type=${model.path("type").asText()}")
    val vocab = {
      val b = Map.newBuilder[String, Int]
      val it = model.path("vocab").fields()
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue.asInt()) }
      b.result()
    }
    val merges = {
      val b = Seq.newBuilder[Bpe.Merge]
      val it = model.path("merges").elements()
      var rank = 0
      while (it.hasNext) {
        val s = it.next().asText()
        val cut = s.indexOf(' ')
        require(cut > 0 && cut < s.length - 1, s"malformed merge entry: '$s'")
        val (l, r) = (s.substring(0, cut), s.substring(cut + 1))
        b += Bpe.Merge(rank, l, r, l + r, 0L)
        rank += 1
      }
      b.result()
    }
    (vocab, merges)
  }

  /** The `(piece, logprob)` rows of a Unigram model JSON — real pieces
    * only (the `unk_id` entry is the encoder's fallback, not a
    * segmentable piece, so it is filtered out). */
  def parseUnigram(json: String): Seq[(String, Double)] = {
    val model = mapper.readTree(json).path("model")
    require(model.path("type").asText() == "Unigram",
      s"not a Unigram model: type=${model.path("type").asText()}")
    val unkId = model.path("unk_id").asInt(-1)
    val b = Seq.newBuilder[(String, Double)]
    val it = model.path("vocab").elements()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      if (i != unkId) b += ((e.get(0).asText(), e.get(1).asDouble()))
      i += 1
    }
    b.result()
  }

  // --------------------------------------------------------- file I/O

  def write(spark: SparkSession, path: String, json: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    Option(p.getParent).foreach(fs.mkdirs(_))
    val os = fs.create(p, true)
    try os.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
  }

  def read(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val is = fs.open(p)
    try scala.io.Source.fromInputStream(is, "UTF-8").mkString
    finally is.close()
  }

  /** Train-side one-shots: dump a trained tokenizer next to the lake. */
  def writeBpe(spark: SparkSession, path: String, alphabet: Seq[String],
               merges: Seq[Bpe.Merge]): Unit =
    write(spark, path, bpeJson(alphabet, merges))

  def writeUnigram(spark: SparkSession, path: String,
                   vocab: DataFrame): Unit =
    write(spark, path, unigramJson(vocab))

  /** Apply-side loaders: the exact encoder inputs, reconstructed. */
  def loadBpeMerges(spark: SparkSession, path: String): Seq[Bpe.Merge] =
    parseBpe(read(spark, path))._2

  /** `(piece, cost)` for [[Unigram.encodeDocs]]: cost = −logprob. */
  def loadUnigramVocab(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    parseUnigram(read(spark, path)).toDF("piece", "logprob")
      .select(col("piece"), (-col("logprob")).as("cost"))
  }
}
