package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed BPE (byte-pair-encoding) vocabulary induction
  * (SURVEY.md §2 C39) — the tokenizer-training step of an LLM data
  * pipeline, run IN Spark so the corpus never leaves the cluster.
  *
  * Algorithm (Sennrich et al. 2016, the trainer every BPE/WordPiece
  * stack uses): start from characters, repeatedly merge the most
  * frequent adjacent symbol pair. The classic scale trick makes this
  * tractable: FIRST aggregate the corpus to its distinct-word table
  * `(word, count)` — Zipf-bounded (~10⁷–10⁸ rows at 100 TB, vs 10¹²
  * tokens) — then every merge iteration runs over words, weighted by
  * word count, never over the corpus again.
  *
  * Scale shape (100 TB):
  *  - one corpus pass builds the word table (map-side tokenize +
  *    partial-agg'd count on the high-cardinality `word` key);
  *  - each iteration is: adjacent-pair explode over the word table
  *    (map-side), pair-count partial agg, ONE 1-row driver argmax
  *    (deterministic count-desc/pair-asc ordering), and a map-side
  *    codegen'd `aggregate` fold applying the merge. Driver state is
  *    the merge list only;
  *  - the word table is persisted and its lineage truncated with
  *    `localCheckpoint` every few merges so plan depth stays bounded
  *    no matter how many merges are learned.
  *
  * Determinism: pair counts are exact integers and the argmax
  * tie-breaks lexicographically on (left, right) — the same (corpus,
  * numMerges) yields the same rules on any cluster layout, so retrain
  * and incremental runs are comparable.
  *
  * Reference scope note: QOPCFDR delegates all analytics to Athena
  * (/root/reference/README.md:48) and has no tokenizer story; this
  * operator is part of the training-data extension surface. */
object Bpe {

  /** End-of-word marker appended to a word's final symbol, so merges
    * distinguish word-final subwords ("est</w>") from interior ones
    * ("est" in "estimate") — the standard BPE alphabet split. */
  val EndOfWord = "</w>"

  /** Distinct-word table `(word, wc, syms)`: whitespace-tokenized
    * words with occurrence counts and their initial symbol arrays
    * (characters, last one suffixed with [[EndOfWord]]). Null/empty
    * texts contribute nothing. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame = {
    val words = docs
      .select(explode(split(coalesce(col(textCol), lit("")), "\\s+")).as("word"))
      .where(col("word") =!= "")
    words.groupBy("word").agg(count(lit(1)).as("wc"))
      .withColumn("syms", initialSymbols(col("word")))
  }

  /** Character split with the end-of-word marker on the last symbol. */
  private def initialSymbols(word: Column): Column = {
    val chars = filter(split(word, ""), c => c =!= "")
    transform(chars, (c, i) =>
      when(i === size(chars) - 1, concat(c, lit(EndOfWord))).otherwise(c))
  }

  /** Adjacent symbol pairs of each word, weighted by word count:
    * `(left, right, pair_count)`. Overlapping occurrences all count
    * (the standard trainer's statistic). */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .where(size(col("syms")) >= 2)
      .select(col("wc"),
        explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("l"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("r"))).as("p"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum("wc").as("pair_count"))

  /** Greedy left-to-right application of one merge (a, b) → ab to a
    * symbol array, as a codegen'd `aggregate` fold — "aaa" under
    * (a, a) becomes ["aa", "a"], matching reference trainers. */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
             element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** One learned merge rule. `rank` is 0-based learning order — the
    * order appliers must replay. */
  final case class Merge(rank: Int, left: String, right: String,
                         merged: String, pairCount: Long)

  /** Learn up to `numMerges` merge rules from `docs(textCol)`. Stops
    * early when the best remaining pair occurs fewer than
    * `minPairCount` times (rare-pair merges memorize noise).
    *
    * `batch` > 1 learns several merges per corpus pass: each round
    * collects the top candidate pairs (bounded driver rows), greedily
    * keeps the highest-count SYMBOL-DISJOINT subset, and applies them
    * in one chained fold. Disjointness makes the batch exact — no
    * kept pair can create or destroy instances of another kept pair,
    * so every recorded `pairCount` is the true frequency at pick time
    * — while cutting the number of Spark jobs by ~`batch`×.
    * `batch = 1` is strict classic BPE (global argmax per merge). */
  def learnMerges(spark: SparkSession, docs: DataFrame, textCol: String,
                  numMerges: Int, minPairCount: Long = 2L,
                  batch: Int = 1): Seq[Merge] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(batch >= 1, "batch must be >= 1")
    var words = wordTable(docs, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    words.count() // materialize before the loop re-reads it
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rounds = 0
    try {
      var done = false
      while (!done && merges.length < numMerges) {
        val want = math.min(batch, numMerges - merges.length)
        // over-fetch so the disjointness filter still fills the batch
        val top = pairCounts(words)
          .where(col("pair_count") >= minPairCount)
          .orderBy(col("pair_count").desc, col("left"), col("right"))
          .limit(math.max(4 * want, 16)).collect()
        // greedy symbol-disjoint subset in deterministic pick order
        val used = scala.collection.mutable.HashSet.empty[String]
        val picked = top.iterator.map { r =>
          (r.getString(0), r.getString(1), r.getLong(2))
        }.filter { case (a, b, _) =>
          val ok = !used(a) && !used(b)
          if (ok) { used += a; used += b }
          ok
        }.take(want).toSeq
        if (picked.isEmpty) done = true
        else {
          val applied = picked.foldLeft(words) { case (df, (a, b, _)) =>
            df.withColumn("syms", applyMerge(col("syms"), a, b))
          }
          picked.foreach { case (a, b, c) =>
            merges += Merge(merges.length, a, b, a + b, c)
          }
          val prev = words
          words = applied.persist(StorageLevel.MEMORY_AND_DISK)
          rounds += 1
          // truncate lineage every few rounds: each merge nests one
          // more fold into the plan; unbounded depth is an analyzer
          // cost even though each step is map-side. The pre-checkpoint
          // persist is dropped once the checkpoint holds the data —
          // otherwise every 4th round leaks one cached copy
          if ((rounds & 0x3) == 0) {
            val cp = words.localCheckpoint(true)
            words.unpersist(false)
            words = cp
          } else words.count()
          prev.unpersist(false)
        }
      }
    } finally words.unpersist(false)
    merges.toSeq
  }

  /** The learned rules as a DataFrame `(rank, left, right, merged,
    * pair_count)` — the persistable tokenizer artifact. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.merged, m.pairCount))
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Inverse of [[mergesDf]]: reload a persisted rules artifact (any
    * relation with rank/left/right/pair_count) into replay order —
    * rules are few (vocab-sized), so the collect is bounded. */
  def loadMerges(df: DataFrame): Seq[Merge] =
    df.select(col("rank").cast("int"), col("left"), col("right"),
        col("pair_count").cast("long"))
      .collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2),
        r.getString(1) + r.getString(2), r.getLong(3)))
      .sortBy(_.rank).toSeq

  /** Tokenize `textCol` into subwords with the learned rules: per
    * distinct word, replay merges in rank order (map-side folds over
    * the word table — never over the corpus), then explode to
    * `(word, subword, position)`. */
  def tokenizeWords(docs: DataFrame, textCol: String,
                    merges: Seq[Merge]): DataFrame = {
    val applied = merges.foldLeft(wordTable(docs, textCol)) { (df, m) =>
      df.withColumn("syms", applyMerge(col("syms"), m.left, m.right))
    }
    applied.select(col("word"), col("wc"),
        posexplode(col("syms")).as(Seq("position", "subword")))
      .select(col("word"), col("wc"), col("subword"), col("position"))
  }

  /** Final subword vocabulary `(subword, n_words, total_count)` under
    * the learned rules — the inventory a tokenizer ships with. */
  def vocab(docs: DataFrame, textCol: String,
            merges: Seq[Merge]): DataFrame =
    tokenizeWords(docs, textCol, merges)
      .groupBy("subword")
      .agg(countDistinct("word").as("n_words"),
           sum("wc").as("total_count"))

  /** Encode every document into its subword-token stream (SURVEY.md §2
    * C48) — the APPLY half of the tokenizer story [[learnMerges]]
    * trains. Output: one row per input doc with `tokens`
    * (array<string>, in document order), `n_words`, and `n_tokens`;
    * docs with no words keep an empty token array.
    *
    * Scale shape (the fastBPE word-cache trick): the merge replay —
    * the expensive per-word iterative part — runs ONCE PER DISTINCT
    * WORD over the Zipf-bounded word table, never per occurrence.
    * The corpus-sized side only splits, explodes, and equi-joins
    * `word` to its precomputed encoding (AQE picks broadcast when the
    * vocab side fits), then one hash agg per doc reassembles order
    * via `array_sort` on (position, syms) structs — no window, no
    * global sort. A 10¹²-token corpus pays 10⁷-ish fold evaluations
    * plus one shuffle on `word` and one on the doc id. */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
                 merges: Seq[Merge]): DataFrame = {
    // distinct-word encodings: replay merges in rank order, map-side
    val encoded = merges.foldLeft(wordTable(docs, textCol)) { (df, m) =>
      df.withColumn("syms", applyMerge(col("syms"), m.left, m.right))
    }.select(col("word"), col("syms"))
    // order-preserving word sequence of each doc (same \s+ contract as
    // wordTable — the join key must tokenize identically)
    val seq = docs.select(col(idCol),
      posexplode(filter(split(coalesce(col(textCol), lit("")), "\\s+"),
        w => w =!= "")).as(Seq("wpos", "word")))
    val enc = seq.join(encoded, Seq("word"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
          array_sort(collect_list(struct(col("wpos"), col("syms")))),
          s => s.getField("syms"))).as("tokens"),
        count(lit(1)).as("n_words"))
    docs.select(col(idCol)).join(enc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("tokens"), array().cast("array<string>")).as("tokens"),
        coalesce(col("n_words"), lit(0L)).as("n_words"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }
}
