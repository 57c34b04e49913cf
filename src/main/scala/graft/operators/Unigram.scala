package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed unigram-LM tokenizer training (SURVEY.md §2 C53) —
  * the SentencePiece-style trainer (Kudo 2018), the other half of the
  * subword-tokenizer story next to [[Bpe]]: where BPE GROWS a vocab by
  * merging, the unigram LM SHRINKS a big seed vocabulary by
  * expectation-maximization + pruning, and segmentation is the
  * minimum-cost (Viterbi) path under piece log-probabilities instead
  * of a merge replay.
  *
  * Algorithm (hard/Viterbi EM — deterministic, the property every
  * other trainer in this repo pins):
  *  1. distinct-word table `(word, wc)` — the same Zipf-bounded cache
  *     trick as [[Bpe.wordTable]]: all per-word work runs once per
  *     DISTINCT word, never per occurrence;
  *  2. seed vocab: the `seedSize` most frequent substrings of length
  *     ≤ `maxPieceLen` (occurrence-weighted), plus ALL single
  *     characters (coverage guarantee: every word stays segmentable);
  *  3. E-step: per word, the min-cost segmentation under current
  *     piece costs (−ln p), found by a Viterbi DP expressed as one
  *     codegen'd `aggregate` fold over the word's candidate edges —
  *     edges sorted by (end, start), so each relaxation reads a
  *     final predecessor cost (start < end ⇒ already settled);
  *  4. M-step: piece usage = Σ wc over best paths; p = usage/total.
  *     Unused multi-char pieces drop out; the corpus ALPHABET stays at
  *     a usage floor of 1 (see [[charTable]] — without the floor, an
  *     EM step drops unused characters and a later prune can orphan a
  *     word whose covering piece it removes);
  *  5. prune: drop the lowest-usage multi-char pieces down to
  *     `vocabSize` (the alphabet is never pruned), re-run EM.
  *
  * Scale shape (100 TB): the corpus is touched ONCE (word table);
  * every EM iteration is word-table-sized — candidate-edge explode
  * (≤ len·maxPieceLen rows per distinct word, map-side), an equi-join
  * against the vocab on `piece` (vocab is `seedSize` rows → AQE
  * broadcasts it), one groupBy(word) collect of the word's own edges
  * (bounded by word length — never a corpus-wide window), the DP fold
  * (map-side codegen), and a piece-usage partial agg. Driver state is
  * the vocab only (seedSize-bounded, the IVF-centroid stance).
  *
  * Determinism: seed selection orders by (count desc, piece asc);
  * the DP tie-breaks by preferring the LATER-sorted edge only on a
  * strict cost improvement (so equal-cost paths resolve to the
  * smallest-start, i.e. longest-last-piece, chain); usages are exact
  * integer sums. Same corpus + params ⇒ same vocab on any layout —
  * UnigramSpec pins parity against an independent sequential trainer.
  *
  * Reference scope note: QOPCFDR delegates analytics to Athena
  * (/root/reference/README.md:48) and has no tokenizer story; this
  * operator belongs to the training-data extension surface. */
object Unigram {

  private val Inf = 1e18

  /** Integer "infinity" for the portable DP: far above any real path
    * cost (≤ ~30 pieces × 1e6·ln(Σusage) ≈ 1e9) yet small enough that
    * `inf + qcost` cannot overflow long. */
  private val LongInf = 1000000000000000L

  /** Distinct-word table `(word, wc)`. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(coalesce(col(textCol), lit("")), "\\s+")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** All (start, end] candidate cut pairs of a word: 0 ≤ s < e ≤ len,
    * e − s ≤ maxPieceLen. Map-only nested transform + flatten. */
  private def candidateCuts(wlen: Column, maxPieceLen: Int): Column =
    flatten(transform(sequence(lit(0), wlen - 1), s =>
      transform(sequence(s + 1, least(wlen, s + lit(maxPieceLen))), e =>
        struct(s.as("s"), e.as("e")))))

  /** Candidate piece occurrences `(word, wc, s, e, piece)` — the
    * relation both seeding and the E-step explode. */
  private def pieceOccurrences(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(col("word"), col("wc"), length(col("word")).as("wlen"),
        explode(candidateCuts(length(col("word")), maxPieceLen)).as("cut"))
      .select(col("word"), col("wc"), col("cut.s").as("s"), col("cut.e").as("e"),
        expr("substring(word, s + 1, e - s)").as("piece"))

  /** Seed vocabulary `(piece, seed_count)`: top `seedSize` substrings
    * by occurrence-weighted count (ties to the lexicographically
    * smaller piece) UNION all single characters. */
  def seedVocab(words: DataFrame, maxPieceLen: Int, seedSize: Int): DataFrame = {
    val counts = pieceOccurrences(words, maxPieceLen)
      .groupBy("piece").agg(sum("wc").as("seed_count"))
    val top = counts
      .orderBy(col("seed_count").desc, col("piece"))
      .limit(seedSize)
    val chars = counts.where(length(col("piece")) === 1)
    top.unionByName(chars).groupBy("piece")
      .agg(max("seed_count").as("seed_count"))
  }

  /** One E-step: per distinct word, the Viterbi segmentation under
    * `vocab(piece, cost)` (cost = −ln p), returned as
    * `(word, wc, pieces array<string>, segmentable boolean)`. Words
    * are always segmentable while every character is in the vocab
    * (training guarantees this via the alphabet floor); under an
    * ARBITRARY vocab — e.g. [[encodeDocs]] applying a vocab trained
    * on a different alphabet — a word may have no full piece cover:
    * those rows come back `segmentable = false` with EMPTY pieces
    * (never a garbage backtrack), and words with NO matching piece at
    * all are absent entirely (the edge join is inner) — callers that
    * must account for every word left-join this output. */
  def viterbiSegment(words: DataFrame, vocab: DataFrame,
                     maxPieceLen: Int): DataFrame =
    viterbiImpl(words, vocab.select(col("piece"), col("cost")),
      maxPieceLen, lit(0.0), lit(Inf))

  /** ENGINE-PORTABLE Viterbi (C53b): the identical DP — same edge
    * order, same strict-< first-seen tie rule (equal-cost paths
    * resolve to the smallest start) — but over BIGINT costs
    * (`vocabQ(piece, qcost)`, 1e6-quantized −ln p), so every argmin
    * in the chain is integer-exact and replays bit-identically in an
    * independent engine: the C56p/C81 integer-quantization stance
    * applied to segmentation. */
  def viterbiSegmentPortable(words: DataFrame, vocabQ: DataFrame,
                             maxPieceLen: Int): DataFrame =
    viterbiImpl(words,
      vocabQ.select(col("piece"), col("qcost").as("cost")),
      maxPieceLen, lit(0L), lit(LongInf))

  private def viterbiImpl(words: DataFrame, vocabCost: DataFrame,
                          maxPieceLen: Int, zero: Column,
                          inf: Column): DataFrame = {
    val edges = pieceOccurrences(words, maxPieceLen)
      .join(vocabCost, Seq("piece"))
      .groupBy(col("word"), col("wc"))
      .agg(array_sort(collect_list(
        struct(col("e"), col("s"), col("cost")))).as("edges"))
      .select(col("word"), col("wc"), length(col("word")).as("n"), col("edges"))
    // DP state: costs[0..n] (index i+1 ↔ position i) + froms[0..n].
    // Edges arrive sorted by (e, s); relaxing edge (s, e) reads
    // costs[s], which is final because every edge ending ≤ s sorted
    // earlier. Strict < keeps the first-seen best (smallest start).
    val init = struct(
      concat(array(zero),
        transform(sequence(lit(1), col("n")), _ => inf)).as("costs"),
      transform(sequence(lit(0), col("n")), _ => lit(-1)).as("froms"))
    val folded = aggregate(col("edges"), init, (acc, ed) => {
      val s = ed.getField("s"); val e = ed.getField("e")
      val cand = element_at(acc.getField("costs"), s + 1) + ed.getField("cost")
      val cur = element_at(acc.getField("costs"), e + 1)
      val better = cand < cur
      struct(
        when(better,
          concat(slice(acc.getField("costs"), lit(1), e), array(cand),
            slice(acc.getField("costs"), e + 2, col("n") - e)))
          .otherwise(acc.getField("costs")).as("costs"),
        when(better,
          concat(slice(acc.getField("froms"), lit(1), e), array(s),
            slice(acc.getField("froms"), e + 2, col("n") - e)))
          .otherwise(acc.getField("froms")).as("froms"))
    })
    val withDp = edges.select(col("word"), col("wc"), col("n"),
        folded.as("dp"))
      .select(col("word"), col("wc"), col("n"),
        col("dp").getField("froms").as("froms"),
        // a finite cost at position n means a full piece cover exists,
        // and every backtrack hop then follows settled finite
        // predecessors — so this single check validates the whole path
        (element_at(col("dp").getField("costs"), col("n") + 1) < inf)
          .as("segmentable"))
    // Backtrack: walk froms from position n to 0 (≤ n hops), emitting
    // (s, e] cuts front-to-back via prepend.
    val cuts = aggregate(sequence(lit(1), col("n")),
      struct(col("n").as("pos"),
        expr("CAST(array() AS array<struct<s:int,e:int>>)").as("cuts")),
      (acc, _) => {
        val p = acc.getField("pos")
        val s = element_at(col("froms"), p + 1)
        when(p > 0,
          struct(s.as("pos"),
            concat(array(struct(s.as("s"), p.as("e"))),
              acc.getField("cuts")).as("cuts")))
          .otherwise(acc)
      },
      acc => acc.getField("cuts"))
    withDp.select(col("word"), col("wc"),
      when(col("segmentable"),
        transform(cuts, c =>
          col("word").substr(c.getField("s") + 1,
            c.getField("e") - c.getField("s"))))
        .otherwise(expr("CAST(array() AS array<string>)")).as("pieces"),
      col("segmentable"))
  }

  /** Piece-usage table after one E-step: `(piece, usage)`,
    * usage = Σ wc over best paths. */
  def usageCounts(segmented: DataFrame): DataFrame =
    segmented
      .select(col("wc"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum("wc").as("usage"))

  /** Every distinct character of the corpus — the REQUIRED alphabet.
    * Kept in the vocab at a usage floor of 1 through every EM and
    * prune step: an EM step gives unused characters zero usage, and
    * once a character is gone a later prune can orphan a word whose
    * best multi-char piece it then removes (the trap SentencePiece's
    * required_chars exists for — observed on this repo's own spec
    * corpus before the floor was added). */
  def charTable(words: DataFrame): DataFrame =
    words
      .select(explode(filter(split(col("word"), ""), c => c =!= ""))
        .as("piece"))
      .distinct()

  /** One EM refinement of a working vocab `(piece, usage, cost)`:
    * E-step Viterbi segmentation of the word table, M-step usage
    * re-count with the alphabet floor (see [[charTable]]), re-costed.
    * The building block [[train]] and [[trainLadder]] iterate. */
  def emStep(words: DataFrame, alphabet: DataFrame, vocab: DataFrame,
             maxPieceLen: Int): DataFrame = {
    // union the alphabet at a usage floor of 1 (chars already present
    // keep their real usage — max wins)
    val floored = usageCounts(viterbiSegment(words, vocab, maxPieceLen))
      .unionByName(alphabet.select(col("piece"), lit(1L).as("usage")))
      .groupBy("piece").agg(max("usage").as("usage"))
    withCosts(floored)
  }

  /** Prune multi-char pieces down to the `target` highest-usage ones
    * (ties to the lexicographically smaller piece) and re-cost. The
    * alphabet is immune — it IS the coverage guarantee. `target`
    * counts the WHOLE vocab, so multi-char keep = target − |alphabet|
    * (all-alphabet if the alphabet alone exceeds the target). */
  def pruneTo(vocab: DataFrame, target: Int): DataFrame = {
    val chars = vocab.where(length(col("piece")) === 1)
    val multi = vocab.where(length(col("piece")) > 1)
      .orderBy(col("usage").desc, col("piece"))
      .limit(math.max(0, target - chars.count().toInt))
    withCosts(chars.unionByName(multi).select(col("piece"), col("usage")))
  }

  /** Train a unigram-LM vocabulary. Returns `(piece, usage, logprob)`
    * — usage from the final E-step, logprob = ln(usage / Σ usage).
    * Equivalent to [[trainLadder]] with a constant
    * `Seq.fill(pruneRounds)(vocabSize)` ladder. */
  def train(spark: SparkSession, docs: DataFrame, textCol: String,
            vocabSize: Int = 256, maxPieceLen: Int = 5,
            seedSize: Int = 512, emIters: Int = 2,
            pruneRounds: Int = 2): DataFrame = {
    require(vocabSize >= 1 && seedSize >= vocabSize,
      "need seedSize >= vocabSize >= 1")
    val rounds = trainLadder(spark, docs, textCol,
      ladder = Seq.fill(pruneRounds)(vocabSize),
      maxPieceLen = maxPieceLen, seedSize = seedSize, emIters = emIters)
    rounds.last.vocab.select(col("piece"), col("usage"),
      graft.functions.TextFunctions.round4(-col("cost")).as("logprob"))
  }

  /** ENGINE-PORTABLE trainer gate config (C53 hash-green, r18) — the
    * C37/C39 precedent applied to the last oracle-able trainer: the
    * IDENTICAL ladder as [[train]] (seed → emIters×EM → prune →
    * emIters×EM settle) but with every Viterbi comparison run over
    * 1e6-QUANTIZED integer costs ([[viterbiSegmentPortable]]), so
    * every segmentation decision — and therefore every usage count,
    * every prune cut, and the final vocab — replays bit-identically
    * in an independent engine. The only float op left is the
    * cost quantization itself, `round(−ln(usage/tot)·1e6)`: both
    * engines compute it from the same exact integers with IEEE-double
    * ln, and the 1e6 grid makes a last-ulp ln disagreement matter
    * only within ~1e-9 of a rounding boundary (loud at the gate if
    * ever hit, never silent). M-step usage sums, the alphabet floor,
    * and prune ranks are integers already.
    *
    * `mirrorMaxWordLen` is the generated mirror's DP unroll depth —
    * a CONFIG constant, enforced here with a loud require (the BPE
    * trainer's fixed-over-fetch stance): a corpus word longer than
    * the bound would silently diverge from the mirror otherwise.
    *
    * Float EM ([[train]]) stays the quality path; UnigramSpec pins
    * portable-vs-float parity away from quantization ties. Output:
    * `(piece, usage, qcost)` — string + two bigints, fully
    * hash-checkable. */
  def trainPortable(spark: SparkSession, docs: DataFrame, textCol: String,
                    vocabSize: Int = 64, maxPieceLen: Int = 5,
                    seedSize: Int = 256, emIters: Int = 2,
                    pruneRounds: Int = 1,
                    mirrorMaxWordLen: Int = 16): DataFrame = {
    require(vocabSize >= 1 && seedSize >= vocabSize,
      "need seedSize >= vocabSize >= 1")
    import spark.implicits._
    val words = wordTable(docs, textCol).persist(StorageLevel.MEMORY_AND_DISK)
    // ONE probe job: row count + max word length together (r19 — these
    // were two sequential aggregates over the same cached table)
    val probe = words
      .agg(count(lit(1)).as("n"), max(length(col("word"))).as("ml")).head
    if (probe.getLong(0) == 0L) {
      words.unpersist(false)
      return Seq.empty[(String, Long, Long)].toDF("piece", "usage", "qcost")
    }
    try {
      val maxLen = probe.getInt(1)
      require(maxLen <= mirrorMaxWordLen,
        s"corpus max word length $maxLen exceeds the mirror's DP unroll " +
          s"bound $mirrorMaxWordLen — raise mirrorMaxWordLen (and the " +
          "generated oracle) in lockstep")
      // DRIVER-SIDE MODEL FOLD (r19): the vocab is model-sized by
      // construction (≤ seedSize + |alphabet| rows — the IVF-centroid
      // stance), so the per-EM total/quantize/prune bookkeeping runs on
      // the driver over collected rows instead of as extra distributed
      // jobs per round. Each EM round is now exactly ONE distributed
      // job (the word-table Viterbi + usage count collect); quantize
      // reproduces the plan's arithmetic bit-for-bit ([[qcostOf]]) and
      // prune reproduces the plan's (usage desc, piece asc) order under
      // Spark's binary UTF-8 collation ([[utf8Order]]). Before: every
      // round paid a separate total aggregate + an eager checkpoint of
      // the quantize crossJoin + a count job inside prune (~15 jobs per
      // train at the gate config; now 7).
      val alphabet = charTable(words).as[String].collect()
      def vocabDF(v: Seq[(String, Long, Long)]): DataFrame =
        v.toDF("piece", "usage", "qcost")
      def quantizeDriver(u: Seq[(String, Long)]): Seq[(String, Long, Long)] = {
        val tot = u.iterator.map(_._2).sum
        u.map { case (p, c) => (p, c, qcostOf(c, tot)) }
      }
      def emQ(v: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] = {
        val counted =
          usageCounts(viterbiSegmentPortable(words, vocabDF(v), maxPieceLen))
            .as[(String, Long)].collect()
        val m = scala.collection.mutable.LinkedHashMap(counted.toSeq: _*)
        // alphabet floor: chars already counted keep their usage
        alphabet.foreach(c => if (!m.contains(c)) m(c) = 1L)
        quantizeDriver(m.toSeq)
      }
      var vocab = quantizeDriver(
        seedVocab(words, maxPieceLen, seedSize)
          .select(col("piece"), col("seed_count"))
          .as[(String, Long)].collect().toSeq)
      def pruneDriver(v: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] = {
        def nChars(s: String) = s.codePointCount(0, s.length)
        val chars = v.filter(p => nChars(p._1) == 1)
        val multi = v.filter(p => nChars(p._1) > 1)
          .sortBy(p => (p._2, p._1))(
            Ordering.Tuple2(Ordering.Long.reverse, utf8Order))
          .take(math.max(0, vocabSize - chars.size))
        quantizeDriver((chars ++ multi).map(p => (p._1, p._2)))
      }
      (1 to pruneRounds).foreach { _ =>
        (1 to emIters).foreach(_ => vocab = emQ(vocab))
        vocab = pruneDriver(vocab)
      }
      (1 to emIters).foreach(_ => vocab = emQ(vocab))
      vocabDF(vocab)
    } finally words.unpersist(false)
  }

  /** The plan's cost quantization reproduced on the driver, op for op:
    * double divide → ln → negate → ×1e6 → round half-up (Spark `Round`
    * uses `BigDecimal.valueOf(d).setScale(0, HALF_UP)`) → long cast.
    * Same machine, same IEEE ops ⇒ the same bigint the distributed
    * quantize produced. */
  private def qcostOf(usage: Long, tot: Long): Long =
    java.math.BigDecimal
      .valueOf(-math.log(usage.toDouble / tot.toDouble) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP)
      .doubleValue().toLong

  /** Spark's binary (UTF-8 byte) string order, reproduced for the
    * driver-side prune — JVM String ordering compares UTF-16 code
    * units, which disagrees with UTF-8 byte order for supplementary
    * vs. BMP-private-range code points. */
  private val utf8Order: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
  }

  /** One ladder round's outcome: the DRIVER-MATERIALIZED local vocab
    * relation `(piece, usage, cost)` after that round's EM + prune
    * (the r19 driver fold holds the model-sized vocab on the driver
    * and re-localizes it per round — nothing is checkpointed), its row
    * count, and the round's wall seconds. `target` is the prune target
    * (0 for the final EM-only settling round). */
  final case class LadderRound(round: Int, target: Int, vocabRows: Long,
                               secs: Double, vocab: DataFrame)

  /** Production-shaped prune LADDER (SURVEY.md §2 C53): SentencePiece
    * shrinks an oversized seed toward the target over SEVERAL prune
    * rounds (`--shrinking_factor`, default 0.75, re-running EM between
    * prunes) rather than one cliff — pruning 20k → 1k in one step can
    * evict a piece whose usage only looks low because a sibling it
    * subsumes still holds the counts; intermediate EM re-attributes
    * usage before the next cut. Each round here = `emIters` EM steps
    * then a prune to `ladder(i)`; a final EM-only round settles usages
    * on the last pruned vocab (so round count = ladder.size + 1, and a
    * constant ladder reproduces [[train]] exactly — UnigramSpec pins
    * that equivalence path via train itself).
    *
    * Returns every round's snapshot so callers — the 100k-word
    * ScaleSpec ladder in particular — can pin per-round wall time and
    * the coverage invariant (every corpus word still segmentable)
    * BETWEEN rounds, not just at the end. Snapshots are
    * localCheckpointed: corpus-sized lineage never accumulates across
    * rounds, and each round's cost is one word-table EM pass —
    * the whole ladder touches the corpus zero times after the
    * initial [[wordTable]]. */
  def trainLadder(spark: SparkSession, docs: DataFrame, textCol: String,
                  ladder: Seq[Int], maxPieceLen: Int = 5,
                  seedSize: Int = 512, emIters: Int = 2)
      : Seq[LadderRound] = {
    require(ladder.forall(_ >= 1), "need positive ladder targets")
    require(ladder.zip(ladder.tail).forall { case (a, b) => a >= b },
      s"ladder must be non-increasing, got $ladder")
    require(ladder.headOption.forall(seedSize >= _),
      "need seedSize >= ladder.head")
    val words = wordTable(docs, textCol).persist(StorageLevel.MEMORY_AND_DISK)
    val nWords = words.count()
    import docs.sparkSession.implicits._
    if (nWords == 0L) {
      // empty/wordless corpus: an empty vocab, not a null-cost NaN
      // cascade through withCosts' 0-total division
      words.unpersist(false)
      val empty = Seq.empty[(String, Long, Double)]
        .toDF("piece", "usage", "cost")
      return Seq(LadderRound(0, 0, 0L, 0.0, empty))
    }
    try {
      // DRIVER-SIDE MODEL FOLD (r19, the trainPortable stance): the
      // working vocab is model-sized, so cost attachment, the alphabet
      // floor and the prune cut run on collected rows — ONE distributed
      // job per EM step (the word-table Viterbi + usage collect), no
      // per-round checkpoint/total/count jobs. costOf reproduces
      // withCosts' arithmetic on the same machine; the prune order
      // matches pruneTo's (usage desc, piece asc) under Spark's binary
      // UTF-8 collation.
      val alphabet = charTable(words).as[String].collect()
      def vocabDF(v: Seq[(String, Long, Double)]): DataFrame =
        v.toDF("piece", "usage", "cost")
      def costed(u: Seq[(String, Long)]): Seq[(String, Long, Double)] = {
        val tot = u.iterator.map(_._2).sum
        u.map { case (p, c) =>
          (p, c, -math.log(c.toDouble / tot.toDouble)) }
      }
      def emDriver(v: Seq[(String, Long, Double)]): Seq[(String, Long, Double)] = {
        val counted =
          usageCounts(viterbiSegment(words, vocabDF(v), maxPieceLen))
            .as[(String, Long)].collect()
        val m = scala.collection.mutable.LinkedHashMap(counted.toSeq: _*)
        alphabet.foreach(c => if (!m.contains(c)) m(c) = 1L)
        costed(m.toSeq)
      }
      def pruneDriver(v: Seq[(String, Long, Double)],
                      target: Int): Seq[(String, Long, Double)] = {
        def nChars(s: String) = s.codePointCount(0, s.length)
        val chars = v.filter(p => nChars(p._1) == 1)
        val multi = v.filter(p => nChars(p._1) > 1)
          .sortBy(p => (p._2, p._1))(
            Ordering.Tuple2(Ordering.Long.reverse, utf8Order))
          .take(math.max(0, target - chars.size))
        costed((chars ++ multi).map(p => (p._1, p._2)))
      }
      var vocab = costed(
        seedVocab(words, maxPieceLen, seedSize)
          .select(col("piece"), col("seed_count"))
          .as[(String, Long)].collect().toSeq)
      // ladder rounds: EM × emIters, then prune to the round's target;
      // a trailing target-0 entry marks the final EM-only settling pass
      (ladder.zipWithIndex.map { case (t, i) => (t, i, true) } :+
        ((0, ladder.size, false))).map { case (target, i, prune) =>
        val t0 = System.nanoTime()
        var it = 0
        while (it < emIters) {
          vocab = emDriver(vocab)
          it += 1
        }
        if (prune) vocab = pruneDriver(vocab, target)
        LadderRound(i, target, vocab.size.toLong,
          (System.nanoTime() - t0) / 1e9, vocabDF(vocab))
      }
    } finally words.unpersist(false)
  }

  /** The piece emitted for a word the vocab cannot cover — same
    * convention as SentencePiece's `<unk>` id-0 piece. */
  val UnkPiece = "<unk>"

  /** Encode every document into its unigram-LM token stream — the
    * APPLY half (the [[Bpe.encodeDocs]] counterpart, same word-cache
    * shape): Viterbi segmentation runs once per DISTINCT word under
    * the trained `vocab(piece, cost)`; the corpus-sized side only
    * splits, explodes and equi-joins `word`, then one hash agg per
    * doc reassembles order via `array_sort` structs.
    *
    * Out-of-alphabet handling: a word the vocab cannot fully cover
    * (characters absent from the training alphabet — possible whenever
    * the vocab was trained on a different corpus) is NOT silently
    * dropped: it encodes as the single [[UnkPiece]] token, still
    * counts in `n_words`, and is tallied in `n_unk` — the
    * SentencePiece `<unk>` contract. Output: (id, tokens, n_words,
    * n_tokens, n_unk); wordless docs keep empty arrays. */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
                 vocab: DataFrame, maxPieceLen: Int = 5): DataFrame =
    encodeImpl(docs, idCol, textCol,
      viterbiSegment(_, vocab, maxPieceLen))

  /** ENGINE-PORTABLE document encoding — [[encodeDocs]] over the
    * integer-cost Viterbi ([[viterbiSegmentPortable]]): given the
    * same `vocabQ(piece, qcost)` table an independent engine segments
    * every word identically, which is what graduates C53b from
    * rows-only to hash-green (the learned vocab interpolates into the
    * generated DuckDB mirror as literals; the mirror re-derives every
    * document's segmentation from those rules). */
  def encodeDocsPortable(docs: DataFrame, idCol: String, textCol: String,
                         vocabQ: DataFrame, maxPieceLen: Int = 5): DataFrame =
    encodeImpl(docs, idCol, textCol,
      viterbiSegmentPortable(_, vocabQ, maxPieceLen))

  private def encodeImpl(docs: DataFrame, idCol: String, textCol: String,
                         segment: DataFrame => DataFrame): DataFrame = {
    val words = docs
      .select(explode(split(coalesce(col(textCol), lit("")), "\\s+")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("wc"))
    // null pieces ⇔ unsegmentable (no full cover under this vocab);
    // words with zero matching pieces are missing entirely — the
    // left join below folds both cases into the same unk path
    val encoded = segment(words)
      .select(col("word"), when(col("segmentable"), col("pieces")).as("pieces"))
    val seq = docs.select(col(idCol),
      posexplode(filter(split(coalesce(col(textCol), lit("")), "\\s+"),
        w => w =!= "")).as(Seq("wpos", "word")))
    val enc = seq.join(encoded, Seq("word"), "left")
      .select(col(idCol), col("wpos"),
        col("pieces").isNull.cast("long").as("unk"),
        coalesce(col("pieces"), array(lit(UnkPiece))).as("pieces"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
          array_sort(collect_list(struct(col("wpos"), col("pieces")))),
          s => s.getField("pieces"))).as("tokens"),
        count(lit(1)).as("n_words"),
        sum(col("unk")).as("n_unk"))
    docs.select(col(idCol)).join(enc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("tokens"), array().cast("array<string>")).as("tokens"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_unk"), lit(0L)).as("n_unk"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Attach Viterbi costs: cost = −ln(usage / Σ usage). The 1-row
    * total crossJoin-broadcasts (the Dsir/Zorder stance). */
  private def withCosts(vocab: DataFrame): DataFrame = {
    val total = vocab.agg(sum("usage").as("tot"))
    vocab.crossJoin(broadcast(total))
      .select(col("piece"), col("usage"),
        (-log(col("usage").cast("double") / col("tot"))).as("cost"))
  }
}
