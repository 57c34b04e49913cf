package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.{Bucketing, Tables}

/** Scale-mechanics specs: co-bucketed joins are exchange-free, and
  * salted joins flatten hot keys without changing results. */
class ScaleSpec extends SparkSpec {

  test("co-bucketed tables join without an Exchange on either side") {
    val dir = Files.createTempDirectory("bucketed")
    val orders   = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val lineitem = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    Bucketing.writeBucketed(orders.withColumnRenamed("o_orderkey", "orderkey"),
      "b_orders", s"$dir/orders", "orderkey", buckets = 8)
    Bucketing.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "orderkey"),
      "b_lineitem", s"$dir/lineitem", "orderkey", buckets = 8)

    // force the non-broadcast path so the exchange-free property is
    // what's actually under test
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.cobucketedJoin(spark, "b_lineitem", "b_orders", "orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      // and it computes the right thing
      val expected = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("shingle generation is map-only: no Exchange, no Window") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = Dedup.shingles(docs, "text", "doc_id", dedupGrams = false)
      .queryExecution.executedPlan.toString
    // the exploded token relation is the largest intermediate in every
    // dedup pipeline — gram construction must not shuffle or sort it
    assert(!plan.contains("Exchange"), s"shingles should not shuffle:\n$plan")
    assert(!plan.contains("Window"), s"shingles should not need a window:\n$plan")
    // the deduped variant is map-only too since r20: per-doc dedup is
    // array_distinct on the doc's own gram array, never a distinct
    // exchange ((id, gram) distinct ⇔ within-doc distinct)
    val dedupPlan = Dedup.shingles(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!dedupPlan.contains("Exchange"),
      s"deduped shingles should not shuffle:\n$dedupPlan")
  }

  test("salted join equals the plain join and spreads the hot key") {
    import spark.implicits._
    // one hot key (90% of rows) + a long tail
    val big = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("key", "v")
    val small = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim-$i") }.toDF("key", "attr")

    val plain  = big.join(small, "key")
    val salted = SkewJoin.saltedJoin(big, small, "key", distributor = Seq("v"), n = 8)
    assert(salted.count() == plain.count())
    assert(salted.select(sum("v")).head().getLong(0) ==
      plain.select(sum("v")).head().getLong(0))
    assert(!salted.columns.contains("__salt"))

    // the hot key's rows really do spread across multiple salt values
    val spread = big.filter(col("key") === "hot")
      .select(pmod(xxhash64(col("key"), col("v")), lit(8)).as("s"))
      .distinct().count()
    assert(spread > 1, s"salt fan-out collapsed to $spread value(s)")
  }

  test("C16e: star-contraction converges on a ~1M-edge high-diameter graph") {
    // The adversarial dup-graph shapes at scale: LONG CHAINS (diameter
    // breaks min-label propagation, which needs O(diameter) rounds)
    // and BIG STARS (hot hub keys). 2,500 chains of 200 vertices +
    // 100 stars of 5,000 leaves = 997,500 edges over 1,000,100
    // vertices (each star is its hub plus 5,000 leaves). Every component minimum is closed-form, so exact
    // correctness is checked over ALL vertices distributed — the same
    // oracle a driver union-find would produce, without collecting a
    // million edges.
    val chainEdges = spark.range(2500L * 200L)
      .select((col("id") / 200L).cast("long").as("c"),
              pmod(col("id"), lit(200L)).as("i"))
      .filter(col("i") < 199L)
      .select((col("c") * 1000L + col("i")).as("doc1"),
              (col("c") * 1000L + col("i") + 1L).as("doc2"))
    val starEdges = spark.range(100L * 5000L)
      .select((lit(10000000L) + (col("id") / 5000L).cast("long") * 100000L).as("hub"),
              pmod(col("id"), lit(5000L)).as("k"))
      .select(col("hub").as("doc1"), (col("hub") + col("k") + 1L).as("doc2"))
    val edges = chainEdges.union(starEdges)
    assert(edges.count() == 2500L * 199L + 100L * 5000L) // 997,500
    val t0 = System.nanoTime()
    val r = Dedup.alternatingComponents(edges)
    val labeled = r.labels.localCheckpoint()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(r.converged, s"did not converge in ${r.rounds} rounds")
    // O(log²) claim with margin: a 200-diameter chain under min-label
    // propagation would need 200 rounds; star contraction must land
    // far under the default 30 budget
    assert(r.rounds <= 15, s"rounds=${r.rounds} — star contraction degraded")
    info(f"997,500 edges / 1,000,100 vertices: ${r.rounds} rounds, $secs%.1f s")
    // closed-form component minima: chains -> c*1000, stars -> hub
    val expected = when(col("id") >= 10000000L,
        (col("id") / 100000L).cast("long") * 100000L)
      .otherwise((col("id") / 1000L).cast("long") * 1000L)
    val wrong = labeled.filter(col("comp") =!= expected).count()
    assert(wrong == 0L, s"$wrong vertices mislabeled")
    assert(labeled.count() == 1000100L, "every edge-incident vertex labeled")
  }

  test("C71s: PageRank holds exactness on a 1M-node ring (closed-form fixpoint) plus hub skew") {
    // Ring: node i ↔ i+1 mod N. Every node is 2-regular, so the exact
    // integer recurrence has a closed-form fixpoint: contrib = 2·(r div 2)
    // = r (initRank is even), rank' = 150e6 + (17·10⁹) div 20 = 10⁹ —
    // every rank must stay EXACTLY initRank through every iteration.
    // That checks the distributed arithmetic bit-for-bit over a million
    // nodes without collecting anything: one filter-count oracle.
    val n = 1000000L
    val fwd = spark.range(n).select(col("id").as("src"),
      pmod(col("id") + 1L, lit(n)).as("dst"))
    val ring = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val t0 = System.nanoTime()
    val ranks = Graph.pageRank(ring, iters = 3)
    val offFixpoint = ranks.filter(col("rank") =!= Graph.PrInitRank).count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(offFixpoint == 0L, s"$offFixpoint ring nodes drifted off the fixpoint")
    assert(ranks.count() == n)
    info(f"ring: $n%,d nodes / ${2 * n}%,d directed edges, 3 iters: $secs%.1f s")

    // hub skew on the same operator: a 50k-leaf star (hot groupBy key)
    // must rank the hub first with all leaves tied — checked distributed
    val leaves = 50000L
    val hubFwd = spark.range(leaves).select(lit(-1L).as("src"),
      (col("id") + 1L).as("dst"))
    val star = hubFwd.union(hubFwd.select(col("dst").as("src"), col("src").as("dst")))
    val sr = Graph.pageRank(star, iters = 3)
    val hubRank = sr.filter(col("node") === -1L).head().getLong(1)
    val leafRanks = sr.filter(col("node") =!= -1L)
      .select(countDistinct(col("rank")).as("d"), max(col("rank")).as("m")).head()
    assert(leafRanks.getLong(0) == 1L, "asymmetric leaf ranks")
    assert(hubRank > leafRanks.getLong(1), "hub must outrank leaves")
  }

  test("C53s: unigram trainer holds at a 100k-distinct-word table") {
    // The Zipf-bounded word table is the scale knob for tokenizer
    // training (10⁷-10⁸ distinct words at 100 TB). 100k synthetic
    // distinct words (base-36 ids — realistic 4-7 char lengths,
    // shared prefixes so multi-char pieces actually win), 10k docs of
    // 10 words each. One EM round must complete in seconds-not-hours
    // wall time and the learned vocab must still reconstruct text
    // losslessly (the coverage invariant the alphabet floor defends).
    val word = (j: org.apache.spark.sql.Column) => concat(lit("w"), conv(j, 10, 36))
    val docs = spark.range(10000L)
      .select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(9)),
          k => word(pmod(col("id") * 10 + k, lit(100000)))), " ").as("text"))
    val t0 = System.nanoTime()
    val vocab = Unigram.train(spark, docs, "text",
      vocabSize = 1000, maxPieceLen = 4, seedSize = 2000,
      emIters = 1, pruneRounds = 1)
    val n = vocab.count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"100k distinct words: vocab=$n, $secs%.1f s")
    assert(n >= 37, "alphabet (w + 0-9a-z) must survive pruning")
    // lossless round-trip on a sample: pieces re-concatenate to the text
    val sample = docs.filter(col("doc_id") < 100)
    val enc = Unigram.encodeDocs(sample, "doc_id", "text",
        vocab.select(col("piece"), (-col("logprob")).as("cost")),
        maxPieceLen = 4)
      .select(col("doc_id"), concat_ws("", col("tokens")).as("joined"))
    val bad = enc.join(sample, "doc_id")
      .filter(col("joined") =!= regexp_replace(col("text"), " ", ""))
      .count()
    assert(bad == 0L, s"$bad docs failed lossless reconstruction")
  }

  test("C53s: unigram prune ladder 20k→8k→3k→1k holds at 100k words") {
    // Production SentencePiece shrinks an oversized seed to the target
    // over SEVERAL prune rounds (shrinking_factor), re-running EM
    // between cuts so usage re-attributes before the next prune. Pin
    // the ladder shape at the 100k-distinct-word scale knob: per-round
    // wall time stays bounded (each round is one word-table EM pass —
    // NOT corpus-sized, NOT ladder-length-quadratic), the vocab
    // tracks each target, and the coverage invariant (every corpus
    // word still segmentable) holds BETWEEN rounds, not just at the
    // end — a mid-ladder coverage hole is exactly the orphaned-word
    // trap the alphabet floor defends against.
    val word = (j: org.apache.spark.sql.Column) => concat(lit("w"), conv(j, 10, 36))
    val docs = spark.range(10000L)
      .select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(9)),
          k => word(pmod(col("id") * 10 + k, lit(100000)))), " ").as("text"))
    val words = Unigram.wordTable(docs, "text").localCheckpoint(true)
    val nWords = words.count()
    val nChars = Unigram.charTable(words).count()

    val rounds = Unigram.trainLadder(spark, docs, "text",
      ladder = Seq(8000, 3000, 1000), maxPieceLen = 4,
      seedSize = 20000, emIters = 1)
    assert(rounds.size == 4, "3 prune rounds + the final EM settle")
    rounds.foreach { r =>
      info(f"round ${r.round} target=${r.target}: vocab=${r.vocabRows}, ${r.secs}%.1f s")
      // wall-time pin: a round that goes corpus-sized or re-seeds
      // blows far past this; measured ~15-25 s/round on this box
      assert(r.secs < 120.0,
        f"round ${r.round} took ${r.secs}%.1f s — not word-table-sized")
      // the vocab tracks the round's target (alphabet rides along;
      // the final EM-only round keeps the last prune's bound)
      val bound = (if (r.target > 0) r.target else 1000) + nChars
      assert(r.vocabRows <= bound,
        s"round ${r.round}: ${r.vocabRows} pieces > target $bound")
      // coverage invariant AT THIS ROUND: every distinct corpus word
      // has a full piece cover under the round's vocab
      val covered = Unigram.viterbiSegment(words, r.vocab, maxPieceLen = 4)
        .filter(col("segmentable")).count()
      assert(covered == nWords,
        s"round ${r.round}: ${nWords - covered} of $nWords words lost coverage")
    }
    // the ladder shrinks monotonically through the prune rounds
    val sizes = rounds.init.map(_.vocabRows)
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b },
      s"vocab sizes not monotone down the ladder: $sizes")
  }

  test("C82s: PPS sample is bucketing-invariant on a 1M-doc stream") {
    // 1M docs with pseudo-random weights (including zeros). The
    // distributed two-level prefix sum at 256 buckets must reproduce
    // the numBuckets=1 run EXACTLY — at 1M rows the single-bucket run
    // IS the global-window formulation the operator exists to avoid,
    // so equality here is the distributed-vs-sequential oracle at
    // volume, checked distributively (no collect of a million rows).
    val docs = spark.range(1000000L)
      .select(col("id").as("doc_id"),
        pmod(col("id") * 2654435761L, lit(97L)).as("w"))
    val t0 = System.nanoTime()
    val fast = Sample.systematicPps(docs, "doc_id", "w", k = 10000L,
      seed = "scale", numBuckets = 256)
    val slow = Sample.systematicPps(docs, "doc_id", "w", k = 10000L,
      seed = "scale", numBuckets = 1)
    assert(fast.exceptAll(slow).count() == 0 &&
      slow.exceptAll(fast).count() == 0,
      "bucketed and sequential samples diverge")
    val secs = (System.nanoTime() - t0) / 1e9
    // the realized sample size is the exact grid count: k ± 1
    val picks = fast.agg(sum(col("n_picks"))).collect()(0).getLong(0)
    assert(math.abs(picks - 10000L) <= 1, s"picks=$picks")
    info(f"1M docs sampled twice + compared in $secs%.1f s, $picks picks")
  }

  test("C89s: budget curve is bucketing-invariant on a 1M-doc stream") {
    // the curve inherits packOffsets' two-level prefix sum; this pins
    // the COMPOSED relation at volume — 256-bucket vs the sequential
    // single-bucket (= global window) formulation must agree row-for-row
    val docs = spark.range(1000000L)
      .select(col("id").as("doc_id"),
        (pmod(col("id") * 2654435761L, lit(4000L)) + 1L).as("w"))
    val budgets = Seq(2048L, 8192L)
    val t0 = System.nanoTime()
    val fast = Pack.budgetCurve(docs, "doc_id", "w", budgets, numBuckets = 256)
    val slow = Pack.budgetCurve(docs, "doc_id", "w", budgets, numBuckets = 1)
    assert(fast.exceptAll(slow).count() == 0 &&
      slow.exceptAll(fast).count() == 0,
      "bucketed and sequential curves diverge")
    val rows = fast.orderBy("budget").collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // ~2G tokens: shard counts are exact ceil divisions of the total
    val total = rows.head.getLong(2)
    budgets.zip(rows).foreach { case (b, r) =>
      assert(r.getLong(3) == (total + b - 1) / b, s"shards at $b") }
    info(f"1M docs curved twice + compared in $secs%.1f s, $total tokens")
  }

  test("C88s: novelty screens 200k docs against a 100k-doc reference sublinearly") {
    // synthetic corpus: doc i's text is 12 deterministic pseudo-tokens;
    // every doc with id % 2 == 0 is EXACTLY mirrored in the reference
    // (novelty 0), odd ids draw from a disjoint vocab (novelty 1)
    def text(prefix: org.apache.spark.sql.Column) = concat_ws(" ",
      transform(sequence(lit(1), lit(12)),
        i => concat(prefix, pmod(col("id") * 31L + i * 7L, lit(200000L)))))
    val corpus = spark.range(200000L).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, text(lit("s"))).otherwise(text(lit("n")))
        .as("text"))
    val reference = spark.range(100000L)
      .select((col("id") * 2).as("id"))
      .select(col("id").as("doc_id"), text(lit("s")).as("text"))
    val t0 = System.nanoTime()
    val out = Dedup.ngramNovelty(corpus, "text", "doc_id",
      reference, "text", n = 3).persist()
    val seen = out.filter(col("doc_id") % 2 === 0)
      .agg(max(col("novelty")), count(lit(1))).collect()(0)
    val fresh = out.filter(col("doc_id") % 2 === 1)
      .agg(min(col("novelty")), count(lit(1))).collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(seen.getDouble(0) == 0.0 && seen.getLong(1) == 100000L,
      s"mirrored docs must score 0 novelty: $seen")
    assert(fresh.getDouble(0) == 1.0 && fresh.getLong(1) == 100000L,
      s"disjoint-vocab docs must score 1 novelty: $fresh")
    out.unpersist()
    info(f"200k docs vs 100k reference in $secs%.1f s")
  }

  test("C86s: probe recall curve holds at 500k synthetic vectors") {
    // 16-dim pseudo-random vectors; the distributed multi-query harness
    // must keep its contracts (full probe ≡ 1, monotone) at a volume
    // where any per-query driver loop or corpus sort would be obvious
    val emb = spark.range(500000L).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(16)), i =>
        (pmod(xxhash64(col("id"), i), lit(2000L)).cast("double") / 1000.0 - 1.0))
        .as("embedding"))
    val t0 = System.nanoTime()
    val curve = Ivf.probeRecallCurve(emb, "vec_id", "embedding",
      numCells = 16, k = 20, nprobes = Seq(1, 4, 16), numQueries = 8)
      .orderBy("nprobe").collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val recalls = curve.map(_.getDouble(4))
    assert(recalls.last == 1.0, s"full probe must be exact: ${recalls.toSeq}")
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"monotonicity: ${recalls.toSeq}")
    info(f"500k vectors, 8 queries, 3 probe widths in $secs%.1f s — " +
      s"recalls ${recalls.mkString(", ")}")
  }
}
