package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Quantified accuracy of the approximate operators on the real
  * testdata tables — approximation is only a valid scale trade if the
  * error is bounded and measured. */
class AccuracySpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("C6b: IVF recall@20 rises with nprobe and is exact at full probe") {
    val emb = Tables.load(spark, sf, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 20)
      .collect().map(_.getLong(0)).toSet
    val index = Ivf.fit(emb, "vec_id", "embedding", numCentroids = 16, iters = 3)
    def recall(np: Int): Double = {
      val got = index.topK(0L, 20, np).collect().map(_.getLong(0)).toSet
      (exact & got).size / 20.0
    }
    // measured on this (deterministic) index: 0.65 / 0.80 / 0.85 / 1.0
    val r1 = recall(1); val r4 = recall(4); val r8 = recall(8); val r16 = recall(16)
    assert(r4 >= 0.75, s"recall@20 nprobe=4 degraded to $r4")
    assert(r8 >= 0.80, s"recall@20 nprobe=8 degraded to $r8")
    assert(r16 == 1.0, s"full probe must equal brute force, got $r16")
    assert(r1 <= r4 && r4 <= r8 && r8 <= r16, s"recall not monotone: $r1 $r4 $r8 $r16")
    index.unpersist()
  }

  test("C6c: incremental IVF append serves recall within eps of a full refit") {
    val emb = Tables.load(spark, sf, "embeddings")
    // 80/20 split by id hash: fit on the base, append the delta — the
    // daily-delta shape (delta drawn from the same distribution)
    val isDelta = pmod(xxhash64(col("vec_id")), lit(5)) === 0
    val base = emb.filter(!isDelta)
    val delta = emb.filter(isDelta)
    val appended = Ivf.fit(base, "vec_id", "embedding", numCentroids = 16,
      iters = 3).append(delta, "embedding")
    val refit = Ivf.fit(emb, "vec_id", "embedding", numCentroids = 16, iters = 3)
    assert(appended.assigned.count() == emb.count(),
      "append must serve the full corpus")
    // average over several queries: single-query recall at 16 cells is
    // dominated by which side of a cell boundary that one query lands on
    val queries = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = queries.map(q => q ->
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 20)
        .collect().map(_.getLong(0)).toSet).toMap
    def recall(ix: Ivf.IvfIndex, np: Int): Double =
      queries.map { q =>
        val got = ix.topK(q, 20, np).collect().map(_.getLong(0)).toSet
        (exact(q) & got).size / 20.0
      }.sum / queries.size
    val (ra, rr) = (recall(appended, 8), recall(refit, 8))
    info(f"mean recall@20 nprobe=8 over ${queries.size} queries: " +
      f"appended=$ra%.2f refit=$rr%.2f")
    assert(ra >= rr - 0.15,
      f"appended-index recall $ra%.2f fell more than eps below refit $rr%.2f")
    // full probe stays exact — the append lost no vectors
    assert(recall(appended, 16) == 1.0)
    // drift gauge: an in-distribution delta assigns about as well as
    // the base corpus under the frozen centroids
    val baseQ = appended.meanAssignedCosine(
      Ivf.assignCells(base, "vec_id", "embedding", appended.centroids))
    val deltaQ = appended.meanAssignedCosine(
      Ivf.assignCells(delta, "vec_id", "embedding", appended.centroids))
    info(f"mean assigned cosine: base=$baseQ%.3f delta=$deltaQ%.3f")
    // relative band: these synthetic embeddings sit far from their
    // centroids (mean cosine ~0.35), so the gauge is judged as a ratio —
    // an out-of-distribution delta would land near 0 or negative
    assert(deltaQ >= baseQ * 0.5,
      f"in-distribution delta drifted: $deltaQ%.3f vs base $baseQ%.3f")
    appended.unpersist(); refit.unpersist()
  }

  test("C25c: IVF-PQ append matches the refit index on the same probes") {
    val emb = Tables.load(spark, sf, "embeddings")
    val isDelta = pmod(xxhash64(col("vec_id")), lit(5)) === 0
    val appended = Pq.buildIvf(emb.filter(!isDelta), "vec_id", "embedding",
      numCells = 16, m = 8).append(emb.filter(isDelta), "embedding")
    assert(appended.codes.count() == emb.count(),
      "append must encode and serve the full corpus")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 20)
      .collect().map(_.getLong(0)).toSet
    val got = appended.topK(emb, "embedding", 0L, 20, nprobe = 16,
      rerank = emb.count().toInt).collect().map(_.getLong(0)).toSet
    // full probe + full re-rank over the appended index is exact, like
    // the refit index (C25b): appending loses no vectors and encodes
    // the delta with the frozen codebooks
    assert((exact & got).size == 20, s"appended IVF-PQ lost recall: $got")
    appended.unpersist()
  }

  test("C50: SQ8 recall@20 beats PQ's ADC tier; codes are bounded ints") {
    val emb = Tables.load(spark, sf, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 20)
      .collect().map(_.getLong(0)).toSet
    val exact10 = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val got = Sq.topK(emb, "vec_id", "embedding", 0L, 20)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & got).size / 20.0
    info(f"SQ8 recall@20 = $recall%.2f")
    // reconstructed-value scoring keeps cosine error ≤ ~0.005 — near-
    // lossless ranking (scoring raw codes instead measured 0.85 here:
    // per-dim scales distort the geometry — see Sq.decode). Pin a
    // strong bound plus the well-separated contract: every exact
    // top-10 neighbor must survive into the SQ top-20.
    assert(recall >= 0.95, s"SQ8 recall@20 degraded to $recall")
    assert((exact10 -- got).isEmpty,
      s"SQ8 lost a well-separated top-10 neighbor: ${exact10 -- got}")
    // the compression contract: every code an integer in [-127, 127]
    val scales = Sq.fitScales(emb, "embedding")
    val codes = emb.crossJoin(broadcast(scales))
      .select(Sq.encode(col("embedding"), col("scales")).as("c"))
      .collect().map(_.getSeq[Double](0))
    assert(codes.forall(_.forall(v => v == math.rint(v) && v.abs <= 127.0)))
  }

  test("C25: PQ ADC recall@20 improves with re-rank; codes are m ints per vector") {
    val emb = Tables.load(spark, sf, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 20)
      .collect().map(_.getLong(0)).toSet
    val model = Pq.fit(emb, "vec_id", "embedding", m = 8, codewords = 16, iters = 2)
    val codes = Pq.encode(emb, "vec_id", "embedding", model)
    // the compression contract: one code per subspace, every code a
    // valid codebook index
    val rows = codes.collect()
    assert(rows.forall(_.getSeq[Int](1).size == 8))
    assert(rows.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < 16)))
    def recall(rerank: Int): Double = {
      val got = Pq.topK(emb, "vec_id", "embedding", codes, model, 0L, 20, rerank)
        .collect().map(_.getLong(0)).toSet
      (exact & got).size / 20.0
    }
    val adcOnly = recall(0)
    val reranked = recall(100)
    // measured 0.50 / 0.95 with the L2-fit codebooks (the cosine-fit
    // ones measured 0.40 / 0.85 — the train/serve metric must match)
    info(f"recall@20: adc-only=$adcOnly%.2f reranked(100)=$reranked%.2f")
    assert(adcOnly >= 0.40, s"ADC-only recall@20 degraded to $adcOnly")
    assert(reranked >= 0.80, s"reranked recall@20 degraded to $reranked")
    assert(reranked >= adcOnly,
      s"re-rank must not lose recall: $reranked < $adcOnly")
    // exact re-rank over the full corpus must reproduce brute force
    val full = Pq.topK(emb, "vec_id", "embedding", codes, model, 0L, 20,
      rerank = rows.length)
      .collect().map(_.getLong(0)).toSet
    assert(full == exact, "full re-rank must equal brute force")
  }

  test("C25d: OPQ lifts ADC-only recall on an anisotropic corpus; rotation is orthogonal") {
    import spark.implicits._
    // A corpus with structure for the rotation to exploit: an
    // exponentially decaying per-dimension spectrum, AXIS-ALIGNED, so
    // plain PQ's arbitrary slicing gives subspace 0 nearly all the
    // energy (16 codewords can't code it) while the last subspaces
    // spend theirs on noise — the classic energy-imbalance failure OPQ
    // exists to fix (Ge et al. §1). Measured across seeds in a numpy
    // reference, the gap is +0.08..+0.16 recall. The real testdata
    // embeddings are near-isotropic (eigen spread ~4:1, energy evenly
    // mixed) where NO rotation can help — measured there, OPQ ~= PQ,
    // the correct no-op — so the lift is pinned on data shaped like
    // real text/image embeddings (decaying spectra are the norm).
    val d = 64; val n = 1200
    val rnd = new java.util.Random(7)
    val specDecay = Array.tabulate(d)(i => math.exp(-i / 5.0))
    val data = Array.fill(n)(
      Array.tabulate(d)(i => rnd.nextGaussian() * specDecay(i)))
    val emb = data.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("vec_id", "embedding")
      .repartition(4).persist()
    emb.count()
    val queries = (0L until 10L).toSeq
    val exactTop = queries.map(q =>
      q -> Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 20)
        .collect().map(_.getLong(0)).toSet).toMap
    def meanRecall(top: Long => Set[Long]): Double =
      queries.map(q => (exactTop(q) & top(q)).size / 20.0).sum / queries.size
    val (pqModel, pqCodes) =
      Pq.build(emb, "vec_id", "embedding", m = 8, codewords = 16, iters = 2)
    val plain = meanRecall(q =>
      Pq.topK(emb, "vec_id", "embedding", pqCodes, pqModel, q, 20, rerank = 0)
        .collect().map(_.getLong(0)).toSet)
    val (opqModel, opqCodes) = Pq.buildOpq(emb, "vec_id", "embedding",
      m = 8, codewords = 16, iters = 2, opqIters = 3)
    val opq = meanRecall(q =>
      Pq.topKOpq(emb, "vec_id", "embedding", opqCodes, opqModel, q, 20)
        .collect().map(_.getLong(0)).toSet)
    info(f"ADC-only mean recall@20 over ${queries.size} queries: " +
      f"plain=$plain%.2f opq=$opq%.2f")
    // same m, same k, same code bytes — the rotation alone must buy a
    // material lift on this corpus (numpy reference gap: +0.08..+0.16)
    assert(opq >= plain + 0.05,
      f"OPQ did not lift ADC-only recall: plain=$plain%.2f opq=$opq%.2f")
    // the learned rotation is orthogonal: R·Rᵀ = I
    val r = opqModel.rotation
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(t => r(i)(t) * r(j)(t)).sum
      val expect = if (i == j) 1.0 else 0.0
      // tolerance: the polar solve goes through MᵀM (condition number
      // squared), and this corpus's spectrum is steep — 1e-6 is ample
      // for "is a rotation" while allowing that amplification
      assert(math.abs(dot - expect) < 1e-6,
        f"R Rᵀ[$i,$j] = $dot%.9f, expected $expect")
    }
    // full-corpus exact re-rank through the OPQ path equals brute force
    // (rotation must not disturb the exact stage)
    val full = Pq.topKOpq(emb, "vec_id", "embedding", opqCodes, opqModel,
      0L, 20, rerank = n).collect().map(_.getLong(0)).toSet
    assert(full == exactTop(0L), "full re-rank through OPQ must equal brute force")
    pqCodes.unpersist(); opqCodes.unpersist(); emb.unpersist()
  }

  test("C25b: IVF-PQ recall tracks its IVF ceiling; full probe + full re-rank is exact") {
    val emb = Tables.load(spark, sf, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 20)
      .collect().map(_.getLong(0)).toSet
    val index = Pq.buildIvf(emb, "vec_id", "embedding",
      numCells = 16, m = 8, codewords = 16, iters = 2)
    def recall(np: Int, rr: Int): Double = {
      val got = index.topK(emb, "embedding", 0L, 20, np, rr)
        .collect().map(_.getLong(0)).toSet
      (exact & got).size / 20.0
    }
    val probed = recall(4, 100)
    info(f"recall@20 nprobe=4 rerank=100: $probed%.2f")
    // bounded by the probe (cell misses can't be re-ranked back): the
    // plain-IVF nprobe=4 ceiling measured 0.80 on this corpus, and the
    // measured IVF-PQ figure EQUALS it — the exact re-rank recovers all
    // quantization distortion inside the probed cells
    assert(probed >= 0.70, s"IVF-PQ recall@20 degraded to $probed")
    val full = recall(16, emb.count().toInt)
    assert(full == 1.0, s"full probe + full re-rank must be exact, got $full")
    index.unpersist()
  }

  test("B23b: approx_percentile tracks the exact percentiles per group") {
    val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val exact = li.groupBy("l_returnflag")
      .agg(percentile(col("l_quantity"), lit(0.5)).as("p50"),
           percentile(col("l_extendedprice"), lit(0.9)).as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = graft.queries.Relational.approxPercentileRaw(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (flag, (p50, p90)) =>
      val (ap50, ap90) = approx(flag)
      // accuracy=10000 → ~0.01% rank error; 1% value tolerance is generous
      assert(math.abs(ap50 - p50) <= math.max(1e-9, 0.01 * p50), s"$flag p50 $ap50 vs $p50")
      assert(math.abs(ap90 - p90) <= math.max(1e-9, 0.01 * p90), s"$flag p90 $ap90 vs $p90")
    }
  }

  test("B23b: the r20 rank gate agrees with the interpolated-quantile gate") {
    // the gate's r20 form counts ranks against the ±0.01 window in
    // integer space instead of four exact value-map percentiles; both
    // formulations must certify the accuracy-10000 sketch on the real
    // corpus (every verdict TRUE, counts exact)
    val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val gate = graft.queries.Relational
      .qApproxPercentile(spark, "/root/testdata/sf0.01").collect()
    assert(gate.nonEmpty)
    gate.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3),
        s"rank gate failed for ${r.getString(0)}: $r")
    }
    val oldGate = li.groupBy("l_returnflag")
      .agg(
        approx_percentile(col("l_quantity"), lit(0.5), lit(10000)).as("ap50"),
        approx_percentile(col("l_extendedprice"), lit(0.9), lit(10000)).as("ap90"),
        percentile(col("l_quantity"), lit(0.49)).as("lo50"),
        percentile(col("l_quantity"), lit(0.51)).as("hi50"),
        percentile(col("l_extendedprice"), lit(0.89)).as("lo90"),
        percentile(col("l_extendedprice"), lit(0.91)).as("hi90"))
      .collect()
    oldGate.foreach { r =>
      assert(r.getDouble(1) >= r.getDouble(3) && r.getDouble(1) <= r.getDouble(4),
        s"old p50 gate failed for ${r.getString(0)}")
      assert(r.getDouble(2) >= r.getDouble(5) && r.getDouble(2) <= r.getDouble(6),
        s"old p90 gate failed for ${r.getString(0)}")
    }
  }

  /** Two different claims, separately pinned. (1) EXACTNESS: the
    * pigeonhole banding finds exactly the pairs within hamming ≤ 3 of
    * the 64-bit signatures — verified against a brute-force all-pairs
    * hamming scan. That is the operator's contract and it holds with
    * zero error. (2) CHARACTERIZATION: signature distance is a poor
    * proxy for 3-gram Jaccard on THIS template-generated corpus —
    * measured at sf0.01: 1034 emitted pairs, recall 0.16 and precision
    * 0.004 against the Jaccard≥0.5 oracle, mean exact Jaccard 0.005.
    * Template docs share token DISTRIBUTIONS (simhash votes over
    * distinct tokens collide) while sharing few 3-gram sequences; and
    * a handful of token swaps flips >3 bits, so most true near-dups
    * sit outside hamming 3. This explains the 1034-vs-25 pair-count
    * gap in the correctness run: use MinHash banding when the target
    * measure is n-gram Jaccard; simhash pairs dedup signature space. */
  test("C3b: simhash pairs equal brute-force hamming<=3; Jaccard agreement measured") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val sigs = Dedup.simhash(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs
      if ida < idb && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ida, idb)).toSet
    val emitted = Dedup.simhashPairs(docs, "text", "doc_id", maxDist = 3)
    val got = emitted.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute,
      s"banding missed ${(brute -- got).size}, fabricated ${(got -- brute).size}")

    val oracle = Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = Dedup.exactJaccardForPairs(docs, "text", "doc_id", emitted)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val recall = (got & oracle).size.toDouble / oracle.size
    val precision = verified.count(_._2 >= 0.5).toDouble / verified.size
    val meanJ = verified.map(_._2).sum / verified.size
    info(f"emitted=${got.size} recall=$recall%.3f precision@J0.5=$precision%.3f meanJ=$meanJ%.3f")
    // deterministic corpus → pin the measured operating point (loose
    // bands so a regenerated-but-same-recipe corpus stays green)
    assert(recall >= 0.10 && recall <= 0.40, f"recall $recall%.3f left its pinned band")
    assert(precision <= 0.05, f"precision $precision%.3f — expected LOW on template text")
    assert(meanJ <= 0.05, f"meanJ $meanJ%.3f — emitted pairs should be Jaccard-unlike")
  }

  test("C2f: minhash signature agreement estimates Jaccard within theory bounds") {
    // For each oracle near-dup pair, the fraction of agreeing minhash
    // rows is an unbiased Jaccard estimator with sd sqrt(J(1-J)/k).
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty)
    val k = 32
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", numHashes = k)
      .collect().map(r => r.getLong(0) ->
        (1 to k).map(i => r.getLong(i)).toArray).toMap
    val errs = exact.map { case ((a, b), j) =>
      val est = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toDouble / k
      math.abs(est - j)
    }
    val mae = errs.sum / errs.size
    info(f"pairs=${errs.size} meanAbsErr=$mae%.4f maxAbsErr=${errs.max}%.4f")
    // planted dups sit at J≈0.99 where sd ≈ 0.018; 4-sigma-ish bands
    assert(mae <= 0.08, f"mean abs error $mae%.4f exceeds the k=32 bound")
    assert(errs.max <= 0.25, f"max abs error ${errs.max}%.4f — estimator broken")
  }

  test("B22b: union of daily HLL sketches tracks the exact total distinct") {
    val events = Tables.load(spark, sf, "events")
    val exact = events.select(countDistinct("user_id")).head().getLong(0)
    val viaSketches = graft.queries.Relational.approxDistinctRollupRaw(spark, sf)
      .head().getLong(1)
    val err = math.abs(viaSketches - exact).toDouble / exact
    // lgConfigK default 12 → rse ~1.6%/sqrt? use a conservative 10%
    assert(err <= 0.10, s"sketch-rollup error $err (exact=$exact approx=$viaSketches)")
  }

  test("B22: HLL approx distinct is within the advertised error bound") {
    val events = Tables.load(spark, sf, "events")
    val exact = events.select(countDistinct("user_id")).head().getLong(0)
    // default rsd = 0.05; 3 sigma ≈ 15% is a conservative flake-free bound
    val approx = events.select(approx_count_distinct("user_id")).head().getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.15, s"HLL error $err (exact=$exact approx=$approx)")
  }
}
