package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY.md §2 C5–C6).
  *
  * Scale design (100 TB): brute force broadcasts only the query vectors
  * (tiny) and streams the corpus — a map-only scan, no shuffle. The LSH
  * path buckets vectors by random-hyperplane sign bits so the pair join
  * shuffles on bucket keys and never goes all-pairs.
  */
object Similarity {

  /** C5 — brute-force cosine top-k against one query vector (by id).
    * The single-row query side is broadcast; scoring is a map-only
    * codegen'd pass over the corpus, then a TakeOrderedAndProject. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int): DataFrame = {
    val v = toDoubles(col(vecCol))
    val corpus = emb.select(col(idCol), v.as("v")).filter(col(idCol) =!= queryId)
    // limit(1) guards against duplicate queryId rows multiplying the
    // corpus through the cross join
    val query  = emb.filter(col(idCol) === queryId).select(v.as("qv")).limit(1)
    corpus.join(broadcast(query))
      .select(col(idCol), round(cosineNative(col("v"), col("qv")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic random hyperplanes (seeded driver-side, broadcast as
    * literals into the plan — no RNG at execution time). */
  private def hyperplanes(dim: Int, bits: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** The same seeded gaussians rounded to 1e-6 integer weights — the
    * ENGINE-PORTABLE plane set (`portablePlanes = true` in
    * [[lshCosinePairs]]). Public so an oracle/mirror generator embeds
    * the IDENTICAL literals the plan broadcasts: with integer weights
    * and 1e-6-quantized coordinates, every sign bit is an integer
    * comparison no engine's float summation order can flip. Rounding
    * a gaussian to 6 decimals perturbs each direction by < 1e-6
    * relative — hashing-quality-neutral. */
  def quantizedHyperplanes(dim: Int, bits: Int, seed: Long): Seq[Array[Long]] =
    hyperplanes(dim, bits, seed).map(_.map(x => math.round(x * 1e6)))

  /** C6 — LSH-bucketed ANN with `tables` independent hash tables of
    * `bits` sign-of-dot-product hyperplane bits each (multi-table LSH:
    * recall = 1-(1-p^bits)^tables for collision prob p = 1-θ/π).
    *
    * The hyperplanes are a broadcast dimension table — each (vector,
    * plane) dot product is one codegen'd `zip_with`/`aggregate` over
    * attribute arrays, never a literal array captured inside a lambda
    * (which Catalyst re-evaluates per element). Norms are computed once
    * per vector and carried through the pair join, so the per-pair work
    * is a single dot product. Cosine pairs are computed only within
    * (table, bucket) groups — the shuffle key — and deduplicated across
    * tables; the plan never contains an all-pairs join. */
  def lshCosinePairs(spark: SparkSession, emb: DataFrame, idCol: String,
                     vecCol: String, bits: Int = 6, tables: Int = 6,
                     dim: Int = 64, threshold: Double = 0.4,
                     seed: Long = 42L,
                     portablePlanes: Boolean = false): DataFrame = {
    import spark.implicits._
    val base = emb
      .select(col(idCol), toDoubles(col(vecCol)).as("v"))
      // fail fast on a dim mismatch: zip_with against a shorter/longer
      // hyperplane null-pads, every dot goes null, and all vectors
      // land in bucket 0 of every table — a silent all-pairs blow-up.
      // The assert lives in a filter so Catalyst cannot prune it; it
      // costs one codegen'd comparison per row and no extra job.
      .filter(assert_true(size(col("v")) === lit(dim),
        lit(s"lshCosinePairs: embedding length != dim=$dim — pass the " +
          "actual vector dimension")).isNull)
      .withColumn("nrm", l2Norm(col("v")))
    // portablePlanes: sign bits from integer dot products over the
    // quantized plane/coordinate grid ([[quantizedHyperplanes]]) —
    // bucket assignment replays bit-identically on any engine. |qx| ≤
    // ~1e6, |qw| ≤ ~6e6 (gaussian tail), so each product < 1e13 and
    // the 64-dim sum < 1e15 — inside int64. The pair COSINE below is
    // float either way (round4 output, the C5-proven comparison).
    val sigs = if (portablePlanes) {
      val planesDf = quantizedHyperplanes(dim, bits * tables, seed).zipWithIndex
        .map { case (p, i) => (i / bits, i % bits, p) }
        .toDF("tbl", "bit", "qw")
      base
        .withColumn("qv",
          transform(col("v"), x => round(x * 1e6, 0).cast("bigint")))
        .join(broadcast(planesDf))
        .select(col(idCol), col("tbl"),
          when(aggregate(zip_with(col("qv"), col("qw"), (x, w) => x * w),
            lit(0L), (acc, z) => acc + z) >= 0L,
            expr("shiftleft(1L, bit)")).otherwise(0L).as("b"))
        .groupBy(col(idCol), col("tbl"))
        .agg(sum("b").as("bucket"))
    } else {
      val planesDf = hyperplanes(dim, bits * tables, seed).zipWithIndex
        .map { case (p, i) => (i / bits, i % bits, p) }
        .toDF("tbl", "bit", "w")
      base
        .join(broadcast(planesDf))
        .select(col(idCol), col("tbl"),
          when(dot(col("v"), col("w")) >= 0.0,
            expr("shiftleft(1L, bit)")).otherwise(0L).as("b"))
        .groupBy(col(idCol), col("tbl"))
        .agg(sum("b").as("bucket"))
    }
    // Materialize the signed/bucketed relation once: both sides of the
    // pair join read it, and without a cut Catalyst plans the whole
    // plane-join + signature-agg subtree twice. localCheckpoint keeps
    // the blocks on executors (GC-reclaimed); a long-lived cluster
    // pipeline would use a reliable checkpoint/table instead.
    val bucketed = sigs.join(base, idCol).localCheckpoint()
    val a = bucketed.select(col("tbl"), col("bucket"),
      col(idCol).as("id_a"), col("v").as("va"), col("nrm").as("nrm_a"))
    val b = bucketed.select(col("tbl"), col("bucket"),
      col(idCol).as("id_b"), col("v").as("vb"), col("nrm").as("nrm_b"))
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosineNative(col("va"), col("vb")), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }

  /** C33 — HARD-NEGATIVE mining for contrastive/retrieval training:
    * per query vector, the `k` most-similar corpus items that are NOT
    * near-duplicates (cosine below `dupThreshold`) and not the query
    * itself — similar enough to be informative negatives, distinct
    * enough not to be false negatives (the standard mining recipe
    * behind dense-retriever and embedding-model training sets).
    *
    * Scale shape: the query side is a training batch — tiny — so the
    * brute-force default BROADCASTS the queries and scores the corpus
    * in one map-only codegen'd pass (same stance as
    * [[bruteForceTopK]]); only (query_id, cand_id, cosine) survivors
    * reach the per-query ranking window, whose partition key is the
    * query id. At corpus scales where even one scoring scan is too
    * much, pass `candidates` — (query_id, cand_id) pairs from an ANN
    * probe ([[graft.queries.DocQueries.ivfIndex]]'s `Ivf.topK`, LSH
    * buckets) — and only those pairs are scored: the window then sees
    * at most |candidates| rows, bounded by the probe's nprobe·cell
    * budget per query. Ranking orders by the ROUNDED cosine (ties
    * broken by candidate id) so rank is reproducible across engines —
    * the same contract as the top-k query. */
  def hardNegatives(emb: DataFrame, idCol: String, vecCol: String,
                    queries: DataFrame, k: Int = 3,
                    dupThreshold: Double = 0.95,
                    candidates: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"),
      toDoubles(col(vecCol)).as("qv"))
    val corpus = emb.select(col(idCol).as("cand_id"),
      toDoubles(col(vecCol)).as("v"))
    val paired = candidates match {
      case None => corpus.join(broadcast(q))
      // ANN probes can emit the same (query, candidate) pair from several
      // cells/tables — dedup before scoring, or row_number ranks the same
      // candidate twice and the top-k displaces genuine negatives.
      case Some(c) => c.select(col("query_id"), col("cand_id")).distinct()
        .join(corpus, "cand_id").join(broadcast(q), "query_id")
    }
    val scored = paired
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosineNative(col("v"), col("qv")), 4).as("cosine"))
      .filter(col("cosine") < dupThreshold)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** C56 — MMR (maximal marginal relevance, Carbonell & Goldstein '98)
    * diversified top-k: greedily pick the candidate maximizing
    * `λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)` — the relevance/diversity
    * re-ranker behind diverse RAG retrieval and diverse training-sample
    * selection (a pure-relevance top-k returns k near-copies of the
    * same document; MMR forces coverage).
    *
    * Scale shape — retrieve distributed, re-rank bounded: the corpus
    * pass is [[bruteForceTopK]]'s map-only broadcast-query scoring
    * scan keeping only the top `poolSize` candidates (TakeOrdered —
    * never a global sort); at 100 TB pass `candidates` — ids from an
    * ANN probe (`Ivf.topK`, PQ ADC, LSH buckets — the
    * [[hardNegatives]] pattern) — and only those rows are scored and
    * pooled, so the scan touches probe output instead of the corpus.
    * The greedy loop then runs over that ≤poolSize×dim pool on the driver,
    * a BOUNDED-BY-CONSTRUCTION collect (the IVF-centroid stance, and
    * how every production re-ranker works: selection is inherently
    * sequential — k dependent argmaxes — so distributing it would buy
    * k scheduler round-trips, not parallelism). Determinism: all
    * similarities round to 4 decimals before comparison, ties break on
    * candidate id — reproducible on any engine, layout or float order.
    * Rows-only (the greedy chain isn't one SQL statement); MmrSpec in
    * OperatorsSpec pins first-pick relevance, duplicate displacement,
    * the λ=1 pure-relevance limit, and determinism. */
  def mmrTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
              k: Int = 10, lambda: Double = 0.7,
              poolSize: Int = 100,
              candidates: Option[DataFrame] = None): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0,1]")
    val spark = emb.sparkSession
    import spark.implicits._
    val v = toDoubles(col(vecCol))
    val query = emb.filter(col(idCol) === queryId).select(v.as("qv")).limit(1)
    val corpus = candidates match {
      case None => emb.select(col(idCol), v.as("v"))
      // ANN probes can emit a candidate from several cells/tables —
      // the left_semi dedups and prunes in one keyed join, so the
      // scoring scan touches only probe output, never the corpus.
      case Some(c) =>
        val cand = c.select(
          col(if (c.columns.contains(idCol)) idCol else c.columns.head)
            .cast("long").as(idCol))
        emb.select(col(idCol), v.as("v")).join(cand, Seq(idCol), "left_semi")
    }
    val pool = corpus
      .filter(col(idCol) =!= queryId)
      .join(broadcast(query))
      .select(col(idCol), col("v"),
        round(cosineNative(col("v"), col("qv")), 4).as("rel"))
      .orderBy(col("rel").desc, col(idCol))
      .limit(poolSize)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    def cos4(a: Array[Double], b: Array[Double]): Double = {
      // ragged input guard: score only the shared prefix (the HOF
      // zip_with stance — a length mismatch must not throw mid-rank)
      val n = math.min(a.length, b.length)
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      val c = if (na == 0.0 || nb == 0.0) 0.0 else d / math.sqrt(na * nb)
      BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val maxSim = scala.collection.mutable.HashMap.empty[Long, Double]
    val remaining = scala.collection.mutable.LinkedHashMap(
      pool.map(p => p._1 -> p): _*)
    val picked = Seq.newBuilder[(Long, Long, Double, Double)]
    var rank = 1L
    while (rank <= k && remaining.nonEmpty) {
      val best = remaining.values.map { case (id, vec, rel) =>
        val div = maxSim.getOrElse(id, 0.0)
        val score = BigDecimal(lambda * rel - (1 - lambda) * div)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, vec, rel, score)
      }.reduceLeft((a, b) =>
        if (b._4 > a._4 || (b._4 == a._4 && b._1 < a._1)) b else a)
      picked += ((rank, best._1, best._3, best._4))
      remaining.remove(best._1)
      remaining.values.foreach { case (id, vec, _) =>
        val s = cos4(vec, best._2)
        // true SIGNED max over the selected set (Carbonell–Goldstein):
        // a candidate anti-correlated with everything picked keeps its
        // negative max-sim, so the penalty term BOOSTS it rather than
        // clamping at 0. maxSim has an entry for every remaining id
        // after the first pick, so the seed is the first similarity.
        val cur = maxSim.get(id)
        if (cur.isEmpty || s > cur.get) maxSim(id) = s
      }
      rank += 1
    }
    picked.result().toDF("rk", idCol, "relevance", "mmr_score")
  }

  /** ENGINE-PORTABLE MMR — the C81 integer-bilinear recipe applied to
    * the greedy re-ranker, so the whole selection chain replays
    * bit-identically in an independent engine (a DuckDB recursive CTE
    * mirrors it, which is what promoted the gate to hash-green):
    *
    *  - similarity is the INTEGER bilinear form `Σ qa_i·qb_i` over
    *    1e-6-quantized vectors (plan-side `round`, the Pq portable
    *    stance) — monotone with the dot product, so the MMR semantics
    *    (relevance vs redundancy-to-selected) are unchanged; on
    *    near-unit-norm embedding corpora it ranks like cosine;
    *  - λ is the exact rational `lambdaNum / lambdaDen` and the score
    *    is the integer `lambdaNum·rel − (lambdaDen−lambdaNum)·maxdiv`
    *    (the div-free argmax form — same winner, no division floor);
    *  - every argmax ties to the lowest candidate id.
    *
    * [[mmrTopK]] (round4 float cosine) stays the general path for
    * corpora whose norms vary. Same retrieve-distributed/re-rank-
    * bounded shape: one map-only integer scoring scan + TakeOrdered
    * pool cut, then a pool-sized driver greedy. Overflow: 64 dims ×
    * (4e6)² ≤ 1e15 per dot, ×lambdaNum ≤ 7e15 — inside int64.
    * Output: (rk, idCol, qrel, mmr_qscore) — all bigint. */
  def mmrTopKPortable(emb: DataFrame, idCol: String, vecCol: String,
                      queryId: Long, k: Int = 10, poolSize: Int = 100,
                      lambdaNum: Long = 7L, lambdaDen: Long = 10L): DataFrame = {
    require(k >= 1 && poolSize >= k, s"need poolSize=$poolSize >= k=$k >= 1")
    require(lambdaDen > 0 && lambdaNum >= 0 && lambdaNum <= lambdaDen,
      s"lambda = $lambdaNum/$lambdaDen must lie in [0,1]")
    val spark = emb.sparkSession
    import spark.implicits._
    val pool = mmrQuantPool(emb, idCol, vecCol, queryId, poolSize)
    if (pool.isEmpty)
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("rk", idCol, "qrel", "mmr_qscore")
    def qdot(a: Array[Long], b: Array[Long]): Long = {
      val n = math.min(a.length, b.length)
      var s = 0L
      var i = 0
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    val divNum = lambdaDen - lambdaNum
    val maxSim = scala.collection.mutable.HashMap.empty[Long, Long]
    val remaining = scala.collection.mutable.LinkedHashMap(
      pool.map(p => p._1 -> p): _*)
    val picked = Seq.newBuilder[(Long, Long, Long, Long)]
    var rank = 1L
    while (rank <= k && remaining.nonEmpty) {
      val best = remaining.values.map { case (id, _, rel) =>
        (id, lambdaNum * rel - divNum * maxSim.getOrElse(id, 0L))
      }.reduceLeft((a, b) =>
        if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a)
      val bestVec = remaining(best._1)._2
      picked += ((rank, best._1, remaining(best._1)._3, best._2))
      remaining.remove(best._1)
      remaining.values.foreach { case (id, vec, _) =>
        val s = qdot(vec, bestVec) // signed max, the mmrTopK stance
        val cur = maxSim.get(id)
        if (cur.isEmpty || s > cur.get) maxSim(id) = s
      }
      rank += 1
    }
    picked.result().toDF("rk", idCol, "qrel", "mmr_qscore")
  }

  /** Shared retrieve step of the portable MMR chain: the 1e-6
    * quantized query-relevance scan + TakeOrdered pool cut. Returns
    * (id, quantized vector, integer qrel) for the top `poolSize`
    * candidates by (qrel DESC, id) — empty when the query id is
    * absent. This is the ONLY distributed pass; everything after it
    * is pool-sized. */
  private def mmrQuantPool(emb: DataFrame, idCol: String, vecCol: String,
                           queryId: Long, poolSize: Int): Array[(Long, Array[Long], Long)] = {
    val qv = transform(toDoubles(col(vecCol)),
      x => round(x * 1e6, 0).cast("bigint"))
    val base = emb.select(col(idCol), qv.as("qv"))
    val qRows = base.filter(col(idCol) === queryId).limit(1)
      .select(col("qv")).collect()
    if (qRows.isEmpty) return Array.empty
    val qlit = typedLit(qRows.head.getSeq[Long](0).toSeq)
    // ragged guard: coalesce, so a length mismatch scores the shared
    // prefix instead of nulling the whole sum (zip_with pads with null)
    base.filter(col(idCol) =!= queryId)
      .select(col(idCol), col("qv"),
        aggregate(zip_with(col("qv"), qlit, (a, b) => coalesce(a * b, lit(0L))),
          lit(0L), (s, x) => s + x).as("qrel"))
      .orderBy(col("qrel").desc, col(idCol))
      .limit(poolSize)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
  }

  /** C91 — margin-based bitext mining (Artetxe & Schwenk '19, the
    * CCMatrix/NLLB recipe): for every SOURCE-language vector, its best
    * TARGET-language neighbor is mined as a translation pair only when
    * it beats the runner-up by a margin — absolute similarity alone
    * mines hubs (a vector near everything), the margin criterion is
    * what makes web-scale parallel-corpus mining precise.
    *
    * ENGINE-PORTABLE by the C56p construction: similarity is the
    * integer bilinear form over 1e-6-quantized vectors, the margin is
    * the exact rational `marginNum/marginDen` tested in cross-
    * multiplied integer form — `mined ⟺ s1 > 0 ∧ 2·den·s1 ≥
    * num·(s1+s2)` (the ratio margin `2·s1/(s1+s2) ≥ num/den` with no
    * division; `s1 > 0` guards the sign flip a negative denominator
    * would cause, and a source with NO runner-up mines on `s1 > 0`
    * alone). Every decision an integer → the relation SQL-oracles.
    *
    * Emits EVERY source's best pair with its `mined` verdict (the
    * operating-curve stance — precision/recall trade-offs read off the
    * margin column, not a silent filter): (src_id, tgt_id, qsim,
    * qsim2, mined).
    *
    * Scale shape: the scored relation is src × tgt — at gate scale a
    * direct crossJoin; at 100 TB pass `candidates` — (src_id, tgt_id)
    * pairs from an ANN probe (IVF probe / LSH buckets, the
    * [[hardNegatives]] pattern) — and ONLY those pairs are scored:
    * two keyed joins attach the vectors, so the scoring pass touches
    * |candidates| rows instead of |src|·|tgt| (quadratic → probe-
    * bounded; the margin arithmetic is identical, and on corpora
    * whose probe covers each source's true top-2 the output is
    * bit-identical to the brute config — spec-pinned). The per-source
    * top-2 is a rank ≤ 2 window — WindowGroupLimit keeps map-side
    * partial top-2s, so the shuffle carries ~2 rows per (source, map
    * partition), never the pair relation. Forward direction only;
    * [[mineBitextSymmetric]] composes both directions.
    *
    * Overflow: |qsim| ≤ dims·(4e6)² ≤ 1e15 at 64 dims; ×(2·den) stays
    * inside int64 for den ≤ ~4000 (required). */
  def mineBitext(emb: DataFrame, idCol: String, vecCol: String,
                 labels: DataFrame, labelIdCol: String, langCol: String,
                 srcLang: String, tgtLang: String,
                 marginNum: Long = 105L, marginDen: Long = 100L,
                 candidates: Option[DataFrame] = None): DataFrame = {
    val scored = bitextScored(emb, idCol, vecCol, labels, labelIdCol,
      langCol, srcLang, tgtLang, candidates)
    marginBest(scored, marginNum, marginDen, keyCol = "src_id",
      bestCol = "tgt_id")
  }

  /** Symmetric bitext mining: a pair survives only when it is the
    * forward best of its source AND the backward best of its target —
    * the "run twice and intersect" recipe over ONE shared scored
    * relation (both direction windows read the same src×tgt integer
    * sims definition; each direction's rank ≤ 2 window group-limits
    * map-side, so neither shuffle carries the pair relation — the
    * scoring subtree executes once per direction, which at scale beats
    * materializing the quadratic relation between them; with
    * `candidates` both passes are probe-bounded). Emits the mutual-
    * best pairs with both margins: (src_id, tgt_id, qsim, qsim2_fwd,
    * qsim2_bwd, mined) where mined = fwd margin ∧ bwd margin. */
  def mineBitextSymmetric(emb: DataFrame, idCol: String, vecCol: String,
                          labels: DataFrame, labelIdCol: String,
                          langCol: String, srcLang: String, tgtLang: String,
                          marginNum: Long = 105L, marginDen: Long = 100L,
                          candidates: Option[DataFrame] = None): DataFrame = {
    // probe-bounded scored relations are candidate-sized — materialize
    // once so the two direction windows don't each re-run the probe +
    // scoring subtree (r19). The BRUTE config stays lazy: its scored
    // relation is quadratic, and re-computing per direction is the
    // documented scale trade.
    val scored0 = bitextScored(emb, idCol, vecCol, labels, labelIdCol,
      langCol, srcLang, tgtLang, candidates)
    val scored = if (candidates.isDefined) scored0.localCheckpoint() else scored0
    val fwd = marginBest(scored, marginNum, marginDen,
      keyCol = "src_id", bestCol = "tgt_id")
    val bwd = marginBest(scored, marginNum, marginDen,
      keyCol = "tgt_id", bestCol = "src_id")
      .select(col("src_id"), col("tgt_id"),
        col("qsim2").as("qsim2_bwd"), col("mined").as("__mined_bwd"))
    fwd.withColumnRenamed("qsim2", "qsim2_fwd")
      .join(bwd, Seq("src_id", "tgt_id"))
      .select(col("src_id"), col("tgt_id"), col("qsim"),
        col("qsim2_fwd"), col("qsim2_bwd"),
        (col("mined") && col("__mined_bwd")).as("mined"))
  }

  /** The ANN candidate relation for probe-bounded bitext mining — the
    * `candidates` input [[mineBitext]] / [[mineBitextSymmetric]]
    * document as the 100 TB path, built from the ENGINE-PORTABLE IVF
    * quantizer ([[Ivf.seedCentroids]] + [[Ivf.assignCellsPortable]])
    * so the probe itself SQL-oracles: target-language vectors are
    * assigned to seeded integer cells ONCE (the offline index half of
    * the build/serve split), each source vector ranks the cell seeds
    * by integer L2 and probes its `nprobe` nearest cells, and the
    * candidate pairs are `(src, every target in a probed cell)` — two
    * keyed joins, never src × tgt.
    *
    * `numCells = 0` auto-sizes to `ceil(sqrt(nprobe · |tgt|))` — the
    * balance point of the probe's two costs (|src|·numCells cell ranks
    * vs ~nprobe·|src|·|tgt|/numCells candidate scores), so the scored
    * relation grows ~n^1.5 where the brute config grows n². One count
    * job on the target slice; pass an explicit `numCells` to skip it.
    *
    * Probe-bounded semantics (C86's operating-curve stance): a pair
    * whose target lies outside the source's probed cells is invisible,
    * so `mined` verdicts are relative to the probe — measure the probe
    * width on YOUR corpus with [[Ivf.probeRecallCurve]] before gating.
    * On corpora whose probe covers each source's true top-2 the mined
    * output is bit-identical to the brute config (spec-pinned). */
  def bitextIvfCandidates(emb: DataFrame, idCol: String, vecCol: String,
                          labels: DataFrame, labelIdCol: String,
                          langCol: String, srcLang: String, tgtLang: String,
                          nprobe: Int = 4, numCells: Int = 0): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    require(numCells >= 0, "numCells must be >= 0 (0 = auto)")
    import org.apache.spark.sql.expressions.Window
    val tagged = emb.select(col(idCol), col(vecCol))
      .join(labels.select(col(labelIdCol).as(idCol),
        col(langCol).as("__lang")), Seq(idCol))
    val tgtSlice = tagged.filter(col("__lang") === tgtLang)
      .select(col(idCol), col(vecCol))
    val srcSlice = tagged.filter(col("__lang") === srcLang)
      .select(col(idCol), col(vecCol))
    val cells =
      if (numCells > 0) numCells
      else math.max(1,
        math.ceil(math.sqrt(nprobe.toDouble * tgtSlice.count())).toInt)
    val seeds = Ivf.seedCentroids(tgtSlice, idCol, vecCol, cells)
    val assigned = Ivf.assignCellsPortable(tgtSlice, idCol, vecCol, seeds)
      .select(col(idCol).as("tgt_id"), col("centroid_id").as("__cid"))
    val qq = transform(toDoubles(col(vecCol)),
      x => round(x * 1e6, 0).cast("bigint"))
    // rank ≤ nprobe over the numCells-row per-source cell relation —
    // WindowGroupLimit keeps map-side partial top-nprobe sets
    val probed = srcSlice.select(col(idCol).as("src_id"), qq.as("qq"))
      .crossJoin(broadcast(seeds))
      .select(col("src_id"), col("__cid"),
        aggregate(zip_with(col("qq"), col("qc"), (a, b) => (a - b) * (a - b)),
          lit(0L), (s, x) => s + x).as("__d2"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("src_id").orderBy(col("__d2"), col("__cid"))))
      .filter(col("__rk") <= nprobe)
      .select(col("src_id"), col("__cid"))
    probed.join(assigned, Seq("__cid"))
      .select(col("src_id"), col("tgt_id"))
  }

  /** The probe-width walk's candidate relation WITH its cell rank:
    * (src_id, tgt_id, __rk) to the widest `nprobe` — each target
    * lives in exactly one cell, so `__rk ≤ p` slices out precisely
    * the nprobe-p candidate set ([[bitextIvfCandidates]] re-derived
    * per width was re-seeding, re-assigning and re-ranking the SAME
    * frozen geometry per point). Lets a curve walk SCORE the widest
    * set once and re-slice per point instead of re-scoring per width
    * ([[bitextMinedLadder]] / [[recommendNprobe]]). */
  private def bitextIvfCandidatesRanked(emb: DataFrame, idCol: String,
                                        vecCol: String, labels: DataFrame,
                                        labelIdCol: String, langCol: String,
                                        srcLang: String, tgtLang: String,
                                        maxNprobe: Int,
                                        numCells: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tagged = emb.select(col(idCol), col(vecCol))
      .join(labels.select(col(labelIdCol).as(idCol),
        col(langCol).as("__lang")), Seq(idCol))
    val tgtSlice = tagged.filter(col("__lang") === tgtLang)
      .select(col(idCol), col(vecCol))
    val srcSlice = tagged.filter(col("__lang") === srcLang)
      .select(col(idCol), col(vecCol))
    val seeds = Ivf.seedCentroids(tgtSlice, idCol, vecCol, numCells)
    val assigned = Ivf.assignCellsPortable(tgtSlice, idCol, vecCol, seeds)
      .select(col(idCol).as("tgt_id"), col("centroid_id").as("__cid"))
    val qq = transform(toDoubles(col(vecCol)),
      x => round(x * 1e6, 0).cast("bigint"))
    srcSlice.select(col(idCol).as("src_id"), qq.as("qq"))
      .crossJoin(broadcast(seeds))
      .select(col("src_id"), col("__cid"),
        aggregate(zip_with(col("qq"), col("qc"), (a, b) => (a - b) * (a - b)),
          lit(0L), (s, x) => s + x).as("__d2"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("src_id").orderBy(col("__d2"), col("__cid"))))
      .filter(col("__rk") <= maxNprobe)
      .join(assigned, Seq("__cid"))
      .select(col("src_id"), col("tgt_id"), col("__rk"))
  }

  /** Score a ranked candidate relation once and return (src_id,
    * tgt_id, __rk, qsim) — the multi-width scored relation a curve
    * walk slices per point. qsim is the identical integer bilinear
    * [[bitextScored]] computes; `__rk ≤ p` then yields exactly the
    * scored relation of the nprobe-p probe. */
  private def bitextScoredRanked(emb: DataFrame, idCol: String,
                                 vecCol: String, labels: DataFrame,
                                 labelIdCol: String, langCol: String,
                                 srcLang: String, tgtLang: String,
                                 ranked: DataFrame): DataFrame = {
    val qv = transform(toDoubles(col(vecCol)),
      x => round(x * 1e6, 0).cast("bigint"))
    val tagged = emb.select(col(idCol), qv.as("qv"))
      .join(labels.select(col(labelIdCol).as(idCol),
        col(langCol).as("__lang")), Seq(idCol))
    val src = tagged.filter(col("__lang") === srcLang)
      .select(col(idCol).as("src_id"), col("qv").as("qsrc"))
    val tgt = tagged.filter(col("__lang") === tgtLang)
      .select(col(idCol).as("tgt_id"), col("qv").as("qtgt"))
    ranked
      .join(tgt, Seq("tgt_id")).join(src, Seq("src_id"))
      .select(col("src_id"), col("tgt_id"), col("__rk"),
        aggregate(zip_with(col("qsrc"), col("qtgt"),
          (a, b) => coalesce(a * b, lit(0L))),
          lit(0L), (s, x) => s + x).as("qsim"))
  }

  /** The mined-pair relations of a whole probe-width walk over ONE
    * geometry and ONE scoring pass (r19): candidates ranked to the
    * widest nprobe, scored once, sliced at `__rk ≤ p` per point (the
    * slice IS the nprobe-p probe's scored relation — each target lives
    * in exactly one cell), then each point pays only its top-2 margin
    * window. Output per width = exactly
    * `mineBitext(..., candidates = Some(<nprobe-p candidates>))
    * .filter(mined).select(src_id, tgt_id)`. */
  def bitextMinedLadder(emb: DataFrame, idCol: String, vecCol: String,
                        labels: DataFrame, labelIdCol: String,
                        langCol: String, srcLang: String, tgtLang: String,
                        nprobes: Seq[Int], numCells: Int,
                        marginNum: Long = 105L,
                        marginDen: Long = 100L): Map[Int, DataFrame] = {
    require(nprobes.nonEmpty && nprobes.forall(_ >= 1),
      s"nprobes must be positive: $nprobes")
    require(numCells >= 1, "numCells must be >= 1")
    // same contract as the mineBitext path (bitextScored enforces it
    // there); equal languages would silently self-pair-mine here
    require(srcLang != tgtLang, "source and target language must differ")
    val widths = nprobes.distinct.sorted
    val scoredAll = bitextScoredRanked(emb, idCol, vecCol, labels,
      labelIdCol, langCol, srcLang, tgtLang,
      bitextIvfCandidatesRanked(emb, idCol, vecCol, labels, labelIdCol,
        langCol, srcLang, tgtLang, maxNprobe = widths.max,
        numCells = numCells))
      .localCheckpoint()
    // ONE margin-window pass for the whole walk (r20): each scored row
    // replicates to every width whose cutoff admits it (explode of the
    // admitting widths — ≤ |nprobes| small copies of a probe-bounded
    // relation), and a single window partitioned by (width, src) ranks
    // every slice at once — per width the (rank ≤ 2 → margin) result
    // is exactly marginBest over the `__rk ≤ p` slice, because the
    // per-(width, src) row set IS that slice. The mined relation
    // (≤ |src|·|widths| rows) materializes once so the per-width
    // consumers don't re-run the window per point — 4 window passes
    // over the scored relation → 1.
    val widthsArr = array(widths.map(p => lit(p)): _*)
    val multi = scoredAll
      .select(col("src_id"), col("tgt_id"), col("qsim"),
        explode(filter(widthsArr, p => col("__rk") <= p)).as("__w"))
    val minedAll = marginBest(multi, marginNum, marginDen,
        keyCols = Seq("__w", "src_id"), bestCol = "tgt_id")
      .filter(col("mined"))
      .select(col("__w"), col("src_id"), col("tgt_id"))
      .localCheckpoint()
    widths.map(p => p ->
      minedAll.filter(col("__w") === p)
        .select(col("src_id"), col("tgt_id"))).toMap
  }

  /** One point of the [[recommendNprobe]] curve: mined-pair recall of
    * the `nprobe`-bounded miner against the brute truth on the sample. */
  final case class NprobePoint(nprobe: Int, truthPairs: Long, hits: Long,
                               recall: Double)

  /** The [[recommendNprobe]] verdict: the smallest candidate nprobe
    * whose measured recall clears the target, or None. `curve` holds
    * every point actually measured (ascending nprobe, stops at the
    * first clearing point) and disambiguates the two None cases:
    * None + non-empty curve = a MEASURED "use brute" verdict (the
    * isotropic-corpus case BASELINE.md documents, where no affordable
    * probe width recalls enough); None + EMPTY curve = no sampled
    * sources, nothing was measured — not a recommendation at all. */
  final case class NprobeAdvice(recommended: Option[Int], targetRecall: Double,
                                curve: Seq[NprobePoint])

  /** Close the C101 loop: turn the probe recall CURVE into the knob a
    * 100 TB user actually needs. Runs the curve's own methodology —
    * a deterministic md5-sample of `sampleSize` sources, brute truth
    * restricted to the sample (O(|sample|·|tgt|), fixed work at any
    * corpus size), the index geometry FROZEN at the shipped probe-4
    * auto cell count so only nprobe varies — and walks
    * `candidateNprobes` ascending, returning the FIRST whose mined-
    * pair recall (vs the brute truth, all margin buckets pooled)
    * clears `targetRecall`. When none does, the answer is
    * `recommended = None`: run the brute config (or re-cluster) —
    * on a near-isotropic corpus widening the probe buys little and
    * pretending otherwise would gate real pairs away silently.
    *
    * Cost: one |sample|·|tgt| brute pass, plus ONE probe-bounded
    * scoring pass shared by every measured point (the
    * [[bitextMinedLadder]] fold — geometry, scoring and the margin
    * window all run once at the widest nprobe; per point only a
    * filter of the materialized mined relation and a count remain).
    * The ladder is built lazily, so the nTruth == 0 degenerate case
    * never pays it. Driver state is counts only. */
  def recommendNprobe(emb: DataFrame, idCol: String, vecCol: String,
                      labels: DataFrame, labelIdCol: String, langCol: String,
                      srcLang: String, tgtLang: String,
                      targetRecall: Double = 0.9,
                      candidateNprobes: Seq[Int] = Seq(1, 2, 4, 8),
                      sampleSize: Int = 64,
                      marginNum: Long = 105L,
                      marginDen: Long = 100L): NprobeAdvice = {
    require(candidateNprobes.nonEmpty && candidateNprobes.forall(_ >= 1) &&
      candidateNprobes == candidateNprobes.sorted,
      s"candidateNprobes must be ascending positive: $candidateNprobes")
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall must lie in (0, 1]: $targetRecall")
    val tagged = emb.select(col(idCol), col(vecCol))
      .join(labels.select(col(labelIdCol).as(idCol),
        col(langCol).as("__lang")), Seq(idCol))
    val srcIds = tagged.filter(col("__lang") === srcLang)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(sampleSize).select(col(idCol)).collect().map(_.getLong(0)).toSeq
    // no sources: nothing was measured, so recommending the smallest
    // probe would dress a degenerate case up as a verdict. None with
    // an EMPTY curve is the honest signal (a measured "use brute"
    // verdict is None with a non-empty curve — see [[NprobeAdvice]])
    if (srcIds.isEmpty)
      return NprobeAdvice(None, targetRecall, Seq.empty)
    val restricted = tagged
      .filter(col("__lang") === tgtLang || col(idCol).isin(srcIds: _*))
      .select(col(idCol), col(vecCol))
    val tgtCount = tagged.filter(col("__lang") === tgtLang).count()
    // the SHIPPED probe-4 auto geometry, frozen across curve points —
    // the curve varies nprobe alone (the C101 stance)
    val cellsFixed = math.max(1,
      math.ceil(math.sqrt(4.0 * tgtCount)).toInt)
    def mined(c: Option[DataFrame]) =
      mineBitext(restricted, idCol, vecCol, labels, labelIdCol, langCol,
        srcLang, tgtLang, marginNum, marginDen, candidates = c)
        .filter(col("mined")).select(col("src_id"), col("tgt_id"))
    // ONE frozen geometry AND one scoring pass for every curve point
    // (r19), with the per-point margin windows folded into one pass
    // over the width-exploded scored relation (r20) — per point only a
    // filter of the materialized mined relation remains. LAZY: the
    // nTruth == 0 early-out below never builds the ladder at all.
    lazy val minedLadder = bitextMinedLadder(restricted, idCol, vecCol,
      labels, labelIdCol, langCol, srcLang, tgtLang,
      nprobes = candidateNprobes, numCells = cellsFixed,
      marginNum = marginNum, marginDen = marginDen)
    val truth = mined(None)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nTruth = truth.count()
      val curve = scala.collection.mutable.ArrayBuffer.empty[NprobePoint]
      var recommended: Option[Int] = None
      val it = candidateNprobes.iterator
      while (recommended.isEmpty && it.hasNext) {
        val p = it.next()
        val hits =
          if (nTruth == 0L) 0L
          else truth.join(minedLadder(p),
            Seq("src_id", "tgt_id")).count()
        val recall = if (nTruth == 0L) 1.0 else hits.toDouble / nTruth
        curve += NprobePoint(p, nTruth, hits, recall)
        if (recall >= targetRecall) recommended = Some(p)
      }
      NprobeAdvice(recommended, targetRecall, curve.toSeq)
    } finally { truth.unpersist(); () }
  }

  /** The shared src×tgt integer-bilinear scored relation behind
    * [[mineBitext]] / [[mineBitextSymmetric]]: (src_id, tgt_id, qsim). */
  private def bitextScored(emb: DataFrame, idCol: String, vecCol: String,
                           labels: DataFrame, labelIdCol: String,
                           langCol: String, srcLang: String, tgtLang: String,
                           candidates: Option[DataFrame]): DataFrame = {
    require(srcLang != tgtLang, "source and target language must differ")
    val qv = transform(toDoubles(col(vecCol)),
      x => round(x * 1e6, 0).cast("bigint"))
    val tagged = emb.select(col(idCol), qv.as("qv"))
      .join(labels.select(col(labelIdCol).as(idCol),
        col(langCol).as("__lang")), Seq(idCol))
    val src = tagged.filter(col("__lang") === srcLang)
      .select(col(idCol).as("src_id"), col("qv").as("qsrc"))
    val tgt = tagged.filter(col("__lang") === tgtLang)
      .select(col(idCol).as("tgt_id"), col("qv").as("qtgt"))
    val paired = candidates match {
      // the target-language slice broadcasts: the brute-force config is
      // for corpora whose language slice fits a broadcast (the surface
      // pin rejects a CartesianProduct — rightly); past that the
      // candidates config below is the scale path
      case None => src.crossJoin(broadcast(tgt))
      // ANN probes can emit the same (src, tgt) pair from several
      // cells/tables — dedup before scoring, or the top-2 window ranks
      // one target twice and a margin compares a pair against itself.
      // Keyed joins: the scoring scan touches probe output, never the
      // language slices whole.
      case Some(c) => c.select(col("src_id"), col("tgt_id")).distinct()
        .join(tgt, Seq("tgt_id")).join(src, Seq("src_id"))
    }
    paired.select(col("src_id"), col("tgt_id"),
      aggregate(zip_with(col("qsrc"), col("qtgt"),
        (a, b) => coalesce(a * b, lit(0L))),
        lit(0L), (s, x) => s + x).as("qsim"))
  }

  /** One mining direction over the scored relation: per `keyCol`, the
    * top-2 `qsim` window (ties to the lowest `bestCol`), the best row
    * kept with its runner-up sim and the cross-multiplied integer
    * margin verdict `qsim > 0 ∧ 2·den·qsim ≥ num·(qsim+qsim2)`. */
  private def marginBest(scored: DataFrame, marginNum: Long,
                         marginDen: Long, keyCol: String,
                         bestCol: String): DataFrame =
    marginBest(scored, marginNum, marginDen, Seq(keyCol), bestCol)

  /** Composite-key form of [[marginBest]] — one window pass ranks
    * every (key tuple)'s candidates (the ladder fold partitions by
    * (width, src) to score a whole probe-width walk in one pass). */
  private def marginBest(scored: DataFrame, marginNum: Long,
                         marginDen: Long, keyCols: Seq[String],
                         bestCol: String): DataFrame = {
    require(marginDen > 0 && marginNum >= marginDen,
      s"margin $marginNum/$marginDen must be >= 1")
    require(marginDen <= 4000 && marginNum <= 8000,
      "margin terms above ~4000 risk int64 overflow against 1e15 sims")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("qsim").desc, col(bestCol))
    scored
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= 2)
      .groupBy(keyCols.map(col): _*)
      .agg(
        max(when(col("__rk") === 1, col(bestCol))).as(bestCol),
        max(when(col("__rk") === 1, col("qsim"))).as("qsim"),
        max(when(col("__rk") === 2, col("qsim"))).as("qsim2"))
      .select((keyCols.map(col) ++ Seq(col(bestCol), col("qsim"), col("qsim2"),
        (col("qsim") > 0L && (col("qsim2").isNull ||
          lit(2L * marginDen) * col("qsim") >=
            lit(marginNum) * (col("qsim") + col("qsim2"))))
          .as("mined"))): _*)
  }
}
