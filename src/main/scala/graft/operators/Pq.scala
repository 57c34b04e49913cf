package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Product-quantization ANN (SURVEY.md §2 C25) — the MEMORY-bound scale
  * path beside IVF's IO-bound one: each (L2-normalized) vector is split
  * into `m` subvectors and every subvector is replaced by the id of its
  * nearest codeword in a per-subspace codebook, so a 64-dim float
  * embedding (256 B) serves from an `m`-byte-ish code row (m=8, k≤256
  * → 32× smaller). A 100 TB embedding corpus becomes a few TB of
  * codes — often the difference between "fits in cluster memory" and
  * "scans object storage per query".
  *
  * Serving is ADC (asymmetric distance computation), the standard PQ
  * trade (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search"): the query stays exact, each corpus vector is approximated
  * by its codewords, and `dot(q, x) ≈ Σ_j lut[j][code_j]` where the
  * `m·k` lookup table is built driver-side from ONE query in
  * microseconds and shipped as a literal — the scan does `m` array
  * lookups + adds per row inside codegen, no vector math at all.
  * Because corpus vectors are normalized before encoding, the
  * approximate dot IS approximate cosine. `rerank > 0` adds the
  * standard second stage: exact cosine over the top `rerank` ADC
  * candidates only — the 100 TB pattern where full vectors live on
  * disk and are fetched for a few hundred rows per query.
  *
  * Build cost is explicit and bounded: `fit` runs `m` independent
  * sub-space k-means (reusing [[Ivf.fitCentroids]] — broadcast-join
  * assignment, k-independent plans), and `encode` is one
  * crossJoin-against-broadcast-codebook pass whose `m·k`-way expansion
  * collapses map-side (partial `min_by`), so the shuffle carries one
  * row per (vector, subspace), never the expansion.
  */
object Pq {

  /** Driver-side codebooks: `codebooks(j)(c)` = codeword `c` of
    * subspace `j` (`m × k × dim/m` doubles — KBs, trivially
    * broadcastable). */
  final case class PqModel(codebooks: Seq[Seq[Array[Double]]], dim: Int) {
    def m: Int = codebooks.size
    def k: Int = codebooks.head.size
    def sub: Int = dim / m

    /** Flat ADC lookup table for one normalized query: entry
      * `j*k + c` = dot(query subvector j, codeword c of book j). */
    def flatLut(q: Array[Double]): Array[Double] = {
      val out = new Array[Double](m * k)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < k) {
          val cw = codebooks(j)(c)
          var s = 0.0
          var t = 0
          while (t < sub) { s += q(j * sub + t) * cw(t); t += 1 }
          out(j * k + c) = s
          c += 1
        }
        j += 1
      }
      out
    }
  }

  /** L2-normalization with the norm projected to an attribute FIRST — a
    * norm captured inside the transform lambda would re-evaluate once
    * per element (the quadratic trap documented on `shingles`). Zero
    * vectors pass through unchanged. */
  private def normalized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), toDoubles(col(vecCol)).as("__raw"))
      .withColumn("__n", l2Norm(col("__raw")))
      .select(col(idCol),
        when(col("__n") > 0.0, transform(col("__raw"), x => x / col("__n")))
          .otherwise(col("__raw")).as("v"))

  /** Train the per-subspace codebooks: `m` independent k-means fits
    * over the corpus's normalized subvectors, under the SAME squared-L2
    * metric [[encode]] quantizes with (a cosine fit would train for a
    * different partition than the encoder uses — subvectors are slices
    * of normalized vectors, not themselves normalized). Deterministic
    * (seeded, hash-ordered init) like the IVF coarse quantizer.
    *
    * Production note: this normalizes the corpus once per sub-fit;
    * [[build]] is the fit+encode path that shares ONE persisted
    * normalized scan across all of them. */
  def fit(emb: DataFrame, idCol: String, vecCol: String, m: Int = 8,
          codewords: Int = 256, iters: Int = 3, seed: Long = 42L): PqModel =
    fitBase(normalized(emb, idCol, vecCol), idCol, m, codewords, iters, seed)

  private def fitBase(base: DataFrame, idCol: String, m: Int,
                      codewords: Int, iters: Int, seed: Long): PqModel = {
    val dimRow = base.select(size(col("v"))).limit(1).collect()
    require(dimRow.nonEmpty, "cannot fit a PQ codebook on an empty corpus")
    val dim = dimRow.head.getInt(0)
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val sub = dim / m
    val books = (0 until m).map { j =>
      val subVecs = base.select(col(idCol), slice(col("v"), j * sub + 1, sub).as("sv"))
      Ivf.fitCentroids(subVecs, idCol, "sv", codewords, iters, seed + j,
        metric = "l2")
    }
    PqModel(books, dim)
  }

  /** Fit + encode sharing ONE persisted normalized corpus scan — the
    * build path a production index job runs: the `m` sub-fits and the
    * encode all read the cached base instead of re-normalizing the
    * corpus `m·iters` times. Returns the model and the MATERIALIZED
    * persisted code relation (the caller owns its unpersist). */
  def build(emb: DataFrame, idCol: String, vecCol: String, m: Int = 8,
            codewords: Int = 256, iters: Int = 3, seed: Long = 42L)
      : (PqModel, DataFrame) = {
    val base = normalized(emb, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val model = fitBase(base, idCol, m, codewords, iters, seed)
      val codes = encodeBase(base, idCol, model)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      codes.count() // materialize while the base is still cached
      (model, codes)
    } finally { base.unpersist(); () }
  }

  /** Encode the corpus: `(idCol, codes array<int>)`, `codes(j)` = the
    * nearest codeword (squared-L2, ties to the lowest id) of subvector
    * `j`. One broadcast crossJoin whose expansion collapses map-side —
    * the shuffles carry one row per (vector, subspace) and then one
    * per vector. */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
             model: PqModel): DataFrame =
    encodeBase(normalized(emb, idCol, vecCol), idCol, model)

  private def encodeBase(base: DataFrame, idCol: String,
                         model: PqModel): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val cdf = (for {
      j <- 0 until model.m
      (cw, ci) <- model.codebooks(j).zipWithIndex
    } yield (j, ci, cw.toSeq)).toDF("__sub", "__ci", "__cw")
    base
      .crossJoin(broadcast(cdf))
      .withColumn("__sv",
        slice(col("v"), col("__sub") * model.sub + 1, lit(model.sub)))
      .withColumn("__d2",
        aggregate(zip_with(col("__sv"), col("__cw"),
          (x, y) => (x - y) * (x - y)), lit(0.0), (acc, z) => acc + z))
      .groupBy(col(idCol), col("__sub"))
      .agg(min_by(col("__ci"), struct(col("__d2"), col("__ci"))).as("__code"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("__sub"), col("__code")))).as("__sc"))
      .select(col(idCol),
        transform(col("__sc"), s => s.getField("__code")).as("codes"))
  }

  /** ADC top-k: approximate cosine from the code rows alone (`m`
    * literal-array lookups per row, codegen'd — the full vectors are
    * never read), then, with `rerank > 0`, exact cosine over just the
    * top `rerank` candidates. Driver work is one 1-row query lookup
    * plus the `m·k`-double LUT. */
  def topK(emb: DataFrame, idCol: String, vecCol: String, codes: DataFrame,
           model: PqModel, queryId: Long, k: Int, rerank: Int = 0): DataFrame = {
    val qRaw = Ann.queryVector(emb, idCol, toDoubles(col(vecCol)), queryId)
      .getOrElse { return Ann.emptyTopK(emb, idCol) }
    serve(emb, idCol, vecCol, codes.filter(col(idCol) =!= queryId),
      model, qRaw, normalize(qRaw), k, rerank)
  }

  private def normalize(q: Array[Double]): Array[Double] = {
    val n = math.sqrt(q.map(x => x * x).sum)
    if (n > 0.0) q.map(_ / n) else q
  }

  /** The shared ADC serve tail (score candidate code rows, optionally
    * exact-re-rank): [[topK]] feeds it the whole corpus, [[IvfPqIndex]]
    * only the probed cells. `qLut` is the vector the codes were trained
    * against (the normalized query — ROTATED for OPQ, where codes live
    * in the rotated space); `qRaw` stays in the original space for the
    * exact re-rank, which rotation never touches (cosine is
    * rotation-invariant, and the stored corpus vectors are unrotated). */
  private[operators] def serve(emb: DataFrame, idCol: String, vecCol: String,
                               candidates: DataFrame, model: PqModel,
                               qRaw: Array[Double], qLut: Array[Double],
                               k: Int, rerank: Int): DataFrame = {
    val lut = typedLit(model.flatLut(qLut).toSeq)
    val kk = model.k
    val scored = candidates.withColumn("__adc",
      aggregate(zip_with(col("codes"), sequence(lit(0), lit(model.m - 1)),
        (c, j) => element_at(lut, (j * kk + c + 1).cast("int"))),
        lit(0.0), (acc, x) => acc + x))
    if (rerank <= 0)
      scored.orderBy(col("__adc").desc, col(idCol))
        .select(col(idCol), round(col("__adc"), 4).as("cosine"))
        .limit(k)
    else
      scored.orderBy(col("__adc").desc, col(idCol)).limit(rerank)
        .select(col(idCol))
        .join(emb.select(col(idCol), col(vecCol)), Seq(idCol))
        .select(col(idCol),
          round(cosineNative(toDoubles(col(vecCol)), typedLit(qRaw.toSeq)), 4)
            .as("cosine"))
        .orderBy(col("cosine").desc, col(idCol))
        .limit(k)
  }

  /** The full IVF-PQ composition: IVF cells prune the IO (probes read
    * only `nprobe` of the cells), PQ codes shrink what a probe reads
    * (m ints per vector). The code relation carries `centroid_id`, so
    * a bucketed/partitioned layout by cell — [[Ivf.IvfIndex
    * .writeBucketed]]'s pattern — prunes whole file groups AND each
    * opened file is ~32× smaller than its vectors. */
  final case class IvfPqIndex(centroids: Seq[Array[Double]], model: PqModel,
                              codes: DataFrame, idCol: String) {

    /** Probe `nprobe` cells, ADC-score just their code rows, exact
      * re-rank the top `rerank`. Driver work: one query fetch, a
      * k×nprobe centroid scan, one LUT. */
    def topK(emb: DataFrame, vecCol: String, queryId: Long, k: Int,
             nprobe: Int, rerank: Int = 0): DataFrame = {
      val qRaw = Ann.queryVector(emb, idCol, toDoubles(col(vecCol)), queryId)
        .getOrElse { return Ann.emptyTopK(emb, idCol) }
      val probeCells = centroids.zipWithIndex
        .sortBy { case (c, i) => (-Ann.localCosine(c, qRaw), i) }
        .take(nprobe).map(_._2)
      serve(emb, idCol, vecCol,
        codes.filter(col("centroid_id").isin(probeCells.map(x => x: Any): _*))
          .filter(col(idCol) =!= queryId),
        model, qRaw, normalize(qRaw), k, rerank)
    }

    /** Incremental append — encode ONLY the delta with the frozen
      * codebooks and assign it to the frozen cells (two delta-sized
      * passes, no k-means, no re-encode of the base corpus), then
      * serve the union. Same contract as [[Ivf.IvfIndex.append]]: the
      * returned index shares this one's model/centroids, the caller
      * owns both caches, and accuracy holds while the delta stays
      * in-distribution (gauge with the IVF-side drift check and refit
      * via [[buildIvf]] when it drops). */
    def append(newEmb: DataFrame, vecCol: String): IvfPqIndex = {
      val deltaCodes = encode(newEmb, idCol, vecCol, model)
        .join(Ivf.assignCells(newEmb, idCol, vecCol, centroids)
          .select(col(idCol), col("centroid_id")), Seq(idCol))
      val merged = codes.unionByName(deltaCodes)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      IvfPqIndex(centroids, model, merged, idCol)
    }

    def unpersist(): Unit = { codes.unpersist(); () }
  }

  /** Build the composed index: IVF cells from the raw vectors (same
    * cosine cells as [[Ivf.fit]]), PQ codebooks/codes from the
    * normalized ones, joined once so each code row knows its cell.
    * Everything transient is unpersisted before returning; the caller
    * owns the returned code relation's cache. */
  def buildIvf(emb: DataFrame, idCol: String, vecCol: String,
               numCells: Int = 16, m: Int = 8, codewords: Int = 256,
               iters: Int = 3, seed: Long = 42L): IvfPqIndex = {
    val ivf = Ivf.fit(emb, idCol, vecCol, numCells, iters, seed)
    try {
      val (model, codes) = build(emb, idCol, vecCol, m, codewords, iters, seed)
      val cellCodes = codes
        .join(ivf.assigned.select(col(idCol), col("centroid_id")), Seq(idCol))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cellCodes.count() // materialize before dropping the inputs' caches
      codes.unpersist()
      IvfPqIndex(ivf.centroids, model, cellCodes, idCol)
    } finally ivf.unpersist()
  }

  // ------------------------------------------------------------------
  // OPQ — optimized product quantization (Ge et al., "Optimized
  // Product Quantization", CVPR 2013, the non-parametric variant).
  // Plain PQ slices dimensions 1..sub, sub+1..2·sub, …: when the
  // corpus's variance is unevenly spread or correlated across that
  // arbitrary slicing, some subspaces waste their k codewords on noise
  // while others underfit. OPQ learns an ORTHOGONAL rotation R
  // (applied before slicing) that balances and decorrelates the
  // subspaces, then quantizes the rotated vectors — same m, same k,
  // same code size, strictly better (or equal) quantization error.
  // Rotation preserves cosine, so the ADC story is unchanged: rotate
  // the query, LUT against the rotated-space codebooks.
  // ------------------------------------------------------------------

  /** PQ model plus the learned rotation. `rotation(i)(j)` = R[i][j] in
    * the ROW convention: rotated(v)_j = Σ_i v_i · R[i][j] (d×d doubles
    * — KBs, a driver/literal-side object like the codebooks). */
  final case class OpqModel(rotation: Seq[Array[Double]], pq: PqModel) {
    def dim: Int = pq.dim

    /** Driver-side rotate (for the one query vector per probe). */
    def rotate(v: Array[Double]): Array[Double] = {
      val out = new Array[Double](dim)
      var j = 0
      while (j < dim) {
        var s = 0.0; var i = 0
        while (i < dim) { s += v(i) * rotation(i)(j); i += 1 }
        out(j) = s; j += 1
      }
      out
    }
  }

  /** Map-only matvec: every row's `v` replaced by `v · R`. The d×d
    * rotation ships as ONE flat literal; the per-row cost is d² mult-
    * adds inside codegen — the same shape as a dense projection layer,
    * scale-safe at any corpus size. */
  private def rotatedBase(base: DataFrame, idCol: String,
                          r: Seq[Array[Double]]): DataFrame = {
    val d = r.size
    val rFlat = typedLit(r.flatMap(_.toSeq))
    base.select(col(idCol),
      transform(sequence(lit(0), lit(d - 1)), j =>
        aggregate(
          zip_with(col("v"), sequence(lit(0), lit(d - 1)),
            (x, i) => x * element_at(rFlat, (i * d + j + 1).cast("int"))),
          lit(0.0), (acc, x) => acc + x)).as("v"))
  }

  /** The Procrustes correlation M = Xᵀ·Q — X the original normalized
    * corpus, Q each row's quantized reconstruction in the rotated
    * space. Distributed as: per-row flat outer product (d² values),
    * posexplode, partial-agg'd sum per position — the shuffle carries
    * d² rows per PARTITION, never per row; only the d×d result reaches
    * the driver. */
  private def correlation(base: DataFrame, codesDf: DataFrame,
                          idCol: String, model: PqModel): Array[Array[Double]] = {
    val d = model.dim; val sub = model.sub; val kk = model.k
    // flat codeword table: entry j*k*sub + c*sub + t = codebooks(j)(c)(t)
    val cwFlat = typedLit(
      model.codebooks.flatMap(book => book.flatMap(_.toSeq)))
    val joined = base.join(codesDf, Seq(idCol))
      .withColumn("__q", transform(sequence(lit(0), lit(d - 1)), i => {
        val j = (i / lit(sub)).cast("int")
        val t = pmod(i, lit(sub))
        element_at(cwFlat,
          (j * (kk * sub) + element_at(col("codes"), j + 1) * sub + t + 1)
            .cast("int"))
      }))
    val sums = joined
      .select(posexplode(transform(sequence(lit(0), lit(d * d - 1), lit(1)), p =>
        element_at(col("v"), (p / lit(d)).cast("int") + 1) *
          element_at(col("__q"), pmod(p, lit(d)).cast("int") + 1))))
      .groupBy("pos").agg(sum("col").as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    Array.tabulate(d, d)((i, j) => sums.getOrElse(i * d + j, 0.0))
  }

  /** Orthogonal (polar) factor of M — the Procrustes solution R = UVᵀ
    * computed as M·(MᵀM)^(-1/2) with a plain Jacobi eigen-solve of the
    * d×d symmetric MᵀM. Pure driver math on a d×d matrix (d ≤ a few
    * hundred for any real embedding), no linalg dependency. Eigenvalues
    * under `eps` contribute nothing (rank-deficient M leaves those
    * directions unrotated rather than blowing up). */
  private[operators] def orthogonalPolar(mIn: Array[Array[Double]]): Seq[Array[Double]] = {
    val d = mIn.length
    // S = MᵀM (symmetric PSD)
    val a = Array.tabulate(d, d)((i, j) =>
      (0 until d).foldLeft(0.0)((acc, t) => acc + mIn(t)(i) * mIn(t)(j)))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    // cyclic Jacobi sweeps until the off-diagonal mass is negligible
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 50 && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off += apq * apq
          if (math.abs(apq) > 1e-300) {
            val theta = 0.5 * (a(q)(q) - a(p)(p)) / apq
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val eps = 1e-12
    val invSqrt = (0 until d).map(i => {
      val lam = a(i)(i)
      if (lam > eps) 1.0 / math.sqrt(lam) else 0.0
    })
    // S^(-1/2) = V diag(1/√λ) Vᵀ, then R = M · S^(-1/2)
    val sInv = Array.tabulate(d, d)((i, j) =>
      (0 until d).foldLeft(0.0)((acc, t) => acc + v(i)(t) * invSqrt(t) * v(j)(t)))
    val r = Array.tabulate(d, d)((i, j) =>
      (0 until d).foldLeft(0.0)((acc, t) => acc + mIn(i)(t) * sInv(t)(j)))
    // The clamped (near-null) directions come out of the polar formula
    // shrunk, not unit — and steep spectra leave e-6-scale residue even
    // in the kept ones (MᵀM squares the condition number). Finish with
    // modified Gram-Schmidt over the COLUMNS (the output directions of
    // v·R); a collapsed column is completed deterministically from the
    // standard basis, which is exactly the Procrustes freedom in M's
    // null space. TWO passes ("twice is enough"): normalizing a
    // shrunken column amplifies the pass-1 projection residue, and the
    // second sweep removes it.
    var pass = 0
    while (pass < 2) {
    var j = 0
    while (j < d) {
      var t = 0
      while (t < j) {
        var dot = 0.0; var i = 0
        while (i < d) { dot += r(i)(j) * r(i)(t); i += 1 }
        i = 0
        while (i < d) { r(i)(j) -= dot * r(i)(t); i += 1 }
        t += 1
      }
      var nrm = 0.0; var i = 0
      while (i < d) { nrm += r(i)(j) * r(i)(j); i += 1 }
      nrm = math.sqrt(nrm)
      if (nrm < 1e-8) {
        // complete from the first basis vector not yet spanned
        var e = 0
        var done = false
        while (e < d && !done) {
          i = 0; while (i < d) { r(i)(j) = if (i == e) 1.0 else 0.0; i += 1 }
          var tt = 0
          while (tt < j) {
            var dot = 0.0; i = 0
            while (i < d) { dot += r(i)(j) * r(i)(tt); i += 1 }
            i = 0
            while (i < d) { r(i)(j) -= dot * r(i)(tt); i += 1 }
            tt += 1
          }
          var n2 = 0.0; i = 0
          while (i < d) { n2 += r(i)(j) * r(i)(j); i += 1 }
          if (n2 > 0.5) { nrm = math.sqrt(n2); done = true }
          e += 1
        }
      }
      i = 0
      while (i < d) { r(i)(j) /= nrm; i += 1 }
      j += 1
    }
    pass += 1
    }
    r.toSeq
  }

  /** Fit + encode with the OPQ rotation: alternate (fit codebooks on
    * the rotated corpus) ↔ (re-solve the optimal rotation by
    * Procrustes) `opqIters` times, then fit/encode once more under the
    * final R. Every step is the same bounded machinery as [[build]] —
    * sub-space k-means, broadcast-collapse encode, one d×d driver
    * matrix per iteration — so the cost is `opqIters+1` × build, all
    * map-side/partial-agg shapes. Returns the model and the
    * MATERIALIZED persisted code relation (caller owns its
    * unpersist). */
  def buildOpq(emb: DataFrame, idCol: String, vecCol: String, m: Int = 8,
               codewords: Int = 256, iters: Int = 3, opqIters: Int = 3,
               seed: Long = 42L): (OpqModel, DataFrame) = {
    val base = normalized(emb, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dimRow = base.select(size(col("v"))).limit(1).collect()
      require(dimRow.nonEmpty, "cannot fit an OPQ codebook on an empty corpus")
      val d = dimRow.head.getInt(0)
      var r: Seq[Array[Double]] =
        (0 until d).map(i => Array.tabulate(d)(j => if (i == j) 1.0 else 0.0))
      for (_ <- 0 until opqIters) {
        val rot = rotatedBase(base, idCol, r)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val model = fitBase(rot, idCol, m, codewords, iters, seed)
          val codesIt = encodeBase(rot, idCol, model)
          r = orthogonalPolar(correlation(base, codesIt, idCol, model))
        } finally { rot.unpersist(); () }
      }
      val rotFinal = rotatedBase(base, idCol, r)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val model = fitBase(rotFinal, idCol, m, codewords, iters, seed)
        val codes = encodeBase(rotFinal, idCol, model)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        codes.count()
        (OpqModel(r, model), codes)
      } finally { rotFinal.unpersist(); () }
    } finally { base.unpersist(); () }
  }

  /** ADC top-k over OPQ codes: identical serve shape to [[topK]] — the
    * only difference is the query is rotated (driver-side, d² mult-adds)
    * before the LUT, because the codes live in the rotated space. The
    * exact re-rank still scores ORIGINAL vectors against the ORIGINAL
    * query (cosine is rotation-invariant, so the two stages agree). */
  def topKOpq(emb: DataFrame, idCol: String, vecCol: String,
              codes: DataFrame, model: OpqModel, queryId: Long, k: Int,
              rerank: Int = 0): DataFrame = {
    val qRaw = Ann.queryVector(emb, idCol, toDoubles(col(vecCol)), queryId)
      .getOrElse { return Ann.emptyTopK(emb, idCol) }
    serve(emb, idCol, vecCol, codes.filter(col(idCol) =!= queryId),
      model.pq, qRaw, model.rotate(normalize(qRaw)), k, rerank)
  }

  // ------------------------------------------------------------ portable

  /** ENGINE-PORTABLE PQ model — the C35/C62 reproducibility recipe
    * applied to the product quantizer, so an independent engine (the
    * DuckDB oracle, an auditor's replay months later) derives the
    * IDENTICAL codes and the IDENTICAL candidate set:
    *
    *  - codewords are the `k` corpus vectors with the smallest
    *    `(md5(id), id)` (the [[Ivf.seedCentroids]] draw), sliced into
    *    `m` subvectors and quantized to 1e-6 integers — no Lloyd
    *    refinement (float per-dim means are not portable) and no
    *    normalization (a computed float that would have to replay);
    *  - encoding is integer squared-L2 argmin per subspace, ties to
    *    the lowest code id;
    *  - ADC is an INTEGER distance — `Σ_j lut[j][code_j]` with
    *    `lut[j][c] = Σ_i (qq_i − qc_i)²` over the 1e-6-quantized
    *    query — so the `rerank` candidate set is the exact smallest
    *    `(adc, id)` prefix in every engine;
    *  - the final order is the C5-proven round4 exact cosine over the
    *    candidates only.
    *
    * The Lloyd-refined [[build]]/[[topK]] path remains the QUALITY
    * quantizer (trained cells, normalized dot ADC, AccuracySpec's
    * measured recall ladder); this is the REPRODUCIBILITY
    * configuration for cross-engine gates and audit replays. Overflow
    * bound (the [[Ivf.assignCellsPortable]] arithmetic): |q| ≤ ~4e6
    * per dim keeps each subspace d² < 1e15 and the m-term ADC sum
    * < 1e16 — inside int64 for any m. */
  final case class PqPortableModel(codebooks: Seq[Seq[Array[Long]]], dim: Int) {
    def m: Int = codebooks.size
    def k: Int = codebooks.head.size
    def sub: Int = dim / m

    /** Integer ADC table for one quantized query: entry `j*k + c` =
      * squared L2 between query subvector `j` and codeword `c`. */
    def flatLutL2(qq: Array[Long]): Array[Long] = {
      require(qq.length == dim, s"query dim ${qq.length} != model dim $dim")
      val out = new Array[Long](m * k)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < k) {
          val cw = codebooks(j)(c)
          var s = 0L
          var t = 0
          while (t < sub) { val d = qq(j * sub + t) - cw(t); s += d * d; t += 1 }
          out(j * k + c) = s
          c += 1
        }
        j += 1
      }
      out
    }
  }

  /** The 1e-6 integer quantization every portable step shares —
    * COMPUTED IN THE PLAN (Spark's HALF_UP `round`), never with JVM
    * `math.round` (which floors ties toward +∞ for negatives and would
    * silently diverge from the SQL mirror on an exact .5). */
  private def quantized(vec: Column): Column =
    transform(toDoubles(vec), x => round(x * 1e6, 0).cast("bigint"))

  /** Quantized corpus relation `(idCol, qv)` for the portable paths. */
  private def quantizedBase(emb: DataFrame, idCol: String,
                            vecCol: String): DataFrame =
    emb.select(col(idCol), quantized(col(vecCol)).as("qv"))

  /** Seed the portable codebooks: the `codewords` corpus vectors with
    * the smallest `(md5(id), id)`, quantized and sliced — codeword `c`
    * of every subspace comes from the same seed vector, which is what
    * lets the SQL mirror rebuild the books from one LIMIT. */
  def fitPortable(emb: DataFrame, idCol: String, vecCol: String,
                  m: Int = 8, codewords: Int = 16): PqPortableModel =
    fitQuantized(quantizedBase(emb, idCol, vecCol), idCol, m, codewords)

  /** [[fitPortable]] over an ALREADY-quantized `(idCol, qv, …)`
    * relation — so compositions that hold one (the IVF-PQ build) seed
    * the codebooks without re-quantizing the corpus. */
  def fitQuantized(base: DataFrame, idCol: String,
                   m: Int = 8, codewords: Int = 16): PqPortableModel = {
    require(m >= 1 && codewords >= 1, s"m=$m, codewords=$codewords must be >= 1")
    val seeds = base.select(col(idCol), col("qv"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(codewords)
      .collect()
      .map(_.getSeq[Long](1).toArray)
    require(seeds.nonEmpty, "cannot seed a PQ codebook on an empty corpus")
    val dim = seeds.head.length
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val sub = dim / m
    PqPortableModel(
      (0 until m).map(j => seeds.toSeq.map(_.slice(j * sub, (j + 1) * sub))),
      dim)
  }

  /** Integer-exact encode against a portable model: `(idCol, codes)`,
    * same broadcast-crossJoin/partial-`min_by` shape as [[encode]] —
    * the shuffle carries one row per (vector, subspace). */
  def encodePortable(emb: DataFrame, idCol: String, vecCol: String,
                     model: PqPortableModel): DataFrame =
    encodeQuantized(quantizedBase(emb, idCol, vecCol), idCol, model)

  /** [[encodePortable]] over an ALREADY-quantized `(idCol, qv, …)`
    * relation — what [[Ivf.assignCellsPortable]] emits, so the IVF-PQ
    * composition quantizes the corpus exactly once. Extra columns
    * (e.g. `centroid_id`) ride along via a first() per vector. */
  def encodeQuantized(base: DataFrame, idCol: String,
                      model: PqPortableModel): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val carried = base.columns.filter(c => c != idCol && c != "qv").toSeq
    val cdf = (for {
      j <- 0 until model.m
      (cw, ci) <- model.codebooks(j).zipWithIndex
    } yield (j, ci, cw.toSeq)).toDF("__sub", "__ci", "__qcw")
    base
      .crossJoin(broadcast(cdf))
      .withColumn("__sv",
        slice(col("qv"), col("__sub") * model.sub + 1, lit(model.sub)))
      .withColumn("__d2",
        aggregate(zip_with(col("__sv"), col("__qcw"),
          (x, y) => (x - y) * (x - y)), lit(0L), (acc, z) => acc + z))
      .groupBy(col(idCol), col("__sub"))
      .agg(min_by(col("__ci"), struct(col("__d2"), col("__ci"))).as("__code"),
        carried.map(c => first(col(c)).as(c)): _*)
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("__sub"), col("__code"))))
        .as("__sc"), carried.map(c => first(col(c)).as(c)): _*)
      .select((col(idCol) +:
        transform(col("__sc"), s => s.getField("__code")).as("codes") +:
        carried.map(col)): _*)
  }

  /** Fit + encode, codes MATERIALIZED (caller owns the unpersist) —
    * the portable twin of [[build]]. */
  def buildPortable(emb: DataFrame, idCol: String, vecCol: String,
                    m: Int = 8, codewords: Int = 16)
      : (PqPortableModel, DataFrame) = {
    val model = fitPortable(emb, idCol, vecCol, m, codewords)
    val codes = encodePortable(emb, idCol, vecCol, model)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    codes.count()
    (model, codes)
  }

  /** Portable ADC top-k: integer-ADC candidate cut (always re-ranked —
    * the portable contract is "exact round4 cosine over an
    * engine-exact candidate set", so `rerank` is floored at `k`), then
    * the C5 round4 cosine order. The query is quantized BY THE PLAN
    * (one extra 1-row job) so its integers are Spark-round-exact, not
    * JVM-round-approximate. */
  def topKPortable(emb: DataFrame, idCol: String, vecCol: String,
                   codes: DataFrame, model: PqPortableModel, queryId: Long,
                   k: Int, rerank: Int = 100): DataFrame = {
    val qRaw = Ann.queryVector(emb, idCol, toDoubles(col(vecCol)), queryId)
      .getOrElse { return Ann.emptyTopK(emb, idCol) }
    val qq = quantizedQuery(emb, idCol, vecCol, queryId)
    servePortable(emb, idCol, vecCol, codes.filter(col(idCol) =!= queryId),
      model, qRaw, qq, k, rerank)
  }

  /** The query's 1e-6 integers, computed with the PLAN's round. */
  private def quantizedQuery(emb: DataFrame, idCol: String, vecCol: String,
                             queryId: Long): Array[Long] =
    emb.filter(col(idCol) === queryId)
      .select(quantized(col(vecCol))).limit(1).collect()
      .head.getSeq[Long](0).toArray

  private def servePortable(emb: DataFrame, idCol: String, vecCol: String,
                            candidates: DataFrame, model: PqPortableModel,
                            qRaw: Array[Double], qq: Array[Long],
                            k: Int, rerank: Int): DataFrame = {
    val lut = typedLit(model.flatLutL2(qq).toSeq)
    val kk = model.k
    candidates
      .withColumn("__adc",
        aggregate(zip_with(col("codes"), sequence(lit(0), lit(model.m - 1)),
          (c, j) => element_at(lut, (j * kk + c + 1).cast("int"))),
          lit(0L), (acc, x) => acc + x))
      .orderBy(col("__adc"), col(idCol))
      .limit(math.max(rerank, k))
      .select(col(idCol))
      .join(emb.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol),
        round(cosineNative(toDoubles(col(vecCol)), typedLit(qRaw.toSeq)), 4)
          .as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic SIGNED PERMUTATION — the OPQ transform family
    * restricted to exactly the orthogonal matrices an integer pipeline
    * can replay: dimension `i` of the rotated vector is
    * `sign(i) · v(perm(i))`, with `perm` ordering dimensions by
    * `(md5("opq-d<i>"), i)` and the sign drawn from md5's low bit.
    * Orthogonal by construction (one ±1 per row/column), so it is a
    * true OPQ rotation — it re-mixes which coordinates share a
    * subspace — while staying integer-exact. The learned Procrustes
    * rotation ([[buildOpq]]) remains the quality path. */
  def signedPermutation(dim: Int): (Array[Int], Array[Int]) = {
    def hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val perm = (0 until dim).sortBy(i => (hex(s"opq-d$i"), i)).toArray
    val sign = perm.map(p => if ((Integer.parseInt(hex(s"opq-s$p").take(2), 16) & 1) == 0) 1 else -1)
    (perm, sign)
  }

  /** Rotate a quantized-vector column by [[signedPermutation]] —
    * plain integer moves, identical in every engine. */
  private def permuted(qv: Column, perm: Array[Int],
                       sign: Array[Int]): Column = {
    val permLit = typedLit(perm.toSeq)
    val signLit = typedLit(sign.map(_.toLong).toSeq)
    transform(sequence(lit(0), lit(perm.length - 1)),
      i => element_at(qv, element_at(permLit, i + 1) + 1) *
        element_at(signLit, i + 1))
  }

  /** Portable OPQ build: signed-permutation rotate, then the portable
    * fit + encode in the rotated space. Codes MATERIALIZED. */
  def buildOpqPortable(emb: DataFrame, idCol: String, vecCol: String,
                       m: Int = 8, codewords: Int = 16)
      : (PqPortableModel, DataFrame) = {
    val base = quantizedBase(emb, idCol, vecCol)
    val dimRow = base.select(size(col("qv"))).limit(1).collect()
    require(dimRow.nonEmpty, "cannot fit an OPQ codebook on an empty corpus")
    val dim = dimRow.head.getInt(0)
    val (perm, sign) = signedPermutation(dim)
    val rotated = base.select(col(idCol),
      permuted(col("qv"), perm, sign).as("qv"))
    val seeds = rotated
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(codewords).collect().map(_.getSeq[Long](1).toArray)
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val sub = dim / m
    val model = PqPortableModel(
      (0 until m).map(j => seeds.toSeq.map(_.slice(j * sub, (j + 1) * sub))),
      dim)
    val codes = encodeQuantized(rotated, idCol, model)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    codes.count()
    (model, codes)
  }

  /** Portable OPQ top-k: the query rides through the SAME signed
    * permutation (integer moves on its plan-quantized integers) before
    * the ADC; the re-rank scores original vectors against the original
    * query — a signed permutation is orthogonal, so cosine is
    * invariant and the two stages agree exactly as in [[topKOpq]]. */
  def topKOpqPortable(emb: DataFrame, idCol: String, vecCol: String,
                      codes: DataFrame, model: PqPortableModel,
                      queryId: Long, k: Int, rerank: Int = 100): DataFrame = {
    val qRaw = Ann.queryVector(emb, idCol, toDoubles(col(vecCol)), queryId)
      .getOrElse { return Ann.emptyTopK(emb, idCol) }
    val (perm, sign) = signedPermutation(model.dim)
    val qq = quantizedQuery(emb, idCol, vecCol, queryId)
    val qRot = Array.tabulate(model.dim)(i => sign(i) * qq(perm(i)))
    servePortable(emb, idCol, vecCol, codes.filter(col(idCol) =!= queryId),
      model, qRaw, qRot, k, rerank)
  }

  /** Portable IVF-PQ: [[Ivf.seedCentroids]] cells prune which code
    * rows a probe reads (integer-L2 probe ranking, ties to the lowest
    * cell), the portable codes shrink what it reads — the corpus is
    * quantized ONCE ([[Ivf.assignCellsPortable]]'s `qv` feeds the
    * encode). Returns (cells as driver arrays, model, codes-with-cell
    * MATERIALIZED). */
  def buildIvfPortable(emb: DataFrame, idCol: String, vecCol: String,
                       numCells: Int = 16, m: Int = 8, codewords: Int = 16)
      : (Seq[Array[Long]], PqPortableModel, DataFrame) = {
    val spark = emb.sparkSession
    import spark.implicits._
    // one seed job: the collected cells feed both the driver-side cell
    // list and (re-lifted as a literal relation — zero extra jobs) the
    // assignment's broadcast side
    val seedCells = Ivf.seedCentroids(emb, idCol, vecCol, numCells)
      .orderBy("__cid").collect().map(_.getSeq[Long](1).toArray).toSeq
    val seedsDf = seedCells.zipWithIndex
      .map { case (qc, i) => (i, qc.toSeq) }.toDF("__cid", "qc")
    // assigned carries the corpus quantized ONCE; persisted because
    // both the codebook seed draw and the encode read it
    val assigned = Ivf.assignCellsPortable(emb, idCol, vecCol, seedsDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = fitQuantized(assigned, idCol, m, codewords)
    val codes = encodeQuantized(assigned, idCol, model)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    codes.count()
    assigned.unpersist()
    (seedCells, model, codes)
  }

  /** C97b — incremental IVF-PQ delta admission (FAISS
    * `IndexIVFPQ.add` semantics, the codes half of the C97 story):
    * the delta vectors are assigned to the FROZEN seeded cells AND
    * encoded against the FROZEN codebooks, then served from the
    * union — the base cells, the base codes, and therefore every
    * pre-delta candidate decision are bit-identical; only new ids
    * can enter a probe's ADC cut. Per-admit work is |delta|
    * assignments + |delta|·m codeword argmins against the
    * model-sized broadcast state — nothing base-sized is recomputed
    * (the C58/C83 never-rebuild stance).
    *
    * Guards mirror [[Ivf.PortableIvfIndex.admitDelta]]: every delta
    * row dim-checked (a ragged row would zip_with-pad to NULL
    * distances and encode garbage), NULL vectors counted explicitly,
    * and delta ids must be disjoint from the base codes (a duplicate
    * id would appear twice in a probe's candidate set — silently).
    *
    * Returns the union codes relation; [[topKIvfPortable]] serves it
    * unchanged. */
  def admitDeltaIvfPortable(cells: Seq[Array[Long]], model: PqPortableModel,
                            codes: DataFrame, delta: DataFrame,
                            idCol: String, vecCol: String): DataFrame = {
    val spark = delta.sparkSession
    import spark.implicits._
    val szCol = org.apache.spark.sql.functions.size(col(vecCol))
    val dims = delta.agg(
      org.apache.spark.sql.functions.min(szCol),
      org.apache.spark.sql.functions.max(szCol),
      coalesce(org.apache.spark.sql.functions.sum(
        when(col(vecCol).isNull, 1L).otherwise(0L)), lit(0L)),
      org.apache.spark.sql.functions.count(col(idCol)),
      org.apache.spark.sql.functions.count_distinct(col(idCol)),
      coalesce(org.apache.spark.sql.functions.sum(
        when(col(idCol).isNull, 1L).otherwise(0L)), lit(0L))).collect().head
    require(dims.getLong(2) == 0L,
      s"delta has ${dims.getLong(2)} NULL $vecCol rows")
    // NULL ids first: count()/count_distinct() both skip nulls, so
    // multiple NULL-id rows would pass the duplicate check below
    require(dims.getLong(5) == 0L,
      s"delta has ${dims.getLong(5)} NULL $idCol rows")
    // duplicate ids WITHIN the delta are the same double-candidate
    // failure as base/delta overlap — guarded in the same aggregate
    require(dims.getLong(3) == dims.getLong(4),
      s"delta carries duplicate $idCol values: ${dims.getLong(3)} rows, " +
        s"${dims.getLong(4)} distinct ids")
    if (!dims.isNullAt(0)) {
      val (lo, hi) = (dims.getInt(0), dims.getInt(1))
      require(lo == hi && lo == model.dim,
        s"delta dims [$lo, $hi] != model dim ${model.dim}")
    }
    val dupIds = codes
      .join(org.apache.spark.sql.functions.broadcast(
        delta.select(col(idCol))), Seq(idCol))
      .limit(5).select(col(idCol)).collect().map(_.get(0))
    require(dupIds.isEmpty,
      s"delta ids already present in the base codes (first ${dupIds.length}): " +
        dupIds.mkString(", "))
    val seedsDf = cells.zipWithIndex
      .map { case (qc, i) => (i, qc.toSeq) }.toDF("__cid", "qc")
    val deltaCodes = encodeQuantized(
      Ivf.assignCellsPortable(delta, idCol, vecCol, seedsDf), idCol, model)
    codes.unionByName(deltaCodes.select(codes.columns.map(col).toSeq: _*))
  }

  /** Portable IVF-PQ top-k: probe the `nprobe` cells nearest the
    * quantized query (driver-side integer L2 over the model-sized cell
    * list), ADC only the probed cells' codes, re-rank round4-exact. */
  def topKIvfPortable(emb: DataFrame, idCol: String, vecCol: String,
                      cells: Seq[Array[Long]], model: PqPortableModel,
                      codes: DataFrame, queryId: Long, k: Int,
                      nprobe: Int = 4, rerank: Int = 100): DataFrame = {
    val qRaw = Ann.queryVector(emb, idCol, toDoubles(col(vecCol)), queryId)
      .getOrElse { return Ann.emptyTopK(emb, idCol) }
    val qq = quantizedQuery(emb, idCol, vecCol, queryId)
    val probed = cells.zipWithIndex.map { case (c, ci) =>
      // same dim check PqPortableModel.flatLutL2 performs — a silent
      // shared-prefix rank would probe plausibly-wrong cells
      require(c.length == qq.length,
        s"query dim ${qq.length} != cell dim ${c.length} (cell $ci)")
      var s = 0L
      var i = 0
      while (i < c.length) {
        val d = qq(i) - c(i); s += d * d; i += 1
      }
      (s, ci)
    }.sorted.take(math.max(1, nprobe)).map(_._2)
    servePortable(emb, idCol, vecCol,
      codes.filter(col("centroid_id").isin(probed: _*) &&
        col(idCol) =!= queryId),
      model, qRaw, qq, k, rerank)
  }
}
