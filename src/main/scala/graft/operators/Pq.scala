package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      model, qRaw, k, rerank)
  }

  /** The shared ADC serve tail (score candidate code rows, optionally
    * exact-re-rank): [[topK]] feeds it the whole corpus, [[IvfPqIndex]]
    * only the probed cells. */
  private[operators] def serve(emb: DataFrame, idCol: String, vecCol: String,
                               candidates: DataFrame, model: PqModel,
                               qRaw: Array[Double], k: Int,
                               rerank: Int): DataFrame = {
    val qNorm = {
      val n = math.sqrt(qRaw.map(x => x * x).sum)
      if (n > 0.0) qRaw.map(_ / n) else qRaw
    }
    val lut = typedLit(model.flatLut(qNorm).toSeq)
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
        model, qRaw, k, rerank)
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
}
