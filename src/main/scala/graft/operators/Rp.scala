package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded ±1 random projection for embedding search (SURVEY.md §2
  * C94) — the Achlioptas/Johnson-Lindenstrauss database-friendly
  * dimensionality cut: project `dim`-dimensional vectors onto `outDim`
  * seeded ±1 directions, score candidates in the small space, rerank
  * survivors in the original space. The workhorse behind cheap
  * first-pass retrieval and dedup blocking when even SQ8 codes are too
  * wide to scan (a 64→16 cut reads 4× less per candidate and the JL
  * lemma bounds the rank distortion).
  *
  * Placement in the ANN family: brute cosine (C5) is the exactness
  * baseline, SQ8 (C50) compresses VALUES, PQ/OPQ (C25) compress via
  * codebooks, IVF (C6) prunes WHICH rows are scored — RP compresses
  * DIMENSIONS, and composes with any of them (project, then bucket or
  * scan). Unlike PCA (C69) it needs no training pass and no
  * eigensolver, which is exactly why it carries a FULL SQL oracle
  * where PCA cannot.
  *
  * ENGINE-PORTABLE by construction (the C25/C56p integer stance):
  * coordinates quantize to 1e-6 integers (HALF_UP in both engines),
  * the projection matrix is ±1 signs drawn from md5 — so every
  * projected coordinate is an exact integer sum and every candidate
  * decision replays bit-for-bit in DuckDB. Overflow bound: |qv_i| ≤
  * 10⁶ on unit-ish embeddings ⇒ |pv_j| ≤ dim·10⁶ and the projected
  * bilinear ≤ outDim·(dim·10⁶)² — fits int64 while dim·√outDim ≲
  * 3×10³ (the 64→16 default uses 256 of that budget), past any real
  * embedding width at sane outDim.
  *
  * Shape at 100 TB: the sign matrix is a LITERAL (outDim·dim bytes —
  * model-sized, shipped inside the plan), projection and scoring are
  * map-only codegen'd folds; the only ordering is TakeOrdered top-k.
  * No shuffle ever touches a vector. */
object Rp {

  /** Seeded ±1 sign matrix, `outDim` rows × `dim` columns:
    * `sign(j,i)` from md5("rp-j<j>-i<i>")'s low bit — deterministic,
    * engine-free, and regenerable by any mirror from the same seeds
    * (the [[Pq.signedPermutation]] stance). */
  def signMatrix(dim: Int, outDim: Int): Array[Array[Long]] = {
    require(dim >= 1 && outDim >= 1, "dims must be >= 1")
    def hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    Array.tabulate(outDim)(j => Array.tabulate(dim)(i =>
      if ((Integer.parseInt(hex(s"rp-j$j-i$i").take(2), 16) & 1) == 0) 1L
      else -1L))
  }

  private def toDoubles(vec: Column): Column =
    transform(vec, v => v.cast("double"))

  /** The shared 1e-6 quantization — computed IN THE PLAN (Spark's
    * HALF_UP `round`), matching the mirrors' `round(x * 1e6)`. */
  private def quantized(vec: Column): Column =
    transform(toDoubles(vec), x => round(x * 1e6, 0).cast("bigint"))

  /** Integer bilinear form Σ aᵢ·bᵢ over two bigint arrays. */
  private def bilinear(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Project a quantized vector column by the ±1 matrix: one literal
    * `array<array<bigint>>` mapped row-wise — `pv_j = Σᵢ m[j][i]·qvᵢ`,
    * a codegen'd fold per output dimension, no shuffle. */
  private def projected(qv: Column, m: Array[Array[Long]]): Column = {
    val mLit = typedLit(m.map(_.toSeq).toSeq)
    transform(mLit, row =>
      aggregate(zip_with(row, qv, (s, x) => s * x), lit(0L), (acc, v) => acc + v))
  }

  /** `(idCol, qv, pv)`: the quantized corpus with its `outDim`
    * projection attached — the relation both the candidate scan and
    * the rerank read.
    *
    * Fail-loud on ragged rows AT ZERO COST (the Pca/Ivf stance,
    * without their extra pass): the projection expression itself
    * raises on the first row whose length differs from the sampled
    * dim — a silent `zip_with` null-pad would make that row (or, if
    * it is the query, every score) NULL and unretrievable with no
    * signal. */
  def projectPortable(emb: DataFrame, idCol: String, vecCol: String,
                      outDim: Int): DataFrame = {
    // sample the dim from a DETERMINISTIC row — the min-id row with a
    // non-null vector — so on a (buggy) mixed-dim corpus which dim is
    // "expected" is stable across runs; an unordered limit(1) made the
    // raising rows nondeterministic, and a NULL first embedding
    // produced size = -1 and a baffling "dims must be >= 1" failure
    // from signMatrix instead of this message.
    val dimRow = emb.filter(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(1).select(size(col(vecCol))).collect()
    require(dimRow.nonEmpty,
      s"cannot project an empty corpus (or one whose $vecCol is all NULL)")
    val dim = dimRow.head.getInt(0)
    val m = signMatrix(dim, outDim)
    emb.select(col(idCol), quantized(col(vecCol)).as("qv"))
      .withColumn("pv",
        when(size(col("qv")) === dim, projected(col("qv"), m))
          .otherwise(raise_error(concat(
            lit(s"ragged $vecCol: expected dim $dim, found "),
            coalesce(size(col("qv")).cast("string"), lit("NULL"))))))
  }

  /** Top-k serve, fully portable: score every vector against
    * `queryId`'s in the PROJECTED space (integer bilinear), keep the
    * best `rerank` candidates, rerank them by the exact integer
    * bilinear in the ORIGINAL space, emit the top `k` with BOTH
    * scores — the operating-curve stance (the reader sees how far the
    * small-space rank diverged from the exact one). Ties break to the
    * lowest id at both tiers. */
  def topKPortable(emb: DataFrame, idCol: String, vecCol: String,
                   queryId: Long, k: Int, rerank: Int,
                   outDim: Int = 16): DataFrame = {
    require(rerank >= k, "rerank pool must be at least k")
    val base = projectPortable(emb, idCol, vecCol, outDim)
    val q = base.filter(col(idCol) === queryId)
      .select(col("qv").as("qqv"), col("pv").as("qpv")).limit(1)
    val cands = base.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), col("qv"), col("qqv"),
        bilinear(col("pv"), col("qpv")).as("psim"))
      .orderBy(col("psim").desc, col(idCol))
      .limit(rerank)
    cands
      .select(col(idCol), col("psim"), bilinear(col("qv"), col("qqv")).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
