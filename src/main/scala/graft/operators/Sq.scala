package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization for embedding search (SURVEY.md §2 C50) —
  * the simplest production vector-compression scheme (FAISS SQ8 /
  * Milvus "SQ" shape): each dimension gets one scale (its corpus
  * absmax), every float becomes `round(127·x/scale)` ∈ [-127, 127],
  * and search scores candidates by cosine over the RECONSTRUCTED
  * values `c·s/127` — a 4× memory cut whose rank quality stays far
  * above PQ at the same simplicity (recall@20 = 1.0 on the test
  * corpus vs PQ's 0.50 ADC tier — AccuracySpec).
  *
  * Placement in the ANN family: brute-force cosine (C5) is the
  * exactness baseline, SQ8 is the cheap compressed scan, IVF/PQ/OPQ
  * (C6/C25) are the sublinear paths. SQ is also what the rerank tier
  * typically scans when PQ proposes candidates.
  *
  * Scale shape (100 TB): fitting is ONE partial-agg'd pass (posexplode
  * to (dim, |x|), max per dim — `dim` rows total), re-assembled into a
  * single broadcast row; encode and scoring are map-only `zip_with`/
  * `aggregate` folds inside WholeStageCodegen. No shuffle ever touches
  * a vector; the only wide exchange is the `dim`-row scale agg.
  *
  * Cross-engine determinism (why this carries a FULL SQL oracle,
  * unlike the hash-family ANN screens): quantization itself is exact
  * in both engines (absmax is exact, `round` is half-away-from-zero
  * in both, codes are small integers, the per-dim reconstruction
  * constant is one shared double), so both engines score the SAME
  * reconstructed vectors; the cosine then rounds to 4 decimals — the
  * C5 oracle's own float-parity stance. */
object Sq {

  private def toDoubles(vec: Column): Column =
    transform(vec, v => v.cast("double"))

  /** Per-dimension absmax scales as a ONE-ROW DataFrame
    * `(scales: array<double>)`, index-aligned with the vectors. */
  def fitScales(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(posexplode(toDoubles(col(vecCol))).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(max(abs(col("x"))).as("s"))
      .agg(array_sort(collect_list(struct(col("i"), col("s")))).as("p"))
      .select(transform(col("p"), e => e.getField("s")).as("scales"))

  /** Quantize a vector column against an index-aligned `scales` array
    * column: `round(127·x/s)`, 0 where the dimension is constant-zero.
    * Codes stay a double array (values are exact small integers) so
    * the downstream fold never casts per element. */
  def encode(vec: Column, scales: Column): Column =
    zip_with(toDoubles(vec), scales, (x, s) =>
      when(s > 0d, round(x * lit(127.0) / s)).otherwise(lit(0.0)))

  /** Integer dot product of two code arrays — exact in doubles for any
    * realistic dim (|code| ≤ 127 ⇒ |sum| ≤ dim·16129), so the value is
    * identical on any summation order and any engine. */
  def codeDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Dequantize codes back to approximate values: `c·s/127`. Distances
    * MUST be computed on reconstructed values, never on raw codes —
    * per-dimension scales rescale each axis differently, so the code
    * space is an anisotropic distortion of the original geometry
    * (cosine over raw codes measured 0.02-0.08 off on unit vectors;
    * over reconstructions it is ≤ 0.005 — AccuracySpec). This is the
    * FAISS ScalarQuantizer contract. */
  def decode(codes: Column, scales: Column): Column =
    zip_with(codes, scales, (c, s) => c * s / lit(127.0))

  /** Top-k by cosine over RECONSTRUCTED vectors against `queryId`'s:
    * fit scales → encode+decode corpus and query → broadcast the
    * 1-row (scales, reconstructed query) → map-only codegen'd cosine
    * scan → TakeOrdered k. Output `(idCol, qcos)`; the order key is
    * the ROUNDED score (then id) so the ranking is the hashable
    * output itself. */
  def topK(emb: DataFrame, idCol: String, vecCol: String,
           queryId: Long, k: Int): DataFrame = {
    import graft.functions.VectorFunctions
    val scales = fitScales(emb, vecCol)
    val query = emb.filter(col(idCol) === queryId)
      .select(toDoubles(col(vecCol)).as("qv")).limit(1)
      .join(broadcast(scales))
      .select(decode(encode(col("qv"), col("scales")), col("scales")).as("qr"),
        col("scales"))
    emb.filter(col(idCol) =!= queryId)
      .join(broadcast(query))
      .select(col(idCol),
        round(VectorFunctions.cosineNative(
          decode(encode(col(vecCol), col("scales")), col("scales")),
          col("qr")), 4).as("qcos"))
      .orderBy(col("qcos").desc, col(idCol))
      .limit(k)
  }
}
