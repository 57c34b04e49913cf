package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared unknown-query contract of every ANN serve path
  * (brute-force, IVF, PQ): one bounded single-row fetch of the query
  * vector, and one definition of the empty result an unknown id maps
  * to — `(idCol, cosine double)` with zero rows — so the contract
  * cannot drift between the implementations. */
private[operators] object Ann {

  /** The query vector as a driver-side array, or None when `queryId`
    * does not exist. Bounded by construction (LIMIT 1). */
  def queryVector(df: DataFrame, idCol: String, vec: Column,
                  queryId: Long): Option[Array[Double]] =
    df.filter(col(idCol) === queryId).select(vec).limit(1).collect()
      .headOption.map(_.getSeq[Double](0).toArray)

  /** Zero rows, contract schema — what every topK returns for an
    * unknown query id (vs a bare NoSuchElementException). */
  def emptyTopK(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol), lit(0.0).cast("double").as("cosine")).limit(0)

  /** Driver-side cosine for centroid probing (k×nprobe tiny arrays —
    * never data-sized). */
  def localCosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }
}
