package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
    val query  = emb.filter(col(idCol) === queryId).select(v.as("qv"))
    corpus.join(broadcast(query))
      .select(col(idCol), round(cosine(col("v"), col("qv")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic random hyperplanes (seeded driver-side, broadcast as
    * literals into the plan — no RNG at execution time). */
  private def hyperplanes(dim: Int, bits: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** C6 — LSH-bucketed ANN: sign-of-dot-product against `bits` random
    * hyperplanes forms the bucket key; cosine pairs are computed only
    * within buckets. Bucket keys are the shuffle key (2^bits spread).
    * Returns within-bucket pairs with cosine ≥ `threshold`. */
  def lshCosinePairs(spark: SparkSession, emb: DataFrame, idCol: String,
                     vecCol: String, bits: Int = 12, dim: Int = 64,
                     threshold: Double = 0.6, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, bits, seed)
    val v = toDoubles(col(vecCol))
    val bucketBits = planes.zipWithIndex.map { case (p, i) =>
      val lp = array(p.map(lit): _*)
      when(dot(v, lp) >= 0.0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    val bucketed = emb.select(col(idCol), v.as("v"),
      bucketBits.reduce(_.bitwiseOR(_)).as("bucket"))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"), col("v").as("va"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"), col("v").as("vb"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
              round(cosine(col("va"), col("vb")), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
