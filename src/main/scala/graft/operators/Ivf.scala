package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** IVF (inverted-file) approximate nearest neighbor over an embedding
  * column — the coarse-quantizer scale path complementing the LSH one
  * (SURVEY.md §2 C6).
  *
  * The coarse quantizer is Lloyd's k-means expressed as DataFrame
  * programs: assignment is a map-only pass against broadcast centroid
  * literals (constant-folded arrays, scored by the codegen'd
  * `graft_cosine`), the update step is posexplode + groupBy (cid,
  * dim) mean — both linear, both shuffle-light. k centroids live on
  * the driver between iterations (k × dim doubles — trivially small).
  *
  * Query path: probe the `nprobe` centroids nearest to the query, then
  * brute-force only within those cells. At 100 TB the corpus can be
  * written bucketed by `centroid_id` so a probe prunes file groups.
  */
object Ivf {

  /** Centroids after `iters` Lloyd iterations, as driver-side arrays.
    * Initialization is a deterministic hash-ordered sample. */
  def fitCentroids(emb: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int = 5, seed: Long = 42L): Seq[Array[Double]] = {
    val base = emb.select(col(idCol).as("id"), toDoubles(col(vecCol)).as("v"))
    var centroids: Seq[Array[Double]] = base
      .orderBy(xxhash64(col("id"), lit(seed)))
      .limit(k)
      .collect().map(_.getSeq[Double](1).toArray).toSeq
    for (_ <- 0 until iters) {
      val assigned = withAssignment(base, "v", centroids)
      val updated = assigned
        .select(col("centroid_id"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("centroid_id", "dim")
        .agg(avg("x").as("m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dims"))
        .select(col("centroid_id"),
          transform(col("dims"), d => d.getField("m")).as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      // empty cells keep their previous centroid
      centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i)))
    }
    centroids
  }

  /** Adds `centroid_id` = argmax cosine over the (constant-folded)
    * centroid literals. */
  private def withAssignment(df: DataFrame, vCol: String,
                             centroids: Seq[Array[Double]]): DataFrame = {
    val sims = array(centroids.map(c =>
      cosineNative(col(vCol), array(c.toIndexedSeq.map(lit): _*))): _*)
    df.withColumn("sims", sims)
      .withColumn("centroid_id",
        (array_position(col("sims"), array_max(col("sims"))) - 1).cast("int"))
      .drop("sims")
  }

  /** Top-k by cosine against the vector with id `queryId`, searching
    * only the `nprobe` cells nearest to the query. */
  def topK(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
           queryId: Long, k: Int, numCentroids: Int = 16, nprobe: Int = 4,
           iters: Int = 3, seed: Long = 42L): DataFrame = {
    val centroids = fitCentroids(emb, idCol, vecCol, numCentroids, iters, seed)
    val base = withAssignment(
      emb.select(col(idCol), toDoubles(col(vecCol)).as("v")), "v", centroids)
    val query = base.filter(col(idCol) === queryId)
      .select(col("v").as("qv")).limit(1)
    val qv = query.collect().head.getSeq[Double](0).toArray
    def cosineLocal(c: Array[Double]): Double = {
      val dot = c.zip(qv).map { case (a, b) => a * b }.sum
      val d = math.sqrt(c.map(x => x * x).sum) * math.sqrt(qv.map(x => x * x).sum)
      if (d == 0.0) 0.0 else dot / d
    }
    val probeCells = centroids.zipWithIndex
      .sortBy { case (c, _) => -cosineLocal(c) }
      .take(nprobe).map(_._2)
    base
      .filter(col("centroid_id").isin(probeCells.map(x => x: Any): _*))
      .filter(col(idCol) =!= queryId)
      .join(broadcast(query))
      .select(col(idCol), round(cosineNative(col("v"), col("qv")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
