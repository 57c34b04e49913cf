package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C35 — cluster-balanced corpus sampling (topic-diversity mixing).
  *
  * Web-scale corpora are dominated by a few giant topic modes; a
  * uniform draw reproduces the skew, so curation pipelines cluster the
  * embedding space and take a bounded quota per cluster — rare topics
  * survive, dominant ones are capped (the cluster-balanced selection
  * step of SemDeDup-style and DCLM-style curation recipes).
  *
  * Built from pieces this engine already has:
  *   - k-means cells from [[Ivf.fitCentroids]] (deterministic
  *     hash-ordered init, fixed seed) as the topic proxy;
  *   - [[Ivf.assignCells]] for the single broadcast-join assignment
  *     pass (k-independent plan, one shuffle on the doc id);
  *   - a deterministic within-cell order — md5(id, seed) — the same
  *     reproducibility contract as stratified sampling (C14).
  *
  * Scale shape: ONE window partitioned by centroid_id, carrying only
  * the `row_number` — rank-limit-pushed (WindowGroupLimit), so each
  * cell keeps only `perCell` rows through the sort rather than
  * sorting whole cells. `cell_size` is NOT a window count (an
  * unbounded-frame count defeats the group limit and forces every hot
  * cell's rows through one task): it is a groupBy on `centroid_id` —
  * a MODEL-sized k-row relation — broadcast-joined back. Cell skew
  * beyond that is k-means skew, bounded by the cell count the caller
  * picks.
  */
object ClusterSample {

  /** Per-cluster quota sample: ≤ `perCell` docs from each k-means cell,
    * chosen by deterministic hash rank. Returns (idCol, centroid_id,
    * cell_size) — cell_size is the pre-sample cell population, the
    * skew-vs-coverage accounting a mixing report needs. */
  def sample(emb: DataFrame, idCol: String, vecCol: String, k: Int,
             perCell: Int, iters: Int = 3, seed: Long = 42L): DataFrame = {
    val centroids = Ivf.fitCentroids(emb, idCol, vecCol, k, iters, seed)
    sampleWithCentroids(emb, idCol, vecCol, centroids, perCell, seed)
  }

  /** Same, against a FROZEN centroid set — the index-reuse / daily-
    * delta path ([[Ivf.IvfIndex.append]]'s counterpart for sampling:
    * yesterday's centroids keep today's sample comparable). */
  def sampleWithCentroids(emb: DataFrame, idCol: String, vecCol: String,
                          centroids: Seq[Array[Double]], perCell: Int,
                          seed: Long = 42L): DataFrame = {
    require(perCell >= 1, s"perCell=$perCell must be >= 1")
    val assigned = Ivf.assignCells(emb, idCol, vecCol, centroids)
      // read once, feed twice (sizes + rank) — without the cut the
      // whole assignment subtree (centroid broadcast join + argmin
      // agg) plans and runs twice
      .localCheckpoint()
    quotaSample(assigned, idCol, perCell, seed)
  }

  /** ENGINE-PORTABLE configuration: cells from [[Ivf.seedCentroids]] +
    * integer-L2 [[Ivf.assignCellsPortable]] (every comparison an
    * integer — see the Ivf scaladoc for when to prefer this over the
    * Lloyd-refined quantizer), then the same deterministic quota
    * sample. The whole relation replays bit-identically on any
    * engine, which is what makes it SQL-oracle-able. */
  def samplePortable(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                     perCell: Int, seed: Long = 42L): DataFrame = {
    require(perCell >= 1, s"perCell=$perCell must be >= 1")
    val assigned = Ivf.assignCellsPortable(emb, idCol, vecCol,
        Ivf.seedCentroids(emb, idCol, vecCol, k))
      .localCheckpoint() // same read-once cut as the float path
    quotaSample(assigned, idCol, perCell, seed)
  }

  /** The shared quota pass over any assigned relation: k-row cell
    * sizes broadcast back, group-limited hash-rank window. */
  private def quotaSample(assigned: DataFrame, idCol: String,
                          perCell: Int, seed: Long): DataFrame = {
    val rankKey = md5(concat(col(idCol).cast("string"), lit(":"), lit(seed)))
    val sizes = assigned.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("cell_size"))
    assigned
      .withColumn("__r", row_number().over(
        Window.partitionBy("centroid_id").orderBy(rankKey, col(idCol))))
      .filter(col("__r") <= perCell)
      .join(broadcast(sizes), "centroid_id")
      .select(col(idCol), col("centroid_id"), col("cell_size"))
  }
}
