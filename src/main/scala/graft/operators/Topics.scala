package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster topic labeling (SURVEY.md §2 C38): WHAT each region of the
  * embedding space contains, as humans read it — k-means cells over
  * the embeddings (the C35 topic proxies) labeled by their most
  * DISTINGUISHING terms, scored cell-term-frequency × corpus-IDF. The
  * corpus-exploration step every curation pipeline runs before
  * deciding what to up/down-sample: C35 balances the mixture, this
  * names what the mixture's parts are.
  *
  * Scale shape (100 TB):
  *  - cell assignment is the C6 broadcast-join (k centroid rows
  *    broadcast, map-side argmin) — no shuffle on the embedding side;
  *  - term stats are two partial-agg'd groupBys ((cell, term) counts
  *    and per-term document frequencies) shuffled on high-cardinality
  *    term keys;
  *  - the per-cell top-`topTerms` rank is a `row_number` over cells —
  *    k partitions, WindowGroupLimit-pushed so no cell ever fully
  *    sorts its vocabulary;
  *  - the IDF join broadcasts nothing corpus-sized: it joins the two
  *    term aggregates on `term` and AQE splits any hot term.
  *
  * Centroids (and so cell ids) are engine-specific — the report
  * carries a spec, not a SQL oracle, like every k-means consumer. */
object Topics {

  /** Per-cell keyword report: `(cell, cell_docs, rank, term, score)` —
    * `topTerms` rows per cell, rank 1 = most distinguishing. `docs`
    * and `emb` join on their id columns (inner: unembedded docs can't
    * be placed, docless vectors can't be labeled). Terms shorter than
    * `minTermLen` are noise-gated. */
  def report(docs: DataFrame, emb: DataFrame, docIdCol: String,
             textCol: String, embIdCol: String, vecCol: String,
             k: Int, topTerms: Int = 8, iters: Int = 3,
             seed: Long = 42L, minTermLen: Int = 3): DataFrame = {
    require(k >= 1 && topTerms >= 1, "k and topTerms must be >= 1")
    val centroids = Ivf.fitCentroids(emb, embIdCol, vecCol, k, iters, seed)
    reportWithCentroids(docs, emb, docIdCol, textCol, embIdCol, vecCol,
      centroids, topTerms, minTermLen)
  }

  /** Same, against FROZEN centroids — yesterday's cells keep today's
    * report comparable (the [[ClusterSample.sampleWithCentroids]]
    * stance). */
  def reportWithCentroids(docs: DataFrame, emb: DataFrame,
                          docIdCol: String, textCol: String,
                          embIdCol: String, vecCol: String,
                          centroids: Seq[Array[Double]], topTerms: Int = 8,
                          minTermLen: Int = 3): DataFrame = {
    val cells = Ivf.assignCells(emb, embIdCol, vecCol, centroids)
      .select(col(embIdCol).as("_tid"), col("centroid_id").as("cell"))
    reportOverCells(cells, docs, docIdCol, textCol, topTerms, minTermLen,
      rankOnRounded = false)
  }

  /** ENGINE-PORTABLE configuration: cells from [[Ivf.seedCentroids]] +
    * integer-L2 [[Ivf.assignCellsPortable]] (every assignment
    * comparison an integer), and the per-cell rank keyed on the
    * ROUNDED score — `(round4(ctf·idf) desc, term)` — so the one
    * float in the report (the idf log) can never reorder ranks across
    * engines through last-ulp drift: equal rounded scores fall to the
    * exact term tie-break in both. The whole report replays
    * bit-identically on any engine (SQL-oracle-able). */
  def reportPortable(docs: DataFrame, emb: DataFrame, docIdCol: String,
                     textCol: String, embIdCol: String, vecCol: String,
                     k: Int, topTerms: Int = 8,
                     minTermLen: Int = 3): DataFrame = {
    val cells = Ivf.assignCellsPortable(emb, embIdCol, vecCol,
        Ivf.seedCentroids(emb, embIdCol, vecCol, k))
      .select(col(embIdCol).as("_tid"), col("centroid_id").as("cell"))
    reportOverCells(cells, docs, docIdCol, textCol, topTerms, minTermLen,
      rankOnRounded = true)
  }

  /** The shared labeling pass over any (_tid, cell) relation. */
  private def reportOverCells(cells: DataFrame, docs: DataFrame,
                              docIdCol: String, textCol: String,
                              topTerms: Int, minTermLen: Int,
                              rankOnRounded: Boolean): DataFrame = {
    // one token relation feeds BOTH aggregates (distinct per doc:
    // topic terms measure spread across documents, not repetition
    // inside one — a single spammy doc must not name a cluster)
    val docTerms = docs
      .select(col(docIdCol).as("_tid"),
        explode(array_distinct(graft.functions.TextFunctions.tokens(
          coalesce(col(textCol), lit(""))))).as("term"))
      .where(length(col("term")) >= minTermLen)
    val n = docs.count().toDouble
    val idf = docTerms.groupBy("term")
      .agg(count(lit(1)).as("_df"))
      .withColumn("_idf", log(lit(n + 1.0) / (col("_df") + lit(1.0))))
      .select(col("term"), col("_idf"))
    val cellTerms = docTerms.join(cells, "_tid")
      .groupBy(col("cell"), col("term"))
      .agg(count(lit(1)).as("_ctf"))
    val cellSizes = cells.groupBy("cell")
      .agg(count(lit(1)).as("cell_docs"))
    val rawScore = col("_ctf") * col("_idf")
    val ranked = cellTerms.join(idf, "term")
      .withColumn("score",
        if (rankOnRounded) graft.functions.TextFunctions.round4(rawScore)
        else rawScore)
      .withColumn("rank", row_number().over(
        Window.partitionBy("cell")
          .orderBy(col("score").desc, col("term"))))
      .where(col("rank") <= topTerms)
    ranked.join(broadcast(cellSizes), "cell")
      .select(col("cell"), col("cell_docs"), col("rank"), col("term"),
        graft.functions.TextFunctions.round4(col("score")).as("score"))
  }
}
