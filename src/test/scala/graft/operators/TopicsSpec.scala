package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Labeling contract of [[Topics]] (C38): planted vocabulary clusters
  * must be named by their own vocabulary, a term-spamming doc must not
  * out-rank genuinely spread terms (distinct-per-doc counting), and
  * frozen centroids must reproduce the report exactly. */
class TopicsSpec extends SparkSpec {

  private val vocab = Seq(
    Seq("finance", "market", "stock", "trade", "price", "asset"),
    Seq("soccer", "goal", "match", "league", "player", "coach"),
    Seq("neuron", "cortex", "synapse", "brain", "memory", "axon"))

  /** 3 planted clusters: group g's docs draw text from vocab(g) and
    * sit on embedding basis axis g (tiny deterministic within-axis
    * jitter). Doc 0 additionally spams one rare token 50 times. */
  private def corpus() = {
    import spark.implicits._
    val rows = (0 until 60).map { i =>
      val g = i % 3
      val words = (0 until 12).map(j => vocab(g)((i + j) % 6))
      val text = (if (i == 0) Seq.fill(50)("zzuniq") else Nil) ++ words
      val e = Array.tabulate(4)(d =>
        if (d == g) 1.0f else 0.001f * ((i + d) % 5))
      (i.toLong, text.mkString(" "), e)
    }
    (rows.map(r => (r._1, r._2)).toDF("doc_id", "text"),
      rows.map(r => (r._1, r._3)).toDF("vec_id", "embedding"))
  }

  test("planted vocabulary clusters are labeled by their own vocabulary") {
    val (docs, emb) = corpus()
    val report = Topics.report(docs, emb, "doc_id", "text", "vec_id",
      "embedding", k = 3, topTerms = 4).collect()
    assert(report.length == 12, "4 terms per cell, 3 cells")
    // every cell's entire top-4 comes from ONE group's vocabulary —
    // the cells separated the groups and the terms name them
    val byCell = report.groupBy(_.getInt(0))
    assert(byCell.size == 3)
    byCell.values.foreach { rows =>
      val terms = rows.map(_.getString(3)).toSet
      val homes = vocab.zipWithIndex.filter { case (v, _) =>
        terms.subsetOf(v.toSet)
      }
      assert(homes.size == 1, s"cell terms $terms straddle vocabularies")
      assert(rows.head.getLong(1) == 20, "balanced plant: 20 docs/cell")
    }
    // the 50x-repeated rare token never out-ranks spread terms
    assert(!report.map(_.getString(3)).contains("zzuniq"),
      "distinct-per-doc counting must keep the spam token out")
  }

  test("frozen centroids reproduce the report exactly") {
    val (docs, emb) = corpus()
    val centroids = Ivf.fitCentroids(emb, "vec_id", "embedding", k = 3,
      iters = 3, seed = 42L)
    def run() = Topics.reportWithCentroids(docs, emb, "doc_id", "text",
      "vec_id", "embedding", centroids, topTerms = 4)
      .collect().map(r => (r.getInt(0), r.getInt(2), r.getString(3),
        r.getDouble(4))).sortBy(t => (t._1, t._2)).toSeq
    assert(run() == run())
  }
}
