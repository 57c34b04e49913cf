package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Linear text-quality classifier trained IN Spark (SURVEY.md §2 C37):
  * the fastText/CCNet-style learned quality filter LLM-corpus
  * pipelines run after the heuristic gates — a logistic regression
  * over hashed bag-of-tokens features, trained by batch gradient
  * descent where every step is one Catalyst aggregation. No MLlib, no
  * driver-side data: the driver only ever holds the weight vector
  * (`dim` doubles).
  *
  * Scale shape (100 TB):
  *  - features are a LONG-FORMAT relation `(id, i, v)` — hashed bucket
  *    and L2-normalized term frequency — built map-side from one text
  *    scan + one (id, bucket) partial-agg'd count; no dense vectors
  *    ever materialize per row;
  *  - each training step is: broadcast-join the `dim`-row weight
  *    relation onto features, partial-agg margins per doc, join errors
  *    back, partial-agg `dim` gradient cells, collect `dim` rows.
  *    Shuffle keys are `id` (high-cardinality) and `i` (≤ `dim`);
  *    nothing single-partition, nothing driver-side but the model;
  *  - the standard corpus-scale stance is train-on-sample,
  *    score-everything: fit on `docs.sample(...)` (quality labels are
  *    weak anyway), then [[score]] is one map-side scan with the
  *    broadcast model.
  *
  * The trained weights depend on float summation order and are NOT
  * bit-reproducible across cluster layouts (documented, like every
  * distributed SGD); [[score]] with FIXED weights is deterministic. */
object Classifier {

  /** Hashed bag-of-tokens features, long format: `(idCol, i, v)` with
    * `i = xxhash64(token) mod dim` and `v` the doc's L2-normalized
    * bucket count. Empty/null texts produce no rows (nothing to score
    * a zero vector with — callers keep them via a left join). */
  def featurize(docs: DataFrame, idCol: String, textCol: String,
                dim: Int): DataFrame = {
    require(dim > 0, "dim must be positive")
    val tok = docs.select(col(idCol).as("id"),
        explode(graft.functions.TextFunctions.tokens(
          coalesce(col(textCol), lit("")))).as("_t"))
      .where(col("_t") =!= "")
      .select(col("id"), pmod(xxhash64(col("_t")), lit(dim)).cast("int").as("i"))
    val counts = tok.groupBy("id", "i").agg(count(lit(1)).cast("double").as("_c"))
    val norms = counts.groupBy("id")
      .agg(sqrt(sum(col("_c") * col("_c"))).as("_norm"))
    counts.join(norms, "id")
      .select(col("id"), col("i"), (col("_c") / col("_norm")).as("v"))
  }

  /** Batch-gradient-descent logistic regression over [[featurize]]d
    * docs. `labeled` must carry `idCol` and an integer/double
    * `labelCol` in {0, 1}. Returns the weight vector (index = hashed
    * bucket). L2 regularization `l2` keeps unseen-bucket weights at
    * zero mean; `iters` full passes (each pass = 2 shuffles, nothing
    * resident but the cached feature relation). */
  def train(spark: SparkSession, labeled: DataFrame, idCol: String,
            textCol: String, labelCol: String, dim: Int = 1024,
            iters: Int = 12, lr: Double = 2.0,
            l2: Double = 1e-4): Array[Double] = {
    import spark.implicits._
    val feats = featurize(labeled, idCol, textCol, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // persisted too: without it every iteration would re-run the full
    // label lineage (source scan + label derivation) inside the errs
    // join
    val labels = labeled.select(col(idCol).as("id"),
      col(labelCol).cast("double").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = labels.count().toDouble
    require(n > 0, "no labeled rows")
    val w = new Array[Double](dim)
    try {
      for (_ <- 0 until iters) {
        val wDf = w.toSeq.zipWithIndex.map { case (wt, i) => (i, wt) }
          .toDF("i", "w")
        // margin per doc -> error per doc -> gradient per bucket:
        // every stage partial-aggregates; only `dim` rows come back
        val margins = feats.join(broadcast(wDf), "i")
          .groupBy("id").agg(sum(col("v") * col("w")).as("m"))
        val errs = labels.join(margins, Seq("id"), "left")
          .select(col("id"),
            (lit(1.0) / (lit(1.0) + exp(-coalesce(col("m"), lit(0.0))))
              - col("y")).as("e"))
        val grad = feats.join(errs, "id")
          .groupBy("i").agg(sum(col("v") * col("e")).as("g"))
          .collect()
        grad.foreach { r =>
          val i = r.getInt(0)
          w(i) -= lr * (r.getDouble(1) / n + l2 * w(i))
        }
      }
    } finally { feats.unpersist(); labels.unpersist(); () }
    w
  }

  /** ENGINE-PORTABLE featurization for the gate config: bucket =
    * first 2 hex chars of md5(token) (256 buckets — the C27 DSIR
    * bucket key, exactly `substr(md5(tok), 1, 2)` in any engine),
    * value = the doc's INTEGER occurrence count. No hash seed, no
    * float normalization — every cell replays bit-identically. */
  def featurizePortable(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(graft.functions.TextFunctions.tokens(
          coalesce(col(textCol), lit("")))).as("_t"))
      .where(col("_t") =!= "")
      .select(col("id"), substring(md5(col("_t")), 1, 2).as("bucket"))
      .groupBy("id", "bucket").agg(count(lit(1)).as("c"))

  /** ENGINE-PORTABLE trainer — the integer-GD gate configuration (the
    * stance that promoted the ANN family to hash-green): a PERCEPTRON
    * over [[featurizePortable]]'s integer counts. Per iteration:
    * integer margin `m = Σ c·w` per doc, prediction `m > 0`, error
    * `e = y − pred ∈ {−1,0,1}`, integer gradient `Σ e·c` per bucket,
    * unit-learning-rate update `w += g`. Every quantity is an int64 —
    * no sigmoid, no float sum order, no seed — so a FIXED number of
    * iterations replays bit-identically in any engine and the whole
    * train+score chain SQL-oracles (a generated DuckDB mirror unrolls
    * the iterations with each state referencing its predecessor, the
    * C71/C76 round-unrolled stance). [[train]] (float logistic GD)
    * stays the quality path for real filters; this is the gate's
    * exactness configuration, same distributed shape: per-iteration
    * broadcast-joined weights, doc-keyed then bucket-keyed partial
    * aggs, only the ≤256-row gradient ever collected.
    *
    * Overflow: |w| grows ≤ Σ|c| per iteration ≤ corpus tokens; margins
    * ≤ 256·max|w|·max c — at 10¹² tokens and 4 iterations still well
    * inside int64 (≈4·10¹⁴ worst case). */
  def trainPortable(spark: SparkSession, labeled: DataFrame, idCol: String,
                    textCol: String, labelCol: String,
                    iters: Int = 4): Map[String, Long] = {
    import spark.implicits._
    require(iters >= 1, "need at least one iteration")
    // persisted PARTITIONED BY id (r19, guide §2.4 shared exchange):
    // every iteration's margin groupBy(id) and gradient join(id) then
    // reuse the cached partitioning instead of re-exchanging the
    // feature relation — one exchange up front buys 2·iters removed.
    // Integer arithmetic: the layout cannot change any sum.
    val feats = featurizePortable(labeled, idCol, textCol)
      .repartition(col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val labels = labeled.select(col(idCol).as("id"),
      col(labelCol).cast("long").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var w = Map.empty[String, Long]
    try {
      for (_ <- 0 until iters) {
        val wDf = w.toSeq.toDF("bucket", "w")
        val margins = feats.join(broadcast(wDf), Seq("bucket"), "left")
          .groupBy("id")
          .agg(sum(col("c") * coalesce(col("w"), lit(0L))).as("m"))
        val errs = labels.join(margins, Seq("id"), "left")
          .select(col("id"), (col("y") -
            when(coalesce(col("m"), lit(0L)) > 0L, 1L).otherwise(0L)).as("e"))
        val grad = feats.join(errs, "id")
          .groupBy("bucket").agg(sum(col("c") * col("e")).as("g"))
          .collect()
        grad.foreach { r =>
          val g = r.getLong(1)
          if (g != 0L) {
            val b = r.getString(0)
            w = w.updated(b, w.getOrElse(b, 0L) + g)
          }
        }
      }
    } finally { feats.unpersist(); labels.unpersist(); () }
    w
  }

  /** Integer margin + verdict for every doc under fixed portable
    * `weights`: (idCol, margin, pred) with `pred = margin > 0`. Docs
    * with no features score margin 0, pred false, via the left join.
    * Bit-identical in any engine for fixed weights. */
  def scorePortable(docs: DataFrame, idCol: String, textCol: String,
                    weights: Map[String, Long]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wDf = weights.toSeq.toDF("bucket", "w")
    val margins = featurizePortable(docs, idCol, textCol)
      .join(broadcast(wDf), Seq("bucket"), "left")
      .groupBy("id")
      .agg(sum(col("c") * coalesce(col("w"), lit(0L))).as("__cls_m"))
      .withColumnRenamed("id", "__cls_id")
    docs.join(margins, docs(idCol) === margins("__cls_id"), "left")
      .select(docs(idCol),
        coalesce(col("__cls_m"), lit(0L)).as("margin"),
        (coalesce(col("__cls_m"), lit(0L)) > 0L).as("pred"))
  }

  /** Probability-of-positive for every doc under fixed `weights`: one
    * feature scan + a broadcast `dim`-row join + a per-doc partial
    * agg. Docs with no features (empty text) score sigmoid(0) = 0.5
    * via the left join. Deterministic for fixed weights modulo float
    * summation order; round before hashing across engines. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            weights: Array[Double]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wDf = weights.toSeq.zipWithIndex.map { case (wt, i) => (i, wt) }
      .toDF("i", "w")
    // collision-proof internal names: docs may itself carry an `id`
    // column (or idCol may BE "id") — join on an expression against
    // renamed margin columns instead of touching docs' schema
    val margins = featurize(docs, idCol, textCol, weights.length)
      .join(broadcast(wDf), "i")
      .groupBy("id").agg(sum(col("v") * col("w")).as("__cls_m"))
      .withColumnRenamed("id", "__cls_id")
    docs.join(margins, docs(idCol) === margins("__cls_id"), "left")
      .withColumn("prob",
        lit(1.0) / (lit(1.0) + exp(-coalesce(col("__cls_m"), lit(0.0)))))
      .drop("__cls_id", "__cls_m")
  }
}
