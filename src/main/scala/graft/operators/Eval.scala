package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Filter/classifier evaluation metrics (C75).
  *
  * Every model-based curation gate (the C37 quality classifier, DSIR
  * weights, perplexity cuts) needs its operating curve measured
  * against a reference labeling before anyone trusts it on 100 TB —
  * this operator computes tie-corrected ROC-AUC and the
  * precision/recall operating points, engine-exactly.
  *
  * Scale shape: scores are expected ROUNDED (the repo's round4
  * stance), so the per-score histogram `groupBy` has ≤ 10⁴ groups
  * regardless of corpus size — ONE partial-agg'd corpus pass, then
  * every rank/cumulative trick runs on the tiny histogram (the
  * windows below sort ≤ 10⁴ rows, never the corpus). AUC uses the
  * Mann–Whitney rank-sum with midranks for ties, kept in INTEGER
  * arithmetic (doubled ranks) until the single final division.
  */
object Eval {

  /** Tie-corrected ROC-AUC of `scoreCol` predicting `labelCol`
    * (0/1 int): one row (auc, n_pos, n_neg).
    *
    * Midrank identity in doubled-integer space: for a score group g
    * with n_g rows (p_g positive) and c_g rows strictly below,
    * 2·midrank_g = 2·c_g + n_g + 1, so
    * 2·Σ ranks⁺ = Σ p_g·(2c_g + n_g + 1) and
    * AUC = (2·Σ ranks⁺ − n⁺(n⁺+1)) / (2 n⁺ n⁻). */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val h = scoreHist(df, scoreCol, labelCol)
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    h.select(col("score"), col("n"), col("np"),
        coalesce(sum(col("n")).over(w), lit(0L)).as("c"))
      .agg(
        sum(col("np") * (lit(2) * col("c") + col("n") + 1)).as("s2"),
        sum(col("np")).as("n_pos"),
        sum(col("n") - col("np")).as("n_neg"))
      .select(
        TextFunctions.round4(
          (col("s2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
            greatest(lit(2.0) * col("n_pos") * col("n_neg"), lit(1.0)))
          .as("auc"),
        col("n_pos").cast("long").as("n_pos"),
        col("n_neg").cast("long").as("n_neg"))
  }

  /** Operating points at the given thresholds (keep = score ≥ t): one
    * row per threshold with the confusion counts and rounded
    * precision/recall/F1. Computed from the same histogram — the
    * threshold sweep is a ≤ |thresholds|×10⁴ join on the tiny side. */
  def prAtThresholds(df: DataFrame, scoreCol: String, labelCol: String,
                     thresholds: Seq[Double]): DataFrame = {
    val h = scoreHist(df, scoreCol, labelCol).localCheckpoint()
    val t = h.sparkSession.createDataFrame(
      thresholds.map(Tuple1(_))).toDF("thr")
    t.crossJoin(h)
      .groupBy(col("thr"))
      .agg(
        sum(when(col("score") >= col("thr"), col("np"))
          .otherwise(lit(0L))).as("tp"),
        sum(when(col("score") >= col("thr"), col("n") - col("np"))
          .otherwise(lit(0L))).as("fp"),
        sum(when(col("score") < col("thr"), col("np"))
          .otherwise(lit(0L))).as("fn"),
        sum(when(col("score") < col("thr"), col("n") - col("np"))
          .otherwise(lit(0L))).as("tn"))
      .select(TextFunctions.round4(col("thr")).as("thr"),
        col("tp").cast("long").as("tp"), col("fp").cast("long").as("fp"),
        col("fn").cast("long").as("fn"), col("tn").cast("long").as("tn"),
        TextFunctions.round4(col("tp").cast("double") /
          greatest(col("tp") + col("fp"), lit(1L))).as("precision"),
        TextFunctions.round4(col("tp").cast("double") /
          greatest(col("tp") + col("fn"), lit(1L))).as("recall"))
  }

  /** The per-score histogram both metrics run on: (score, n, np). */
  private def scoreHist(df: DataFrame, scoreCol: String,
                        labelCol: String): DataFrame =
    df.groupBy(col(scoreCol).as("score"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("np"))

  /** C85 — calibration (reliability) report of a [0, 1] score
    * predicting a 0/1 label: per score bucket, the count, positives,
    * mean predicted score and observed positive fraction — the plot
    * every classifier-gated curation pipeline reads next to its C75
    * AUC (a well-ranked score can still be mis-CALIBRATED, and
    * threshold choices come off this table, not off AUC).
    *
    * Scores are expected ROUNDED to 4 (the repo stance). Bucketing
    * and the mean stay ENGINE-EXACT by scaling to integer ten-
    * thousandths first: bucket = min(si·bins div 10⁴, bins−1) puts
    * every decimal boundary exactly where it claims (float
    * `floor(0.3·10)` is 2 in IEEE — the classic binning bug this
    * sidesteps), and the mean divides an exact BIGINT sum once at the
    * end. Shape: ONE partial-agg'd pass to ≤ `bins` rows. */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
                  bins: Int = 10): DataFrame = {
    require(bins >= 1, "bins must be positive")
    // NULL scores are excluded EXPLICITLY: unfiltered, a NULL rides the
    // multiply/div to a NULL bucket key, but Spark's least/greatest
    // SKIP nulls, so least(NULL, bins-1) = bins-1 silently lands the
    // row in the TOP bucket while its si is dropped from ssum — a
    // skewed mean_score and a cross-engine divergence (older DuckDB
    // least() returns NULL instead). A scoreless row is not a
    // calibration observation; callers wanting to count them join an
    // accounting filter upstream.
    df.where(col(scoreCol).isNotNull)
      .select(round(col(scoreCol) * 10000).cast("long").as("si"),
        col(labelCol).cast("long").as("lab"))
      // clamp BOTH ends: scores are contracted to [0, 1], but an
      // out-of-range score must land in a well-defined edge bucket in
      // every engine (negative integer division truncates in Spark and
      // floors in DuckDB — unclamped, a negative score would diverge)
      .withColumn("bucket",
        greatest(least(expr(s"si * $bins div 10000"), lit(bins - 1L)),
          lit(0L)).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("lab")).as("n_pos"),
        sum(col("si")).as("ssum"))
      .select(col("bucket"), col("n"), col("n_pos"),
        TextFunctions.round4(
          col("ssum").cast("double") / (col("n") * 10000.0)).as("mean_score"),
        TextFunctions.round4(
          col("n_pos").cast("double") / col("n")).as("frac_pos"))
  }

  /** C84 — distribution-drift report between two corpus slices (a
    * reference corpus and an incoming delta, two sources, two
    * pipeline versions) over any non-negative integer metric (token
    * count, char length, chunk count): one row per LOG2 bucket with
    * both sides' counts, cumulative shares, and the cumulative-share
    * gap whose maximum is the Kolmogorov–Smirnov statistic — the
    * "did this drop shift the distribution?" monitor a pipeline
    * checks before admitting a crawl (a KS gap at the short-doc
    * buckets is the classic boilerplate-regression signature).
    *
    * Buckets are `length(bin(x + 1)) − 1` = ⌊log2(x+1)⌋ computed on
    * the BINARY STRING, not a float log — exact at every power-of-two
    * boundary in any engine, which is what lets the whole relation
    * hash-oracle. Shares divide once at the end and round to 4.
    *
    * Scale shape: ONE partial-agg'd pass per side to ≤ 64 bucket
    * rows; the cumulative windows sort those rows, never a corpus
    * (the [[rocAuc]] histogram stance). Empty sides yield zero
    * shares, not a divide error. */
  def histogramDrift(a: DataFrame, b: DataFrame,
                     valueCol: String): DataFrame = {
    def side(df: DataFrame, cnt: String) =
      df.select((length(bin(col(valueCol).cast("long") + 1)) - 1)
          .cast("int").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(cnt))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    side(a, "n_a").join(side(b, "n_b"), Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
      .withColumn("ca", sum(col("n_a")).over(w))
      .withColumn("cb", sum(col("n_b")).over(w))
      .crossJoin(broadcast(
        a.agg(count(lit(1)).as("ta")).crossJoin(b.agg(count(lit(1)).as("tb")))))
      .select(col("bucket"), col("n_a"), col("n_b"),
        TextFunctions.round4(when(col("ta") === 0, 0.0)
          .otherwise(col("ca").cast("double") / col("ta"))).as("cum_a"),
        TextFunctions.round4(when(col("tb") === 0, 0.0)
          .otherwise(col("cb").cast("double") / col("tb"))).as("cum_b"))
      .withColumn("gap",
        TextFunctions.round4(abs(col("cum_a") - col("cum_b"))))
  }

  /** C95 — inter-rater agreement (Fleiss '71, generalized to unequal
    * raters-per-item): one row per `groupCol` value with the observed
    * pairwise agreement, the chance agreement from the category
    * marginals, and their kappa. The QC gate every preference/RLHF
    * labeling run needs before its labels train anything: kappa near
    * 0 means the "labels" are noise no matter how many raters voted.
    *
    * INTEGER-EXACT accounting (the [[rocAuc]] stance): per (item,
    * category) vote counts n_ic are integers, agreeing pairs
    * Σ n_ic(n_ic−1) and total pairs Σ n_i(n_i−1) are exact bigints,
    * the chance numerator Σ_c (Σ_i n_ic)² likewise; po/pe/kappa are
    * each ONE IEEE division (or ratio of two) of those exact
    * integers, rounded to 4 — bit-identical in any engine. Items
    * with a single rating contribute 0 pairs (never a divide error);
    * a group where pe = 1 (every vote one category) yields NULL
    * kappa, the undefined case.
    *
    * Scale shape: two chained partial-agg'd groupBys (ratings →
    * (group, item, label) → (group, item)) plus a marginals branch —
    * every relation after the first pass is item- or category-sized,
    * nothing collects. */
  def raterAgreement(ratings: DataFrame, groupCol: String, itemCol: String,
                     raterCol: String, labelCol: String): DataFrame = {
    val perLabel = ratings
      .groupBy(col(groupCol), col(itemCol), col(labelCol))
      .agg(count(lit(1)).as("nc"))
    val perItem = perLabel
      .groupBy(col(groupCol), col(itemCol))
      .agg(sum(col("nc") * (col("nc") - 1)).as("agree"),
           sum(col("nc")).as("ni"))
    val pairs = perItem.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_items"),
           sum(col("ni")).as("n_ratings"),
           sum(col("agree")).as("pairs_agree"),
           sum(col("ni") * (col("ni") - 1)).as("pairs_total"))
    val marginals = perLabel
      .groupBy(col(groupCol), col(labelCol))
      .agg(sum(col("nc")).as("votes"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_categories"),
           sum(col("votes") * col("votes")).as("pe_num"))
    // a group with ZERO rating pairs (every item singly rated) has no
    // pairwise evidence at all: po and kappa are UNDEFINED there, not
    // zero — forcing po = 0 would fabricate kappa = -pe/(1-pe), a
    // strong "systematic disagreement" verdict from nothing
    val po = when(col("pairs_total") > 0L,
      col("pairs_agree").cast("double") / col("pairs_total").cast("double"))
    val pe = col("pe_num").cast("double") /
      (col("n_ratings").cast("double") * col("n_ratings").cast("double"))
    pairs.join(marginals, Seq(groupCol))
      .select(col(groupCol), col("n_items"), col("n_ratings"),
        col("n_categories"), col("pairs_agree"), col("pairs_total"),
        TextFunctions.round4(po).as("po"),
        TextFunctions.round4(pe).as("pe"),
        TextFunctions.round4(
          when(col("pairs_total") > 0L && pe < 1.0,
            (po - pe) / (lit(1.0) - pe))).as("kappa"))
  }
}
