package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** DSIR-style importance weighting (SURVEY.md §2 C27): score every
  * document by how much more likely its hashed bag-of-words is under a
  * TARGET distribution (e.g. the high-quality subset you want more of)
  * than under the RAW corpus distribution — `log w(x) = Σ_f c_f(x) ·
  * (ln p_tgt(f) − ln p_raw(f))` with add-one smoothing over hashed
  * feature buckets (Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling"). Downstream, resample the corpus
  * proportionally to `exp(log_weight)` — the deterministic md5-prefix
  * sampler ([[graft.queries.DocQueries]] C14) is the repo's
  * reproducible way to draw that sample.
  *
  * Feature buckets are the first two md5 hex digits of each token
  * (256 buckets) — lowercase hex in Spark and DuckDB alike, so any
  * engine derives the same features (the C14 stance; never a
  * JVM-private hash).
  *
  * Scale design (100 TB): one token-explode pass feeds BOTH model
  * counts (conditional agg to ≤256 rows, partial-agg'd map-side) and
  * per-doc bucket counts (partial-agg'd on (doc, bucket)); the
  * 256-row λ model joins back by broadcast; totals are a 1-row
  * broadcast cross join. No driver-side model state, no UDFs, no
  * unbounded row width. */
object Dsir {

  /** Hashed feature bucket of a token: 2 md5 hex digits, 256 buckets. */
  def bucket(tok: Column): Column = substring(md5(tok), 1, 2)

  /** The 256-row model: per-bucket `lambda = ln p_tgt − ln p_raw`
    * (add-one smoothed). `isTarget` marks the rows defining the
    * target distribution (raw = ALL rows, target included). Buckets
    * absent from the corpus carry no row — harmless, because scoring
    * joins on buckets that occur in documents, all of which the raw
    * count saw. */
  def bucketLogRatios(docs: DataFrame, textCol: String,
                      isTarget: Column): DataFrame = {
    val tb = docs
      .select(isTarget.as("is_tgt"),
        explode(TextFunctions.tokens(coalesce(col(textCol), lit("")))).as("tok"))
      .select(col("is_tgt"), bucket(col("tok")).as("bucket"))
    val counts = tb.groupBy("bucket")
      .agg(count(lit(1)).as("c_raw"),
           sum(when(col("is_tgt"), 1L).otherwise(0L)).as("c_tgt"))
    val totals = counts.agg(sum("c_raw").as("n_raw"), sum("c_tgt").as("n_tgt"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((col("c_tgt") + 1).cast("double") /
             (col("n_tgt") + 256).cast("double")) -
         log((col("c_raw") + 1).cast("double") /
             (col("n_raw") + 256).cast("double"))).as("lambda"))
  }

  /** Per-doc importance log-weight: Σ bucket-count · λ, rounded 4 via
    * [[TextFunctions.round4]] (scaled-double rounding, the repo's
    * hashable float precision — plain `round(x, 4)` diverges from the
    * DuckDB oracle on .xxxx5 scaled-tie values). Every doc scores —
    * even an empty text tokenizes to one "" token, so no doc silently
    * drops out of the resampling pool; null text is coalesced to ""
    * for the same reason. The `+ 0.0` normalizes IEEE negative zero:
    * a tiny negative sum rounds to −0.0 in DuckDB but +0.0 here, and
    * the driver's hash compares formatted strings — both sides carry
    * the same normalization. */
  def scoreDocs(docs: DataFrame, textCol: String, idCol: String,
                ratios: DataFrame): DataFrame =
    docs.select(col(idCol),
        explode(TextFunctions.tokens(coalesce(col(textCol), lit("")))).as("tok"))
      .select(col(idCol), bucket(col("tok")).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("c"))
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(idCol))
      .agg((TextFunctions.round4(sum(col("c") * col("lambda"))) + lit(0.0))
        .as("log_weight"))
}
