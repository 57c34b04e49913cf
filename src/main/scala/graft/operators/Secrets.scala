package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** High-entropy secret/credential detection and scrubbing
  * (SURVEY.md §2 C40) — the "don't train on API keys" pass every
  * code/web corpus pipeline runs before tokenization (the
  * detect-secrets / trufflehog stance: a leaked credential is a long
  * token drawn near-uniformly from a wide charset, so its Shannon
  * entropy separates it from natural words).
  *
  * Everything is native Catalyst higher-order functions over the
  * token array — no UDF, no explode: the per-token entropy is a
  * nested `transform`/`filter`/`aggregate` chain that stays inside
  * whole-stage codegen, so the scan is map-only and embarrassingly
  * parallel at 100 TB (filter/scrub shape, like C22's regex redaction
  * which this composes with).
  *
  * A token is a CANDIDATE when its length and distinct-character
  * count clear integer thresholds (cheap guards that prune the
  * entropy computation to rare long tokens), and FLAGGED when its
  * entropy also clears `minEntropy` bits/char. The candidate
  * predicate is integer-only, so cross-engine counts are exact; the
  * entropy cut is float and belongs to the rows-only/spec side of the
  * contract (SecretsSpec pins exact values on planted tokens). */
object Secrets {

  /** Replacement literal written over flagged tokens. */
  val Mask = "[SECRET]"

  /** Shannon entropy of a token in bits/char: −Σ p(c)·log₂ p(c) over
    * its character distribution. Empty tokens score 0.0. Built from
    * nested HOFs (distinct chars → per-char counts → plogp sum) —
    * O(k·d) per token with k = length, d = distinct chars, both small
    * by construction once the integer guards prune. */
  def tokenEntropy(tok: Column): Column = {
    val chars = filter(split(tok, ""), c => c =!= "")
    val n = size(chars).cast("double")
    val plogp = transform(array_distinct(chars), c => {
      val p = size(filter(chars, x => x === c)).cast("double") / n
      -p * log(2.0, p)
    })
    when(size(chars) === 0, lit(0.0))
      .otherwise(aggregate(plogp, lit(0.0), (acc, x) => acc + x))
  }

  private def isCandidate(t: Column, minLen: Int, minDistinct: Int): Column =
    length(t) >= minLen && size(array_distinct(filter(split(t, ""), c => c =!= ""))) >= minDistinct

  /** Per-document detection report: candidate tokens (integer guards
    * only — exact cross-engine), flagged tokens (candidates whose
    * entropy ≥ `minEntropy`), and the maximum candidate entropy.
    * Null texts report empty/zero. The entropy array is bound to its
    * own projected column so each candidate's entropy is computed
    * ONCE and shared by the flag filter and the max — not re-derived
    * per consuming expression.
    *
    * `maxCandidates` bounds the ENTROPY-SCORED work per document: at
    * most that many candidates (in token order) are scored;
    * `n_candidates` still counts ALL candidates, while `n_flagged` /
    * `max_entropy` / `flagged_tokens` cover the scored prefix. The
    * knob exists for candidate-dense corpora (machine-generated
    * vocab where every token clears the integer guards turns the
    * entropy pass from rare-token to every-token work); the
    * truncation is never silent — [[truncationReport]] is its
    * accounting relation, the same stance as the LSH bucket caps.
    * [[scrub]] deliberately has NO such knob: a capped scrub would
    * ship unmasked secrets. */
  def detect(docs: DataFrame, textCol: String, idCol: String,
             minLen: Int = 16, minDistinct: Int = 10,
             minEntropy: Double = 3.5,
             maxCandidates: Int = Int.MaxValue): DataFrame = {
    require(maxCandidates >= 1, s"maxCandidates=$maxCandidates must be >= 1")
    val toks = filter(split(coalesce(col(textCol), lit("")), " "),
      t => t =!= "")
    val cands = filter(toks, t => isCandidate(t, minLen, minDistinct))
    val scored =
      if (maxCandidates == Int.MaxValue) col("_cands")
      else slice(col("_cands"), 1, maxCandidates)
    docs.select(col(idCol), cands.as("_cands"))
      .withColumn("_hs", transform(scored, t => tokenEntropy(t)))
      .withColumn("_flagged", array_compact(zip_with(scored, col("_hs"),
        (t, h) => when(h >= minEntropy, t))))
      .select(col(idCol),
        size(col("_cands")).cast("long").as("n_candidates"),
        size(col("_flagged")).cast("long").as("n_flagged"),
        coalesce(array_max(col("_hs")), lit(0.0)).as("max_entropy"),
        col("_flagged").as("flagged_tokens"))
  }

  /** Accounting for [[detect]]'s `maxCandidates` cap: one row per
    * document whose candidate count exceeds the cap, with how many
    * candidates went unscored — so a capped detection run can always
    * answer "what did the cap cost, and where". Empty when the cap
    * never engaged. */
  def truncationReport(docs: DataFrame, textCol: String, idCol: String,
                       minLen: Int = 16, minDistinct: Int = 10,
                       maxCandidates: Int = Int.MaxValue): DataFrame = {
    val toks = filter(split(coalesce(col(textCol), lit("")), " "),
      t => t =!= "")
    val cands = filter(toks, t => isCandidate(t, minLen, minDistinct))
    docs.select(col(idCol), size(cands).cast("long").as("n_candidates"))
      .filter(col("n_candidates") > maxCandidates)
      .withColumn("n_unscored", col("n_candidates") - maxCandidates)
  }

  /** Corpus scrub: every flagged token replaced by [[Mask]]. Documents
    * with NO flagged token pass through byte-identical (their md5 dedup
    * keys, minhash buckets and quality scores are untouched by the
    * scrub pass) — only flagged documents are re-joined from the token
    * array. Null texts pass through as null. */
  def scrub(docs: DataFrame, textCol: String,
            minLen: Int = 16, minDistinct: Int = 10,
            minEntropy: Double = 3.5): DataFrame = {
    val toks = filter(split(col(textCol), " "), t => t =!= "")
    val isFlagged = (t: Column) =>
      isCandidate(t, minLen, minDistinct) && tokenEntropy(t) >= minEntropy
    val masked = transform(toks, t =>
      when(isFlagged(t), lit(Mask)).otherwise(t))
    docs.withColumn(textCol,
      when(col(textCol).isNull, lit(null).cast("string"))
        .when(exists(toks, isFlagged), array_join(masked, " "))
        .otherwise(col(textCol)))
  }
}
