package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted sampling with inclusion probability proportional to size
  * (SURVEY.md §2 C82) by SYSTEMATIC sampling over the corpus's token
  * stream: lay documents out at contiguous token offsets in ascending
  * id order (the [[Pack]] layout), drop a deterministic grid of ~`k`
  * equally-spaced sample points onto the stream, and a document is
  * picked once per grid point falling inside its token interval — the
  * classic PPS-systematic design (Madow 1949; the survey-sampling
  * textbook method) a curation pipeline uses to cut a token-budget
  * subcorpus where a 10k-token document deserves 100× the chance of a
  * 100-token one, without the variance of independent Bernoulli draws
  * (systematic sampling yields EXACTLY ⌈(T−o)/S⌉ picks, not k±√k).
  *
  * `n_picks` carries multiplicity: a document longer than the step S
  * straddles several grid points and is picked that many times (the
  * standard PPS-with-multiplicity semantics — downstream either keeps
  * duplicates as epoch weighting or clamps). The grid phase o is an
  * md5-derived integer in [0, S) — deterministic in `seed`, so reruns
  * reproduce bit-for-bit and a seed change redraws the sample.
  *
  * Scale shape (100 TB): offsets come from [[Pack.packOffsets]]'s
  * two-level prefix sum (quantile-bucketed local cumsums; the only
  * single-partition window is over `numBuckets` rows), the total and
  * step are a 1-row broadcast, and the selection itself is pure
  * integer map-only arithmetic — no global window, no shuffle beyond
  * the prefix sum's. All arithmetic is BIGINT (offsets, step, phase,
  * pick counts), so the sample is engine-exact and the gate oracle
  * hash-checks it (an independent SQL engine reproduces the identical
  * relation from the identical md5 phase).
  *
  * Reference scope note: QOPCFDR has no sampling surface (consumption
  * is Athena, reference README.md:48); this operator belongs to the
  * training-data extension surface.
  */
object Sample {

  /** One row per picked document: (idCol, weightCol, start_offset,
    * n_picks ≥ 1). `weightCol` must be a non-negative bigint (token
    * counts); zero-weight documents are never picked (empty interval).
    * `k` is the target sample size — the realized count is
    * ⌈(T−o)/S⌉ with S = max(1, T div k), which is k−1, k or k+1
    * except in the degenerate T < k corpus (S clamps to 1 and every
    * token is a grid point — "sample more than exists" returns the
    * corpus with per-token multiplicity rather than failing). */
  def systematicPps(docs: DataFrame, idCol: String, weightCol: String,
                    k: Long, seed: String,
                    numBuckets: Int = 256): DataFrame = {
    require(k >= 1, "k must be positive")
    val total = docs.agg(
      coalesce(sum(col(weightCol).cast("long")), lit(0L)).as("_tot"))
    // one 1-row broadcast carries T, S and the md5 grid phase o to a
    // map-only pick-count computation; pts(x) counts grid points
    // o + i·S in [0, x), all operands non-negative so integer `div`
    // is floor division in any engine
    Pack.packOffsets(docs, idCol, weightCol, Long.MaxValue, numBuckets)
      .drop("shard", "spans_boundary")
      .crossJoin(broadcast(total))
      .filter(col("_tot") > 0)
      .withColumn("_step", greatest(expr(s"_tot div ${k}L"), lit(1L)))
      .withColumn("_o",
        conv(substring(md5(lit(seed)), 1, 15), 16, 10).cast("long")
          % col("_step"))
      .withColumn("_ce", col("start_offset") + col(weightCol).cast("long"))
      .withColumn("n_picks",
        expr("CASE WHEN _ce <= _o THEN 0L ELSE (_ce - _o - 1L) div _step + 1L END") -
        expr("CASE WHEN start_offset <= _o THEN 0L ELSE (start_offset - _o - 1L) div _step + 1L END"))
      .filter(col("n_picks") >= 1)
      .select(col(idCol), col(weightCol), col("start_offset"),
        col("n_picks"))
  }
}
