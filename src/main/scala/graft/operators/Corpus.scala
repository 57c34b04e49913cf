package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Training-data corpus curation: the composition a large-scale LLM
  * data pipeline runs over raw documents — exact dedup, then a quality
  * gate, emitting per-document stats for downstream sampling.
  *
  * Both stages are shuffle-light at 100 TB: dedup groups on a 128-bit
  * content hash (never raw text), the quality gate is a map-only pass,
  * and the survivor join is a semi-join on the id (broadcastable when
  * the survivor set is small relative to the corpus, co-partitioned
  * otherwise). Near-dup removal composes in front via
  * [[Dedup.minhashCandidatePairs]].
  */
object Corpus {

  /** Exact-dedup survivors with token counts and quality, keeping only
    * documents whose rounded quality clears `minQuality`. */
  def curate(docs: DataFrame, textCol: String, idCol: String,
             minQuality: Double): DataFrame = {
    val survivors = Dedup.exactDedup(docs, textCol, idCol).select(idCol)
    docs
      .join(survivors, Seq(idCol), "left_semi")
      .select(col(idCol),
        size(TextFunctions.tokens(col(textCol))).cast("bigint").as("n_tokens"),
        TextFunctions.round4(TextFunctions.qualityScore(col(textCol))).as("quality"))
      .filter(col("quality") >= minQuality)
  }
}
