package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Overlapping token-window document chunking (SURVEY.md §2 C29) —
  * the RAG/embedding-prep step that turns each document into
  * fixed-size windows with a stride overlap, so retrieval context
  * never splits mid-passage without a covering neighbor.
  *
  * Scale design (100 TB): map-only — one `split`, one
  * `sequence`/`posexplode` over chunk starts, one `slice` per chunk;
  * zero exchanges at any corpus size (PlanSpec-pinned), and row width
  * is bounded by `window` tokens regardless of document length. The
  * stride sequence is arithmetic (`0, stride, 2·stride, …`), never a
  * per-token explode — a book-length doc emits ~n/stride rows, not n.
  *
  * Every doc emits ≥1 chunk — an empty text tokenizes to one ""
  * token, and a NULL text is coalesced to "" first (otherwise
  * `tokens(null)` is null and `posexplode` would silently drop the
  * whole document) — so a downstream embedding join can never
  * silently lose a document. */
object Chunk {

  /** (idCol, chunk_id, start_tok, n_tok, chunk_md5): `chunk_id` is the
    * 0-based window index, `start_tok` its 0-based token offset,
    * `chunk_md5` the md5 of the space-rejoined window (engine-
    * reproducible identity for dedup/caching without carrying the
    * text; join back by (id, start) when the text itself is needed). */
  def tokenWindows(docs: DataFrame, textCol: String, idCol: String,
                   window: Int = 128, stride: Int = 96): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window (a stride beyond the window skips tokens)")
    docs
      .select(col(idCol),
        TextFunctions.tokens(coalesce(col(textCol), lit(""))).as("_toks"))
      .select(col(idCol), col("_toks"),
        posexplode(sequence(lit(0), size(col("_toks")) - 1, lit(stride)))
          .as(Seq("chunk_id", "start_tok")))
      .select(col(idCol), col("chunk_id"), col("start_tok"),
        size(slice(col("_toks"), col("start_tok") + 1, lit(window)))
          .cast("bigint").as("n_tok"),
        md5(array_join(slice(col("_toks"), col("start_tok") + 1, lit(window)),
          " ")).as("chunk_md5"))
  }
}
