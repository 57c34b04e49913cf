package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators (SURVEY.md §2 C).
  *
  * Everything is built from `org.apache.spark.sql.functions` higher-order
  * functions (codegen'd by Catalyst) — no UDFs, so these stay inside
  * WholeStageCodegen and scale linearly with input size.
  */
object TextFunctions {

  /** Single-space tokenization — the ENGINE-IDENTICAL contract every
    * DuckDB oracle mirrors as `string_split(text, ' ')`. Deliberately
    * NOT `\s+`: tabs/newlines/runs of spaces stay inside tokens, so
    * raw text should be whitespace-normalized upstream (the curation
    * pipeline's fingerprint step collapses spaces the same way). */
  def tokens(text: Column): Column = split(text, " ")

  // NOTE: n-gram generation lives in graft.operators.Dedup.shingles
  // (posexplode + window). Do NOT reintroduce an array-lambda variant
  // here: a `split` captured inside a `transform` lambda is re-evaluated
  // by Catalyst once per element — quadratic in document length.

  /** Number of distinct tokens that appear in `words`. */
  def distinctOverlap(text: Column, words: Seq[String]): Column =
    size(array_intersect(array_distinct(tokens(text)),
                         array(words.map(lit): _*)))

  /** Fraction of tokens that are in `words` (0.0 for empty docs). */
  def stopwordRatio(text: Column, words: Seq[String]): Column = {
    val t = tokens(text)
    when(size(t) > 0,
      size(filter(t, tok => tok.isin(words.map(x => x: Any): _*))).cast("double") / size(t))
      .otherwise(lit(0.0))
  }

  /** Karp–Rabin polynomial rolling hash of the token stream:
    * `h = fold(tokens, 0, (acc, t) -> (acc * 31 + xxhash64(t)) mod p)`.
    * A sequential fold via `aggregate` — order-sensitive by design, so
    * reordered documents fingerprint differently. Arithmetic stays in
    * Long with a large prime modulus; xxhash64 is reduced to [0, p)
    * first so `acc * 31 + h` cannot overflow. */
  def rollingHash(text: Column, p: Long = 1000000007L): Column =
    aggregate(tokens(text), lit(0L),
      (acc, tok) => (acc * 31L + pmod(xxhash64(tok), lit(p))) % p)

  /** Canonical document fingerprint: md5 of the lower-cased,
    * whitespace-collapsed text. SQL-expressible (oracle-matchable);
    * [[rollingHash]] is the order-sensitive variant. */
  def normalizedFingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), " +", " "))

  /** Sub-word ("BPE-ish") token count: runs of letters, runs of digits,
    * or single other non-space characters. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))

  /** Alphabetic-character fraction of the text, case-insensitive;
    * 0.0 for an empty document (the `greatest` guard keeps the
    * division non-null without ANSI-mode concerns — mirrored verbatim
    * in every quality oracle). */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(lower(text), "[^a-z]", "")).cast("double") /
      greatest(length(text), lit(1))

  /** Composite quality score in [0, 1]: length saturation (50 tokens)
    * × alphabetic ratio. The shared definition behind q_doc_quality
    * and the corpus curation gate. */
  def qualityScore(text: Column): Column =
    least(lit(1.0), size(tokens(text)) / lit(50.0)) * alphaRatio(text)

  // ------------------------------------------------------------ C22: PII
  /** Redaction patterns, ordered. The order is part of the contract:
    * emails go first (their local parts may contain digit runs), IPv4
    * before phones/ids (its octets would otherwise be eaten as digit
    * runs), and the bare long-digit-run catch-all (account numbers,
    * SSN-like ids, credit cards) last. Each pattern stays inside the
    * regex subset Java's engine and RE2 (the DuckDB oracle) agree on:
    * no lookaround, no backreferences. */
  val piiPatterns: Seq[(String, String)] = Seq(
    """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""" -> "<EMAIL>",
    """\b(\d{1,3}\.){3}\d{1,3}\b""" -> "<IP>",
    """\+\d{7,15}""" -> "<PHONE>",
    """\d{9,}""" -> "<ID>")

  /** PII redaction — the scrub pass a training-data pipeline runs
    * before text ever reaches a tokenizer: emails, IPv4 addresses,
    * international phone numbers and long digit runs are replaced
    * with typed placeholder tokens. A fold over [[piiPatterns]] of
    * builtin `regexp_replace` (codegen'd, map-only — a redaction scan
    * over 100 TB is exactly one pass with zero shuffles), and
    * idempotent: placeholders contain no redactable substrings, so
    * `redactPii(redactPii(x)) == redactPii(x)`. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Markup-strip patterns in application order (SURVEY.md §2 C42) —
    * ONE definition shared by [[stripMarkup]] and the DuckDB oracle
    * mirror (the piiPatterns stance): container elements whose CONTENT
    * must go (script/style), comments, then every remaining tag, then
    * entity decodes (AFTER tag removal, so a decoded `<` can never
    * fabricate a tag). RE2-compatible (no backrefs/lookaround) so the
    * DuckDB side runs the same regexes. */
  val markupPatterns: Seq[(String, String)] = Seq(
    """(?is)<script\b[^>]*>.*?</script>""" -> " ",
    """(?is)<style\b[^>]*>.*?</style>""" -> " ",
    """(?s)<!--.*?-->""" -> " ",
    """<[^>]+>""" -> " ",
    """&nbsp;""" -> " ",
    """&lt;""" -> "<",
    """&gt;""" -> ">",
    """&quot;""" -> "\"",
    """&#39;""" -> "'",
    // `&amp;` decodes LAST (the standard order): decoding it first
    // would turn double-encoded text like `&amp;lt;` into `&lt;` and
    // then a second rule pass into a literal `<`.
    """&amp;""" -> "&")

  /** HTML/markup text extraction — the "web page → clean text" step
    * (trafilatura/jusText shape, regex-bounded): strip script/style
    * bodies, comments and tags, decode the common entities, collapse
    * whitespace. A fold of builtin `regexp_replace` (codegen'd,
    * map-only — one pass, zero shuffles at any corpus size). Known
    * regex-stripper caveat, documented not hidden: a literal `<x y>`
    * in non-HTML prose is eaten as a tag. */
  def stripMarkup(text: Column): Column =
    trim(regexp_replace(
      markupPatterns.foldLeft(text) { case (c, (pat, repl)) =>
        regexp_replace(c, pat, repl)
      },
      """\s+""", " "))

  /** 4-decimal rounding that matches DuckDB's semantics for oracle
    * comparison: DuckDB rounds the SCALED double (`round(x·10⁴)/10⁴`),
    * Spark's `round(x, 4)` rounds the unscaled value through
    * BigDecimal — on an exact .xxxx5 tie (common for ratio-of-small-
    * ints scores like quality) the two can land on opposite sides
    * because x·10⁴ re-rounds in binary. Rounding the same scaled
    * double makes both engines bit-agree. */
  def round4(c: Column): Column = round(c * 10000d) / 10000d
}
