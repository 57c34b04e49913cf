package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation (SURVEY.md §2 C45) —
  * the CCNet/RefinedWeb-style "dedup by URL before dedup by content"
  * stage: crawls see the same page as `http://WWW.Site.com/a?utm_...`,
  * `https://site.com:443/a#frag`, … and URL-level dedup removes the
  * bulk re-fetches for the cost of a map-only string normalize —
  * orders of magnitude cheaper than minhashing the duplicate bodies.
  *
  * One pattern table drives BOTH engines (the `markupPatterns` /
  * `piiPatterns` stance): Spark applies it as a codegen'd
  * `regexp_replace` fold, the DuckDB oracle mirror is GENERATED from
  * the same rows (`$n` backreferences translated to RE2's `\n`).
  * RE2-compatible throughout — no lookaround, no backrefs in the
  * match side. Known regex-canonicalizer caveats, documented not
  * hidden: the scheme+host lowercase is anchored so paths keep their
  * case (correct per RFC 3986), percent-encoding is NOT decoded, and
  * param ORDER is preserved (reordering `?b=1&a=2` would need a sort,
  * not a regex — curation dedup accepts the miss). */
object UrlFunctions {

  /** Scheme + authority prefix — the case-insensitive part of a URL. */
  val hostPattern = "^[^/?#]*://[^/?#]*"

  /** Normalization rules in application order. Fragments go first so
    * later end-anchored rules see the true end; default ports before
    * `www.` (both anchored inside the authority); tracking-parameter
    * runs before the single-trailing-param rule so `?utm_a=1&utm_b=2&
    * keep=x` collapses in one pass; trailing slash last. */
  val urlPatterns: Seq[(String, String)] = Seq(
    // drop the fragment
    "#.*$" -> "",
    // default ports off the authority (group math, no lookahead)
    "^([^/?#]*://[^/?#]*):(?:80|443)([/?#]|$)" -> "$1$2",
    // leading www.
    "://www\\." -> "://",
    // a RUN of tracking params each followed by another param: keep
    // the delimiter, drop the run ('?utm_a=1&utm_b=2&keep=x' -> '?keep=x')
    "([?&])(?:(?:utm_[a-z0-9]+|gclid|fbclid)=[^&#]*&)+" -> "$1",
    // a tracking param that ends the URL (also eats its '?'/'&')
    "[?&](?:utm_[a-z0-9]+|gclid|fbclid)=[^&#]*$" -> "",
    // trailing slash
    "/$" -> "")

  /** Canonical form: lowercase scheme+authority (path untouched), then
    * the [[urlPatterns]] fold. Pure string expressions — map-only,
    * zero shuffles at any corpus size. Idempotent (spec-pinned). */
  def normalizeUrl(u: Column): Column = {
    val lowered = concat(lower(regexp_extract(u, hostPattern, 0)),
      regexp_replace(u, hostPattern, ""))
    urlPatterns.foldLeft(lowered) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
  }

  /** The registrable-host key for per-domain caps/blocklists: the
    * authority of the CANONICAL url, ports and credentials excluded. */
  def urlDomain(u: Column): Column =
    regexp_extract(normalizeUrl(u), "^[^/?#]*://(?:[^/?#@]*@)?([^/?#:]*)", 1)

  /** All dot-suffixes of a domain, most-specific first —
    * `a.b.example.com` → `[a.b.example.com, b.example.com,
    * example.com, com]`. Blocklist matching explodes these and
    * EQUI-joins the list (so `example.com` blocks every subdomain)
    * instead of a suffix-predicate join, which at corpus scale would
    * be a broadcast nested loop. ≤ label-count rows per doc. */
  def domainSuffixes(domain: Column): Column = {
    val parts = split(domain, "\\.")
    transform(sequence(lit(1), size(parts)), i =>
      array_join(slice(parts, i, size(parts) - i + 1), "."))
  }
}
