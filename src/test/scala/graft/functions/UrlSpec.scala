package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Edges of the C45 URL canonicalizer the planted-corpus oracle can't
  * isolate one at a time. */
class UrlSpec extends SparkSpec {

  private def norm(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(UrlFunctions.normalizeUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq
  }

  test("C45: each rule fires — case, www, ports, tracking, fragment, slash") {
    assert(norm("HTTPS://WWW.Site.COM/Path/File") == Seq("https://site.com/Path/File"))
    assert(norm("http://site.com:80/a") == Seq("http://site.com/a"))
    assert(norm("https://site.com:443") == Seq("https://site.com"))
    // a NON-default port survives; a port-like path segment is untouched
    assert(norm("https://site.com:8080/a") == Seq("https://site.com:8080/a"))
    assert(norm("https://site.com/a:443/b") == Seq("https://site.com/a:443/b"))
    assert(norm("https://site.com/a#frag") == Seq("https://site.com/a"))
    assert(norm("https://site.com/a/") == Seq("https://site.com/a"))
  }

  test("C45: tracking params drop in runs, at end, and alone; kept params survive") {
    assert(norm("https://s.com/a?utm_source=x&utm_medium=y&keep=1")
      == Seq("https://s.com/a?keep=1"))
    assert(norm("https://s.com/a?keep=1&gclid=zz") == Seq("https://s.com/a?keep=1"))
    assert(norm("https://s.com/a?fbclid=zz") == Seq("https://s.com/a"))
    assert(norm("https://s.com/a?utm_a=1&keep=1&utm_b=2")
      == Seq("https://s.com/a?keep=1"))
    // path case is preserved (RFC 3986: only scheme+host are case-insensitive)
    assert(norm("https://s.com/CaseSensitive?Q=1") == Seq("https://s.com/CaseSensitive?Q=1"))
  }

  test("C45: normalization is idempotent and the domain key strips userinfo") {
    import spark.implicits._
    val raw = Seq(
      "HTTPS://WWW.Site.COM:443/a?utm_source=x&ref=2#f",
      "http://user:pw@Host.com/x",
      "https://s.com/a/").toDF("u")
    val once = raw.select(UrlFunctions.normalizeUrl(col("u")).as("c"))
    val twice = once.select(UrlFunctions.normalizeUrl(col("c")).as("c2"))
    assert(once.collect().map(_.getString(0)).toSeq ==
      twice.collect().map(_.getString(0)).toSeq)
    val doms = raw.select(UrlFunctions.urlDomain(col("u"))).collect()
      .map(_.getString(0)).toSeq
    assert(doms == Seq("site.com", "host.com", "s.com"))
  }

  test("C51: domainSuffixes enumerates every dot-suffix, most-specific first") {
    import spark.implicits._
    val got = Seq("a.b.example.com", "example.com", "localhost")
      .toDF("d")
      .select(UrlFunctions.domainSuffixes(col("d")).as("s"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(got(0) == Seq("a.b.example.com", "b.example.com",
      "example.com", "com"))
    assert(got(1) == Seq("example.com", "com"))
    // no dot: the domain itself is its only suffix
    assert(got(2) == Seq("localhost"))
  }
}
