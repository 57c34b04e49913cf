package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C42 — markup text extraction ([[TextFunctions.stripMarkup]]).
  * Pins tag/script/style/comment removal, entity decoding order
  * (decode AFTER tag removal so `&lt;b&gt;` can't fabricate a tag),
  * whitespace normalization, idempotency on clean text, and null
  * pass-through. */
class MarkupSpec extends SparkSpec {
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.stripMarkup(col("t")))
      .as[String].collect()(0)

  test("tags, scripts, styles and comments are removed; entities decode") {
    val html =
      """<html><head><style>p { color: red; }</style>
        |<script type="text/javascript">var x = "<p>not text</p>";</script>
        |</head><!-- nav boilerplate --><body>
        |<h1>Title</h1><p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>
        |</body></html>""".stripMargin
    assert(strip(html) == """Title A & B <tag> "q" 's' end""")
  }

  test("decoded entities cannot fabricate tags (decode runs after tag removal)") {
    assert(strip("&lt;script&gt;alert(1)&lt;/script&gt;") ==
      "<script>alert(1)</script>",
      "an entity-encoded script is DATA, not markup — it must survive as text")
  }

  test("double-encoded entities decode exactly once (&amp; rule runs last)") {
    // '&amp;lt;' is one level of encoding around the literal text '&lt;'
    // — decoding &amp; first would cascade into a literal '<'
    assert(strip("a &amp;lt; b &amp;amp; c") == "a &lt; b &amp; c")
  }

  test("multiline script/style bodies are removed ((?s) dotall)") {
    val s = "before<script>\nline1\nline2\n</script>after"
    assert(strip(s) == "before after")
  }

  test("whitespace collapses and trims; clean text is a fixed point") {
    assert(strip("  a\t\tb\n\nc  ") == "a b c")
    assert(strip("a b c") == "a b c")
  }

  test("null text stays null") {
    val out = Seq((1L, null.asInstanceOf[String])).toDF("id", "t")
      .select(TextFunctions.stripMarkup(col("t"))).collect()(0)
    assert(out.isNullAt(0))
  }
}
