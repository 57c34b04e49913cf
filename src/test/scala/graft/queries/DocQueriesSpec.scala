package graft.queries

import graft.SparkSpec

/** Behavior edges of the doc-query surface that the SQL oracles can't
  * reach with the synthetic tables. */
class DocQueriesSpec extends SparkSpec {

  test("C18: a zero-token source gets cut 0, not an ANSI divide-by-zero") {
    import spark.implicits._
    val totals = Seq(("web", 9000L), ("empty", 0L), ("books", 1000L))
      .toDF("source", "src_tokens")
    // under ANSI mode the unguarded `div` would throw here
    val cuts = DocQueries.mixCuts(totals, totalBudget = 10000L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cuts("empty") == "0000") // samples nothing: no bucket < '0000'
    // the non-degenerate sources keep their integer-arithmetic cutoffs:
    // (10000 div 3) * 65536 div 9000 = 24270 = 0x5ece
    assert(cuts("web") == "5ece")
    assert(cuts("books") == "zzzz") // 3333*65536/1000 > 65536 → keep all
  }
}
