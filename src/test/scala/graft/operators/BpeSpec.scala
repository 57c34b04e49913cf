package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C39 — distributed BPE vocabulary induction ([[Bpe]]).
  *
  * Pins: word-table construction (counts, end-of-word marker), the
  * classic-trainer merge order on a planted corpus (batch=1 strict
  * argmax with deterministic tie-break), exactness of symbol-disjoint
  * batching (batch>1 learns the same rule SET the strict trainer
  * does when its picks are disjoint), greedy left-to-right merge
  * application on overlapping repeats, minPairCount early stop,
  * null/empty-text safety, and the vocab/tokenize round-trip. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("wordTable counts words and marks the final symbol") {
    val wt = Bpe.wordTable(corpus("low low lower", "low"), "text")
      .orderBy("word").collect()
    assert(wt.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("low", 3L), ("lower", 1L)))
    val lowSyms = wt(0).getSeq[String](2)
    assert(lowSyms == Seq("l", "o", "w</w>"))
    val lowerSyms = wt(1).getSeq[String](2)
    assert(lowerSyms == Seq("l", "o", "w", "e", "r</w>"))
  }

  test("strict batch=1 learning reproduces the classic trainer on a planted corpus") {
    // Sennrich-style toy: "low" x5, "lowest" x2.
    // Initial pairs: (l,o)=7, (o,w</w>)=5, (o,w)=2, (w,e)=2, (e,s)=2, (s,t</w>)=2
    val d = corpus(Array.fill(5)("low").mkString(" "), "lowest lowest")
    val m = Bpe.learnMerges(spark, d, "text", numMerges = 3)
    assert(m(0).left == "l" && m(0).right == "o" && m(0).pairCount == 7L)
    // after lo: (lo,w</w>)=5 beats (lo,w)=2 and the est tail pairs
    assert(m(1).left == "lo" && m(1).right == "w</w>" && m(1).pairCount == 5L)
    // remaining: (lo,w)=2, (w,e)=2, (e,s)=2, (s,t</w>)=2 — tie broken
    // lexicographically on (left, right): (e,s) wins
    assert(m(2).left == "e" && m(2).right == "s" && m(2).pairCount == 2L)
  }

  test("symbol-disjoint batching learns the same rules as strict when picks are independent") {
    // four separated two-symbol words with distinct alphabets and
    // distinct counts: the strict trainer's first four picks are
    // already symbol-disjoint, so one batch round must equal them
    val d = corpus(
      Array.fill(8)("ab").mkString(" "),
      Array.fill(6)("cd").mkString(" "),
      Array.fill(4)("ef").mkString(" "),
      Array.fill(2)("gh").mkString(" "))
    val strict  = Bpe.learnMerges(spark, d, "text", numMerges = 4, batch = 1)
    val batched = Bpe.learnMerges(spark, d, "text", numMerges = 4, batch = 4)
    assert(strict.map(m => (m.left, m.right, m.pairCount)) ==
      batched.map(m => (m.left, m.right, m.pairCount)))
    // and batching is deterministic run-to-run
    val again = Bpe.learnMerges(spark, d, "text", numMerges = 4, batch = 4)
    assert(batched == again)
  }

  test("greedy left-to-right application: aaaa under (a,a) becomes [aa, aa]") {
    val d = corpus("aaaa aaaa aaaa")
    val m = Bpe.learnMerges(spark, d, "text", numMerges = 1)
    assert(m.head.left == "a" && m.head.right == "a")
    val toks = Bpe.tokenizeWords(d, "text", m)
      .orderBy("position").select("subword").as[String].collect().toSeq
    // aaaa = a a a a</w>; greedy pass: [aa, a, a</w>]
    assert(toks == Seq("aa", "a", "a</w>"))
  }

  test("minPairCount stops learning before noise merges") {
    val d = corpus("ab cd ef") // every pair occurs once
    val m = Bpe.learnMerges(spark, d, "text", numMerges = 10, minPairCount = 2L)
    assert(m.isEmpty)
    val all = Bpe.learnMerges(spark, d, "text", numMerges = 10, minPairCount = 1L)
    assert(all.nonEmpty)
  }

  test("null and empty texts contribute nothing") {
    val d = Seq((1L, "aa aa"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
    val wt = Bpe.wordTable(d, "text").collect()
    assert(wt.map(_.getString(0)).toSeq == Seq("aa"))
    val m = Bpe.learnMerges(spark, d, "text", numMerges = 1)
    assert(m.map(x => (x.left, x.right)) == Seq(("a", "a</w>")))
  }

  test("vocab aggregates the tokenized corpus; merged subwords carry their counts") {
    val d = corpus(Array.fill(5)("low").mkString(" "), "lowest lowest")
    val m = Bpe.learnMerges(spark, d, "text", numMerges = 2)
    val v = Bpe.vocab(d, "text", m).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // after (l,o) then (lo,w</w>): "low" -> [low</w>] x5;
    // "lowest" -> [lo, w, e, s, t</w>] x2
    assert(v("low</w>") == (1L, 5L))
    assert(v("lo") == (1L, 2L))
    assert(v("t</w>") == (1L, 2L))
  }

  test("learned rules are invariant to input partitioning") {
    val d = corpus(Array.fill(5)("low").mkString(" "), "lowest lowest",
      Array.fill(3)("newest").mkString(" "))
    val one  = Bpe.learnMerges(spark, d.coalesce(1), "text", numMerges = 6, batch = 3)
    val many = Bpe.learnMerges(spark, d.repartition(7), "text", numMerges = 6, batch = 3)
    assert(one == many, "merge rules must not depend on cluster layout")
  }

  // C48 — the classic in-memory encoder the distributed word-cache
  // encode must match document-for-document: per word, split to chars
  // (last char + </w>), then replay each merge rule in rank order as a
  // greedy left-to-right pass.
  private def classicEncode(text: String, merges: Seq[Bpe.Merge]): Seq[String] = {
    def applyOne(syms: List[String], a: String, b: String): List[String] =
      syms.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b)
          acc.init :+ (a + b)
        else acc :+ x
      }
    Option(text).getOrElse("").split("\\s+").filter(_.nonEmpty).toSeq
      .flatMap { w =>
        val init = w.toList.map(_.toString) match {
          case Nil => Nil
          case cs  => cs.init :+ (cs.last + Bpe.EndOfWord)
        }
        merges.foldLeft(init) { (s, m) => applyOne(s, m.left, m.right) }
      }
  }

  test("encodeDocs equals the classic sequential encoder document-for-document") {
    val texts = Seq(
      "low low lower lowest",
      "the newest lowest low",
      "aaaa abab low",
      "",
      "single")
    val d = corpus(texts: _*)
    val merges = Bpe.learnMerges(spark, d, "text", numMerges = 8,
      minPairCount = 1L, batch = 1)
    assert(merges.nonEmpty)
    val got = Bpe.encodeDocs(d, "doc_id", "text", merges)
      .orderBy("doc_id")
      .select("doc_id", "tokens", "n_words", "n_tokens").collect()
    assert(got.length == texts.length, "every doc keeps a row")
    got.foreach { r =>
      val id = r.getLong(0)
      val want = classicEncode(texts(id.toInt), merges)
      assert(r.getSeq[String](1) == want, s"doc $id token stream")
      assert(r.getLong(2) ==
        texts(id.toInt).split("\\s+").count(_.nonEmpty).toLong)
      assert(r.getLong(3) == want.length.toLong)
    }
  }

  test("encodeDocs token concatenation reconstructs the word sequence") {
    val d = corpus("low lowest low", "newest aaaa")
    val merges = Bpe.learnMerges(spark, d, "text", numMerges = 6,
      minPairCount = 1L, batch = 2)
    val rows = Bpe.encodeDocs(d, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
    val texts = Seq("low lowest low", "newest aaaa")
    rows.foreach { r =>
      val rebuilt = r.getSeq[String](1).mkString("")
        .replace(Bpe.EndOfWord, " ").trim
      assert(rebuilt == texts(r.getLong(0).toInt),
        "lossless: subwords must concatenate back to the input words")
    }
  }

  test("encodeDocs keeps empty and null docs with empty token arrays") {
    val d = Seq((1L, "aa"), (2L, null.asInstanceOf[String]), (3L, " "))
      .toDF("doc_id", "text")
    val m = Bpe.learnMerges(spark, d, "text", numMerges = 1, minPairCount = 1L)
    val rows = Bpe.encodeDocs(d, "doc_id", "text", m)
      .orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(1).getSeq[String](1).isEmpty && rows(1).getLong(3) == 0L)
    assert(rows(2).getSeq[String](1).isEmpty && rows(2).getLong(2) == 0L)
  }

  test("mergesDf round-trips rank order") {
    val d = corpus(Array.fill(3)("abc").mkString(" "))
    val m = Bpe.learnMerges(spark, d, "text", numMerges = 2)
    val df = Bpe.mergesDf(spark, m).orderBy("rank").collect()
    assert(df.map(_.getInt(0)).toSeq == m.map(_.rank))
    assert(df.map(_.getString(3)).toSeq == m.map(_.merged))
    // and the persisted artifact reloads into the identical rule list
    assert(Bpe.loadMerges(Bpe.mergesDf(spark, m)) == m)
  }
}
