package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** C71 PageRank: the distributed integer-exact iteration must equal a
  * sequential reference implementation of the same recurrence exactly
  * (bit-for-bit — that is the operator's contract), on graphs that
  * exercise dangling mass, asymmetric degrees and hub structure. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  /** Sequential mirror of the documented recurrence. */
  private def refPageRank(edges: Seq[(String, String)], iters: Int,
                          init: Long = Graph.PrInitRank,
                          num: Long = Graph.PrDampNum,
                          den: Long = Graph.PrDampDen): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size.toLong
    val outDeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = init * (den - num) / den
    var rank = nodes.map(_ -> init).toMap
    for (_ <- 1 to iters) {
      val contrib = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => rank(s) / outDeg(s) }.sum
      }
      val dangMass = nodes.filterNot(outDeg.contains).map(rank).sum
      val dshare = dangMass / n
      rank = nodes.map(v =>
        v -> (base + num * (contrib.getOrElse(v, 0L) + dshare) / den)).toMap
    }
    rank
  }

  private def run(edges: Seq[(String, String)], iters: Int): Map[String, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("C71: two-node cycle is a fixpoint at the initial rank") {
    val got = run(Seq("a" -> "b", "b" -> "a"), iters = 4)
    assert(got == Map("a" -> Graph.PrInitRank, "b" -> Graph.PrInitRank), got)
  }

  test("C71: directed graph with dangling node matches the sequential reference exactly") {
    // a→b (b dangles), c→b, c→a: dangling redistribution + in-degree skew
    val edges = Seq("a" -> "b", "c" -> "b", "c" -> "a")
    val got = run(edges, iters = 5)
    val want = refPageRank(edges, iters = 5)
    assert(got == want, s"$got vs $want")
    assert(got("b") > got("a") && got("a") > got("c"), got) // sink > middle > source
  }

  test("C71: undirected hub outranks leaves and matches the reference") {
    val spokes = (1 to 8).map(i => s"leaf$i")
    val edges = spokes.map(l => "hub" -> l) ++ spokes.map(l => l -> "hub")
    val got = run(edges, iters = 6)
    val want = refPageRank(edges, iters = 6)
    assert(got == want, s"$got vs $want")
    assert(spokes.forall(l => got("hub") > got(l)), got)
    assert(spokes.map(got).distinct.size == 1, "symmetric leaves must tie")
  }

  test("C71: edge order and duplicate edges do not change a single rank bit") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c")
    val shuffled = (edges.reverse ++ edges) // dup + permuted
    assert(run(edges, 4) == run(shuffled, 4))
  }

  test("C76: labels spread hop-by-hop with clamped seeds, smallest-label ties, absent unreachables") {
    def sym(p: (Long, Long)*) =
      (p ++ p.map(e => (e._2, e._1))).toDF("src", "dst")
    // two chains meeting nowhere + a contested node 7 + isolated 8-9
    val edges = sym((1L, 2L), (2L, 3L), (6L, 5L), (5L, 4L), (4L, 3L),
      (1L, 7L), (6L, 7L), (8L, 9L))
    val seeds = Seq((1L, "red"), (6L, "blue")).toDF("node", "label")
    val got = Graph.labelSpread(edges, seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(got(1L) == ("red", 0) && got(6L) == ("blue", 0)) // clamped seeds
    assert(got(2L) == ("red", 1) && got(5L) == ("blue", 1)) // 1 hop
    assert(got(3L) == ("red", 2) && got(4L) == ("blue", 2)) // 2 hops
    assert(got(7L) == ("blue", 1), "equal votes must break to the smallest label")
    assert(!got.contains(8L) && !got.contains(9L), "unreachable nodes stay absent")
    assert(got.size == 7)
  }

  test("C76: a labeled node is never relabeled even when later votes disagree") {
    // node 2 gets red at round 1; at round 2 three blue neighbors vote
    val edges = Seq((1L, 2L), (3L, 2L), (4L, 2L), (5L, 2L),
      (1L, 3L), (1L, 4L), (1L, 5L)).flatMap(e => Seq(e, e.swap))
      .toDF("src", "dst")
    val seeds = Seq((1L, "red"), (3L, "blue"), (4L, "blue"), (5L, "blue"))
      .toDF("node", "label")
    val got = Graph.labelSpread(edges, seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // round 1: node 2 sees red(1) + blue(3) → blue wins the vote; the
    // point is the SEEDS never flip despite their disagreeing neighbors
    assert(got(1L) == "red" && got(3L) == "blue")
    assert(got(2L) == "blue")
  }

  /** Sequential mirror of the documented HITS recurrence. */
  private def refHits(edges: Seq[(String, String)], iters: Int,
                      scale: Long = Graph.HitsScale)
      : Map[String, (Long, Long)] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var hub = nodes.map(_ -> scale).toMap
    var auth = Map.empty[String, Long]
    for (_ <- 1 to iters) {
      val araw = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => hub(s) }.sum }
      val amax = math.max(araw.values.max, 1L)
      auth = araw.map { case (d, v) => d -> v * scale / amax }
      val hraw = e.groupBy(_._1).map { case (s, es) =>
        s -> es.map { case (_, d) => auth(d) }.sum }
      val hmax = math.max(hraw.values.max, 1L)
      hub = hraw.map { case (s, v) => s -> v * scale / hmax }
    }
    nodes.map(v =>
      v -> ((auth.getOrElse(v, 0L), hub.getOrElse(v, 0L)))).toMap
  }

  private def runHits(edges: Seq[(String, String)], iters: Int)
      : Map[String, (Long, Long)] =
    Graph.hits(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("C93: bipartite star — the shared authority maxes, pure sources hub-score by reach") {
    // h1→{a1,a2,a3}, h2→{a1}: a1 is everyone's target (max authority),
    // h1 points at more authority mass (max hub)
    val edges = Seq("h1" -> "a1", "h1" -> "a2", "h1" -> "a3", "h2" -> "a1")
    val got = runHits(edges, iters = 3)
    val want = refHits(edges, iters = 3)
    assert(got == want, s"$got vs $want")
    assert(got("a1")._1 == Graph.HitsScale, "most-pointed-at node holds the scale")
    assert(got("h1")._2 == Graph.HitsScale, "widest hub holds the scale")
    assert(got("h1")._2 > got("h2")._2 && got("a1")._1 > got("a2")._1, got)
    // pure sources have no in-edges → authority 0; pure sinks hub 0
    assert(got("h1")._1 == 0L && got("a2")._2 == 0L, got)
  }

  test("C93: directed chain matches the sequential reference exactly") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "a" -> "c")
    val got = runHits(edges, iters = 4)
    val want = refHits(edges, iters = 4)
    assert(got == want, s"$got vs $want")
  }

  test("C93: edge order and duplicate edges do not change a single score bit") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c")
    val shuffled = edges.reverse ++ edges
    assert(runHits(edges, 3) == runHits(shuffled, 3))
  }

  test("C71: plan has no cartesian product and one edges-sized join per iteration") {
    val edges = Seq("a" -> "b", "b" -> "a").toDF("src", "dst")
    val plan = Graph.pageRank(edges, iters = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "only the 1-row dangling aggregate may broadcast")
  }
}
