package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph centrality (C71).
  *
  * Web-scale data curation ranks its crawl frontier and weighs page
  * quality with link-graph centrality (Common Crawl publishes harmonic
  * centrality / PageRank rankings for exactly this; CCNet-style
  * pipelines consume them as a quality prior). This is the missing
  * graph-analytics leg beside the connected-components family
  * ([[Dedup.propagateMinLabels]] / [[Dedup.alternatingComponents]]):
  * components answer "which docs are the same", centrality answers
  * "which sources matter".
  *
  * INTEGER-EXACT by construction: ranks are bigint micro-units and
  * every step is integer arithmetic (`div` floor division, exact
  * bigint sums), so the result is bit-reproducible across engines,
  * partitionings and row orders — the same stance as the C62
  * integer-quantized centroids. Floating-point PageRank sums diverge
  * across summation orders; integer PageRank cannot.
  *
  * Shape at 100 TB: the rank relation is node-sized, edges are
  * touched once per iteration (ONE equi-join on src + ONE groupBy on
  * dst — the Pregel-as-join shape), the dangling term is a 1-row
  * aggregate broadcast back (the repo's 1-row `crossJoin(broadcast)`
  * stance), and `localCheckpoint` per iteration truncates the
  * iterative lineage exactly like the CC loops. Nothing driver-sized
  * ever materializes.
  */
object Graph {

  /** Default per-node starting rank (micro-units). Overflow bound:
    * `initRank * 17 * N` must fit int64 → the default 10⁹ supports
    * graphs to ~5×10⁸ nodes; scale it down for bigger graphs. */
  val PrInitRank = 1000000000L
  /** Damping d = 17/20 = 0.85 as an exact rational. */
  val PrDampNum = 17L
  val PrDampDen = 20L

  /** PageRank over a directed edge relation (`src`, `dst` columns).
    *
    * Per iteration, with N = |nodes| and S = Σ ranks:
    * {{{
    *   contrib(v) = Σ_{(u,v)∈E} rank(u) div outdeg(u)
    *   dangShare  = (Σ_{outdeg(u)=0} rank(u)) div N
    *   rank'(v)   = (initRank*(den-num)) div den
    *              + (num * (contrib(v) + dangShare)) div den
    * }}}
    * — the standard damped update with dangling mass redistributed
    * uniformly, every division a floor. Floor losses shrink S by a
    * few units per node per iteration; that drift is deterministic
    * and identical in every engine, which is the point.
    *
    * Nodes = distinct src ∪ dst (isolated vertices carry the base
    * rank only — include them in `edges` as self-loop-free mentions
    * if they matter). Fixed iteration count, no convergence test:
    * centrality consumers want a reproducible artifact, not an
    * epsilon race. */
  /** Node-count bound under which the per-round rank/contrib relations
    * are BROADCAST into the edge join instead of shuffled: the rank
    * relation comes out of `localCheckpoint` as a LogicalRDD with no
    * stats, so Spark can never auto-broadcast it and defaults every
    * round to a full shuffle join of the EDGES — measured 6.7 s → 3 s
    * at 16k nodes / 600k edges / 6 rounds when the node-sized sides
    * broadcast instead. 200k nodes ≈ single-digit MBs per round —
    * safely under any broadcast budget; beyond it (the 100 TB graph)
    * the plan is the unchanged shuffle join. Arithmetic is identical
    * either way — the integer exactness contract does not depend on
    * the join strategy. */
  val PrBroadcastNodes = 200000L

  def pageRank(edges: DataFrame, iters: Int = 6,
               initRank: Long = PrInitRank,
               dampNum: Long = PrDampNum,
               dampDen: Long = PrDampDen,
               broadcastNodes: Long = PrBroadcastNodes): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // ONE checkpointed node relation with outdeg attached feeds the
    // node count, the dangling probe AND the per-round dangling
    // semi-join — r13 ran nodes-checkpoint, count, dangling-checkpoint
    // and isEmpty as four separate pre-loop jobs; this is two (the
    // checkpoint + one aggregate)
    val nodesDeg = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .join(outDeg.withColumnRenamed("src", "node"), Seq("node"), "left")
      .localCheckpoint()
    val probe = nodesDeg.agg(count(lit(1)).as("n"),
      sum(when(col("outdeg").isNull, 1L).otherwise(0L)).as("nd"))
      .collect()(0)
    val n = probe.getLong(0)
    // WHICH nodes dangle is a static property; whether any exist
    // decides the whole iteration shape below
    val hasDangling = probe.getLong(1) > 0
    val nodes = nodesDeg.select(col("node"))
    val danglingNodes = nodesDeg.filter(col("outdeg").isNull)
      .select(col("node"))
    // edges with the sender's degree attached once, reused every round
    val eDeg = e.join(outDeg, "src").localCheckpoint()
    val base = initRank * (dampDen - dampNum) / dampDen

    // node-sized relations broadcast into the edge-sized joins when the
    // graph is small enough to know it's safe (see [[PrBroadcastNodes]])
    val bcast = n <= broadcastNodes
    def nodeSized(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df

    // no checkpoint on the INITIAL ranks: they are a narrow constant
    // projection of the already-checkpointed nodesDeg, so even the
    // dangling path's double reference re-reads cached blocks rather
    // than recomputing anything — checkpointing here was one wasted
    // full job per call (measured ~0.4 s of the r15 4.8 s floor)
    var ranks = nodes.select(col("node"), lit(initRank).as("rank"))
    for (it <- 1 to iters) {
      val contrib = eDeg
        .join(nodeSized(ranks.withColumnRenamed("node", "src")), "src")
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
      val next =
        if (hasDangling) {
          // dangling mass: ranks of nodes with no out-edges, spread
          // evenly via a 1-row broadcast
          val dangling = ranks.join(danglingNodes, Seq("node"), "left_semi")
            .agg(coalesce(sum(col("rank")), lit(0L)).as("dmass"))
            .select(expr(s"dmass div ${n}L").as("dshare"))
          // `div` (not `/` + cast): double division of near-boundary
          // quotients can round up across the floor and break exactness
          nodes
            .join(nodeSized(contrib.withColumnRenamed("dst", "node")),
              Seq("node"), "left")
            .crossJoin(broadcast(dangling))
            .select(col("node"),
              expr(s"${base}L + ((${dampNum}L * " +
                s"(coalesce(contrib, 0L) + dshare)) div ${dampDen}L)")
                .as("rank"))
        } else {
          // no dangling nodes → dshare is identically 0, the per-round
          // mass aggregate is dead weight, and `ranks` is referenced
          // exactly once — the whole loop pipelines as one linear plan
          nodes
            .join(nodeSized(contrib.withColumnRenamed("dst", "node")),
              Seq("node"), "left")
            .select(col("node"),
              expr(s"${base}L + ((${dampNum}L * coalesce(contrib, 0L))" +
                s" div ${dampDen}L)").as("rank"))
        }
      // double-referenced ranks (dangling path) must materialize per
      // round or the lineage re-executes 2^iters times; the linear
      // path pipelines but still pays planning/codegen superlinear in
      // lineage depth — truncate every OTHER round so no plan ever
      // carries more than two join+agg rounds of lineage
      ranks =
        if (hasDangling || it % 2 == 0 || it == iters) next.localCheckpoint()
        else next
    }
    ranks
  }

  /** Default HITS score scale (micro-units). Overflow bound: the
    * normalize step computes `raw * scale` with `raw ≤ maxInDeg *
    * scale`, so `maxInDeg * scale² < 2^63` → the default 10⁶ supports
    * in/out-degrees to ~9×10⁶; scale it down for denser hubs. */
  val HitsScale = 1000000L

  /** C93 — HITS hubs & authorities (Kleinberg '99) over a DIRECTED
    * edge relation (`src`, `dst`).
    *
    * PageRank (above) scores every node on one axis; HITS separates
    * the two roles a curation crawl cares about: AUTHORITIES (pages
    * worth ingesting — pointed at by good hubs) and HUBS (directories/
    * aggregators worth crawling — pointing at good authorities). The
    * classic update, mutually reinforcing:
    * {{{
    *   auth'(v) = Σ_{(u,v)∈E} hub(u)     then normalize
    *   hub'(u)  = Σ_{(u,v)∈E} auth'(v)   then normalize
    * }}}
    *
    * INTEGER-EXACT like [[pageRank]]: scores are bigint micro-units
    * and the classical L2 normalization is replaced by max-scaling
    * with floor division — `x * scale div max(x)` — so the fixed
    * point is reached in exact integer arithmetic, bit-reproducible
    * across engines and row orders (the same stance as the C71
    * damping rational). Per round at least one hub and one authority
    * hold exactly `scale`, so the scores never collapse to zero.
    *
    * Shape at 100 TB: per iteration TWO edge-relation equi-joins +
    * TWO node-sized groupBys (the Pregel-as-join shape, one per
    * direction) and two 1-row max aggregates broadcast back; only the
    * node-sized hub relation crosses rounds (`localCheckpoint`
    * truncates its lineage). Node-sized sides broadcast under
    * [[PrBroadcastNodes]], exactly as in [[pageRank]]. The max
    * aggregate references the raw-score relation a second time inside
    * its broadcast subtree — that does NOT re-run the edge join:
    * ReuseExchange dedups the groupBy exchange within the round's
    * plan (verified empirically by GraphFloor's hits-round probe —
    * `ReusedExchange` in the executed plan), so the per-iteration
    * edge-join count really is two. (Dropping the per-round
    * checkpoints entirely was ALSO measured — 4.3 s → 8.3 s at the
    * sf0.1 gate graph: exchange reuse does not cross the broadcast
    * boundaries of LATER rounds' plans, so the checkpoints stay.)
    *
    * Nodes with no in-edges score authority 0; nodes with no
    * out-edges score hub 0 (sparse inside the loop, filled by the
    * final left joins). Fixed iteration count, no epsilon race. */
  def hits(edges: DataFrame, iters: Int = 3,
           scale: Long = HitsScale,
           broadcastNodes: Long = PrBroadcastNodes): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    val bcast = n <= broadcastNodes
    def nodeSized(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df

    // only the hub relation crosses rounds; auth is derived inside
    var hub = nodes.select(col("node"), lit(scale).as("hub"))
      .localCheckpoint()
    var auth: DataFrame = null
    for (it <- 1 to iters) {
      val authRaw = e
        .join(nodeSized(hub.withColumnRenamed("node", "src")), "src")
        .groupBy(col("dst")).agg(sum(col("hub")).as("araw"))
      // max-normalize via a 1-row broadcast; greatest(1) guards the
      // (unreachable with non-empty edges) all-zero round
      val maxA = authRaw.agg(greatest(max(col("araw")), lit(1L)).as("amax"))
      auth = authRaw.crossJoin(broadcast(maxA))
        .select(col("dst").as("node"),
          expr(s"(araw * ${scale}L) div amax").as("auth"))
        .localCheckpoint()
      val hubRaw = e
        .join(nodeSized(auth.withColumnRenamed("node", "dst")), "dst")
        .groupBy(col("src")).agg(sum(col("auth")).as("hraw"))
      val maxH = hubRaw.agg(greatest(max(col("hraw")), lit(1L)).as("hmax"))
      hub = hubRaw.crossJoin(broadcast(maxH))
        .select(col("src").as("node"),
          expr(s"(hraw * ${scale}L) div hmax").as("hub"))
        .localCheckpoint()
    }
    nodes
      .join(nodeSized(auth), Seq("node"), "left")
      .join(nodeSized(hub), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("auth"), lit(0L)).as("auth"),
        coalesce(col("hub"), lit(0L)).as("hub"))
  }

  /** C76 — seed-label expansion (semi-supervised label propagation):
    * a handful of trusted labels (curated seed domains, hand-audited
    * docs) spread over a similarity graph — here the near-dup pair
    * relation the dedup screens already produce — to label the
    * unlabeled mass, the weak-supervision bootstrap every
    * quality-classifier training set starts from (cf. fastText web
    * classifiers seeded from curated domain lists).
    *
    * DETERMINISTIC by construction, so it carries a SQL oracle where
    * classic float-weighted propagation cannot: votes are integer
    * neighbor counts, each unlabeled node takes the majority label
    * among its labeled neighbors with ties broken by the
    * lexicographically smallest label, and seeds are clamped (never
    * relabeled). Fixed `rounds`, so reachability is exactly
    * "within `rounds` hops of a seed" — a reproducible artifact.
    *
    * Shape at 100 TB: per round ONE edges⋈labels equi-join + ONE
    * (node, label) groupBy + ONE per-node window (vote-relation
    * sized, grouped by node — no global sort); the label relation is
    * node-sized; `localCheckpoint` per round truncates the lineage
    * (labels are read twice per round: votes + the already-labeled
    * anti-join).
    *
    * `edges` (src, dst) is treated as DIRECTED votes src→dst — pass
    * both directions for the usual undirected similarity graph.
    * Output: (node, label, round) with round = the hop at which the
    * label arrived (0 for seeds); nodes unreachable from any seed are
    * absent — count them as the accounting relation via an anti-join
    * of the node universe. */
  def labelSpread(edges: DataFrame, seeds: DataFrame,
                  rounds: Int = 3,
                  broadcastNodes: Long = PrBroadcastNodes): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rounds >= 1, "rounds must be >= 1")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    // the label relation is bounded by the node count; when that bound
    // clears the broadcast gate, every round's edge join and anti-join
    // take the label side broadcast instead of shuffling the EDGES —
    // the checkpointed labels are stats-less LogicalRDDs Spark can
    // never auto-broadcast (the [[PrBroadcastNodes]] finding)
    val n = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().count()
    def nodeSized(df: DataFrame): DataFrame =
      if (n <= broadcastNodes) broadcast(df) else df
    var lab = seeds.select(col("node"), col("label"), lit(0).as("round"))
      .localCheckpoint()
    for (r <- 1 to rounds) {
      val votes = e
        .join(nodeSized(lab.select(col("node").as("src"), col("label"))), "src")
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("votes"))
      val w = Window.partitionBy(col("dst"))
        .orderBy(col("votes").desc, col("label").asc)
      val newly = votes
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("dst").as("node"), col("label"), lit(r).as("round"))
        .join(nodeSized(lab.select(col("node"))), Seq("node"), "left_anti")
      lab = lab.union(newly).localCheckpoint()
    }
    lab
  }
}
