package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Contracts of the ENGINE-PORTABLE ANN configurations (the r15 gate
  * promotions): the portable IVF/PQ/OPQ/IVF-PQ paths trade a little
  * recall (seeded codebooks, no Lloyd refinement) for bit-exact
  * cross-engine replay — so the specs pin BOTH sides of that trade:
  * exactness where the construction promises it (full probe / full
  * re-rank reproduce brute force; the signed permutation is a true
  * orthogonal transform) and measured recall floors where it does not.
  * Cross-engine equality itself is pinned by the correctness gate's
  * DuckDB mirrors (DocQueries.portablePqSql / ivfOracleSql). */
class PortableAnnSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private def exactTop(k: Int): Set[Long] = {
    val emb = Tables.load(spark, sf, "embeddings")
    Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, k)
      .collect().map(_.getLong(0)).toSet
  }

  test("C6p: portable IVF — full probe equals brute force, recall floors hold") {
    val emb = Tables.load(spark, sf, "embeddings")
    val exact = exactTop(20)
    val index = Ivf.fitPortable(emb, "vec_id", "embedding", numCells = 16)
    def recall(np: Int): Double = {
      val got = index.topK(0L, 20, np).collect().map(_.getLong(0)).toSet
      (exact & got).size / 20.0
    }
    val r4 = recall(4); val r16 = recall(16)
    info(f"portable IVF recall@20: nprobe4=$r4%.2f nprobe16=$r16%.2f")
    assert(r16 == 1.0, s"full probe must equal brute force, got $r16")
    assert(r4 >= 0.30, s"portable IVF nprobe=4 recall collapsed to $r4")
    index.unpersist()
  }

  test("C25p: portable PQ — codes valid, full re-rank exact, re-rank recall floor") {
    val emb = Tables.load(spark, sf, "embeddings")
    val exact = exactTop(20)
    val (model, codes) = Pq.buildPortable(emb, "vec_id", "embedding",
      m = 8, codewords = 16)
    val rows = codes.collect()
    assert(rows.forall(_.getSeq[Int](1).size == 8))
    assert(rows.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < 16)))
    def recall(rerank: Int): Double = {
      val got = Pq.topKPortable(emb, "vec_id", "embedding", codes, model,
        0L, 20, rerank).collect().map(_.getLong(0)).toSet
      (exact & got).size / 20.0
    }
    val reranked = recall(100)
    val full = recall(rows.length)
    info(f"portable PQ recall@20: rerank100=$reranked%.2f full=$full%.2f")
    assert(full == 1.0, "full re-rank must equal brute force")
    assert(reranked >= 0.30, s"portable PQ rerank-100 recall collapsed to $reranked")
    codes.unpersist()
  }

  test("C94: random projection — sign matrix is ±1 and deterministic, full re-rank equals brute force, JL recall floor") {
    val emb = Tables.load(spark, sf, "embeddings")
    val m = Rp.signMatrix(64, 16)
    assert(m.length == 16 && m.forall(_.length == 64))
    assert(m.flatten.forall(s => s == 1L || s == -1L))
    assert(m.map(_.toSeq).toSeq == Rp.signMatrix(64, 16).map(_.toSeq).toSeq,
      "the seeded matrix must be bit-stable across calls")
    // the matrix must not be degenerate (all rows equal would project
    // to one effective dimension): all 16 rows distinct
    assert(m.map(_.toSeq).distinct.length == 16)
    val n = emb.count().toInt
    val exact = exactTop(20)
    def recall(rerank: Int): Double = {
      val got = Rp.topKPortable(emb, "vec_id", "embedding", 0L, 20, rerank)
        .collect().map(_.getLong(0)).toSet
      (exact & got).size / 20.0
    }
    val reranked = recall(100)
    val full = recall(n - 1) // every candidate survives → exact order
    info(f"RP 64→16 recall@20: rerank100=$reranked%.2f full=$full%.2f")
    assert(full == 1.0, "full re-rank must equal brute force")
    assert(reranked >= 0.30, s"RP rerank-100 recall collapsed to $reranked")
  }

  test("C94: projected space preserves an exact duplicate as the top candidate") {
    import spark.implicits._
    // planted corpus: id 0 = query, id 1 = exact copy, others far away
    val v = (0 until 64).map(i => math.sin(i + 1).toFloat).toArray
    val far = (0 until 64).map(i => math.cos(3 * i + 2).toFloat).toArray
    val rows = Seq(
      (0L, v), (1L, v.clone()),
      (2L, far), (3L, far.map(x => -x)), (4L, far.map(_ * 0.5f)))
    val emb = rows.toDF("vec_id", "embedding")
    val top = Rp.topKPortable(emb, "vec_id", "embedding", 0L, k = 1,
      rerank = 2).collect()
    assert(top.head.getLong(0) == 1L,
      s"the exact duplicate must win the projected scan, got ${top.toSeq}")
    // psim of a copy = |pv|² ≥ any other candidate's projected score
    assert(top.head.getLong(1) >= 0L)
  }

  test("C97: delta admission — frozen seeds, delta participates, empty delta is identity") {
    import spark.implicits._
    val emb = Tables.load(spark, sf, "embeddings")
    val isDelta = substring(md5(col("vec_id").cast("string")), 1, 1) === "f"
    val base = emb.filter(!isDelta)
    val delta = emb.filter(isDelta)
    assert(delta.count() > 0, "md5 slice must be non-empty or the test is vacuous")
    val idx = Ivf.fitPortable(base, "vec_id", "embedding", numCells = 16)
    // identity: admitting nothing changes nothing
    val baseTop = idx.topK(0L, 20, 4).collect().map(_.getLong(0)).toSeq
    val emptyTop = idx.admitDelta(delta.filter(lit(false)))
      .topK(0L, 20, 4).collect().map(_.getLong(0)).toSeq
    assert(baseTop == emptyTop, "empty delta must be the identity")
    // frozen seeds: admitting the delta equals assigning ALL vectors
    // against the base's seeds (the rebuild-free contract)
    val seedDf = idx.cells.zipWithIndex
      .map { case (qc, cid) => (cid, qc.toSeq) }.toDF("__cid", "qc")
    val refAssigned = Ivf.assignCellsPortable(emb, "vec_id", "embedding", seedDf)
    val ref = Ivf.PortableIvfIndex(idx.cells, refAssigned, emb,
      "vec_id", "embedding").topK(0L, 20, 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = idx.admitDelta(delta).topK(0L, 20, 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == ref, s"admitDelta must equal assign-all-vs-base-seeds:\n$got\n$ref")
    idx.unpersist()
  }

  test("C97: a delta exact-duplicate of the query enters the serve as top-1") {
    import spark.implicits._
    val v = (0 until 64).map(i => math.sin(i + 1).toFloat).toArray
    def jitter(s: Int) = (0 until 64).map(i => math.cos(s * 64 + i).toFloat).toArray
    val base = ((0L, v) +: (1L to 20L).map(i => (i, jitter(i.toInt)))).toDF("vec_id", "embedding")
    val idx = Ivf.fitPortable(base, "vec_id", "embedding", numCells = 4)
    val delta = Seq((100L, v.clone())).toDF("vec_id", "embedding")
    val top = idx.admitDelta(delta).topK(0L, k = 1, nprobe = 4).collect()
    assert(top.head.getLong(0) == 100L,
      s"the admitted duplicate must win the probe, got ${top.toSeq}")
    // and a wrong-dim delta fails loudly, never a silent prefix score
    val bad = Seq((200L, v.take(16))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](idx.admitDelta(bad))
    assert(e.getMessage.contains("dim"))
    idx.unpersist()
  }

  test("C100: IVF-PQ delta admission — pre-delta serve bit-identical, planted duplicate wins, duplicate id rejected") {
    import spark.implicits._
    val v = (0 until 64).map(i => math.sin(i + 1).toFloat).toArray
    def jitter(s: Int) = (0 until 64).map(i => math.cos(s * 64 + i).toFloat).toArray
    val base = ((0L, v) +: (1L to 40L).map(i => (i, jitter(i.toInt))))
      .toDF("vec_id", "embedding")
    val (cells, model, codes) = Pq.buildIvfPortable(base, "vec_id", "embedding",
      numCells = 4, m = 8, codewords = 8)
    val baseTop = Pq.topKIvfPortable(base, "vec_id", "embedding", cells, model,
        codes, queryId = 0L, k = 5, nprobe = 4, rerank = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val delta = Seq((100L, v.clone())).toDF("vec_id", "embedding")
    val union = Pq.admitDeltaIvfPortable(cells, model, codes, delta,
      "vec_id", "embedding")
    // FAISS add semantics: the base codes are untouched — the union is
    // exactly base codes + |delta| new rows
    assert(union.filter(col("vec_id") =!= 100L).count() == codes.count(),
      "admit must not touch the base codes")
    val embAll = base.unionByName(delta)
    val top = Pq.topKIvfPortable(embAll, "vec_id", "embedding", cells, model,
        union, queryId = 0L, k = 5, nprobe = 4, rerank = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top.head._1 == 100L,
      s"the admitted exact duplicate must win the ADC serve, got $top")
    // every pre-delta candidate decision is bit-identical: removing the
    // delta hit leaves the base ranking prefix unchanged
    assert(top.filterNot(_._1 == 100L) == baseTop.take(4),
      s"pre-delta ranking must be unchanged:\n$top\n$baseTop")
    // a delta id already in the base codes is rejected loudly — it
    // would otherwise appear twice in a probe's candidate set
    val dup = Seq((1L, jitter(1))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Pq.admitDeltaIvfPortable(cells, model, codes, dup, "vec_id", "embedding"))
    assert(e.getMessage.contains("already present"))
    codes.unpersist()
  }

  test("C25dp: signed permutation is orthogonal — integer L2 is preserved exactly") {
    val dim = 64
    val (perm, sign) = Pq.signedPermutation(dim)
    // a true permutation with unit signs = an orthogonal matrix
    assert(perm.sorted.toSeq == (0 until dim), "perm must be a bijection")
    assert(sign.forall(s => s == 1 || s == -1))
    // distance preservation on arbitrary integer vectors — the property
    // that makes the rotated ADC a valid OPQ serve
    val rnd = new scala.util.Random(7)
    val a = Array.fill(dim)(rnd.nextInt(2000000).toLong - 1000000)
    val b = Array.fill(dim)(rnd.nextInt(2000000).toLong - 1000000)
    def d2(x: Array[Long], y: Array[Long]): Long =
      x.zip(y).map { case (u, v) => (u - v) * (u - v) }.sum
    val ra = Array.tabulate(dim)(i => sign(i) * a(perm(i)))
    val rb = Array.tabulate(dim)(i => sign(i) * b(perm(i)))
    assert(d2(ra, rb) == d2(a, b), "signed permutation must preserve L2 exactly")
  }

  test("C25dp2: portable OPQ — full re-rank exact, rotation changes the codes") {
    val emb = Tables.load(spark, sf, "embeddings")
    val exact = exactTop(20)
    val (model, codes) = Pq.buildOpqPortable(emb, "vec_id", "embedding",
      m = 8, codewords = 16)
    val n = codes.count().toInt
    val full = Pq.topKOpqPortable(emb, "vec_id", "embedding", codes, model,
      0L, 20, rerank = n).collect().map(_.getLong(0)).toSet
    assert(full == exact, "full re-rank must equal brute force")
    // the permutation genuinely re-mixes subspaces: the rotated codes
    // differ from the unrotated ones (else the transform is dead code)
    val (pm, pcodes) = Pq.buildPortable(emb, "vec_id", "embedding",
      m = 8, codewords = 16)
    val plain = pcodes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val rotated = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(plain.exists { case (id, cs) => rotated(id) != cs },
      "rotation must change at least one vector's codes")
    assert(pm.dim == model.dim)
    codes.unpersist(); pcodes.unpersist()
  }

  test("C86: probe recall curve — full probe recall is 1, monotone in nprobe, hits bounded") {
    val emb = Tables.load(spark, sf, "embeddings")
    val curve = Ivf.probeRecallCurve(emb, "vec_id", "embedding",
      numCells = 16, k = 20, nprobes = Seq(1, 2, 4, 8, 16), numQueries = 8)
      .orderBy("nprobe").collect()
    assert(curve.length == 5)
    val recalls = curve.map(_.getDouble(4))
    info("recall by nprobe: " + curve.map(r =>
      s"${r.getInt(0)}→${r.getDouble(4)}").mkString(", "))
    // full probe: every truth neighbor's cell is inside the probe set
    assert(recalls.last == 1.0, s"recall@full-probe must be 1, got ${recalls.last}")
    // monotone: widening the probe can never lose a hit
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must be monotone in nprobe: ${recalls.mkString(", ")}")
    // accounting: hits <= truth_rows = n_queries * k (every query has >= k neighbors here)
    curve.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2))
      assert(r.getLong(2) == r.getLong(1) * 20)
    }
  }

  test("C56p: portable MMR — first pick is max integer relevance, duplicates displaced, λ=1 limit") {
    val emb = Tables.load(spark, sf, "embeddings")
    val out = Similarity.mmrTopKPortable(emb, "vec_id", "embedding",
      queryId = 0L, k = 10, poolSize = 100).collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(0)).toSeq == (1L to 10L), "ranks must be 1..10")
    // rank 1 = pure max relevance (no selected set yet)
    val rels = out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rels.head._3 == 7L * rels.head._2, "rank-1 score must be 7*qrel")
    // λ = den (pure relevance): order must equal the qrel order
    val pure = Similarity.mmrTopKPortable(emb, "vec_id", "embedding",
      queryId = 0L, k = 10, poolSize = 100,
      lambdaNum = 10L, lambdaDen = 10L).collect()
    val byRel = pure.map(_.getLong(2)).toSeq
    assert(byRel == byRel.sortBy(-(_: Long)), "λ=1 must rank by relevance")
    // determinism: identical reruns
    val again = Similarity.mmrTopKPortable(emb, "vec_id", "embedding",
      queryId = 0L, k = 10, poolSize = 100).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // diversity: an exact duplicate of the top pick must not take rank 2
    // (its max-sim to the selected set is its own self-similarity scale)
    import org.apache.spark.sql.functions._
    val top = rels.head._1
    val dup = emb.filter(col("vec_id") === top)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"),
        col("label"))
    val aug = emb.unionByName(dup)
    val withDup = Similarity.mmrTopKPortable(aug, "vec_id", "embedding",
      queryId = 0L, k = 10, poolSize = 100).collect()
    assert(withDup.head.getLong(1) == math.min(top, top + 1000000L))
    assert(withDup(1).getLong(1) != top + 1000000L,
      "the exact duplicate of the top pick must be displaced from rank 2")
  }

  test("C25bp: portable IVF-PQ — candidates come only from probed cells; full config exact") {
    val emb = Tables.load(spark, sf, "embeddings")
    val exact = exactTop(20)
    val (cells, model, codes) = Pq.buildIvfPortable(emb, "vec_id", "embedding",
      numCells = 16, m = 8, codewords = 16)
    val n = codes.count().toInt
    // full probe + full re-rank reproduces brute force
    val full = Pq.topKIvfPortable(emb, "vec_id", "embedding", cells, model,
      codes, 0L, 20, nprobe = 16, rerank = n)
      .collect().map(_.getLong(0)).toSet
    assert(full == exact, "full probe + full re-rank must equal brute force")
    // a 1-cell probe's results all live in one cell
    val one = Pq.topKIvfPortable(emb, "vec_id", "embedding", cells, model,
      codes, 0L, 20, nprobe = 1, rerank = n)
      .collect().map(_.getLong(0)).toSet
    val cellsOf = codes.select(col("vec_id"), col("centroid_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(one.map(cellsOf).size <= 1, "nprobe=1 results must share one cell")
    codes.unpersist()
  }
}
