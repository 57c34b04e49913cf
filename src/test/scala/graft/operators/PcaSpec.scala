package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** C69 — distributed PCA / whitening: the eigensolver against known
  * matrices, the fitted basis against planted structure, the
  * whitening contract, and the variance-explained accounting. */
class PcaSpec extends SparkSpec {

  import spark.implicits._

  test("jacobiEigen recovers a known symmetric spectrum") {
    // [[4,1],[1,4]] has eigvals {5, 3}, vecs (1,1)/√2 and (1,-1)/√2
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(4.0, 1.0), Array(1.0, 4.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 3.0) < 1e-12 &&
      math.abs(sorted(1) - 5.0) < 1e-12, vals.toSeq.toString)
    // eigenvectors are orthonormal columns
    val dot = vecs(0)(0) * vecs(0)(1) + vecs(1)(0) * vecs(1)(1)
    assert(math.abs(dot) < 1e-12)
    // diagonal matrix: identity basis, eigvals on the diagonal
    val (dv, _) = Pca.jacobiEigen(
      Array(Array(7.0, 0.0, 0.0), Array(0.0, 2.0, 0.0), Array(0.0, 0.0, 9.0)))
    assert(dv.toSeq == Seq(7.0, 2.0, 9.0))
  }

  // Deterministic anisotropic cloud: x = t·dir + small orthogonal
  // wiggle, t and wiggle derived from the row id (no RNG). Variance
  // along `dir` dominates by ~100×, so the top component must be dir.
  private def planted(d: Int, n: Int) = {
    val dir = Array.tabulate(d)(i => if (i % 2 == 0) 1.0 else 0.5)
    val nrm = math.sqrt(dir.map(x => x * x).sum)
    val unit = dir.map(_ / nrm)
    val rows = (0 until n).map { r =>
      val t = (r % 21) - 10.0               // spread ±10 along dir
      val w = ((r * 7) % 5) - 2.0           // ±2 wiggle on one axis
      val v = unit.map(_ * t)
      v(1) += w * 0.1
      (r.toLong, v.toSeq)
    }
    (unit, rows.toDF("vec_id", "embedding"))
  }

  test("fit finds the planted dominant direction; basis is orthonormal") {
    val (unit, df) = planted(d = 8, n = 420)
    val m = Pca.fit(df, "embedding", k = 3)
    assert(m.dim == 8 && m.n == 420L)
    // eigvals descending
    assert(m.eigvals.zip(m.eigvals.tail).forall { case (a, b) => a >= b },
      m.eigvals.toSeq.toString)
    // top component ≈ planted direction (sign-fixed)
    val cos = m.components(0).zip(unit).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.999, s"top-component cos=$cos")
    // orthonormal rows
    for (i <- m.components.indices; j <- i until m.components.length) {
      val dot = m.components(i).zip(m.components(j))
        .map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"comp($i)·comp($j)=$dot")
    }
    // variance accounting: 3 of 8 components carry ~all planted
    // variance (dir + the axis-1 wiggle are rank 2)
    assert(m.varianceExplained > 0.999, m.varianceExplained.toString)
    // ragged input fails loud
    val ragged = df.union(Seq((999L, Seq(1.0, 2.0))).toDF("vec_id", "embedding"))
    intercept[IllegalArgumentException] { Pca.fit(ragged, "embedding", 2) }
    intercept[IllegalArgumentException] { Pca.fit(df, "embedding", 0) }
  }

  test("whitened projection has unit variance per component") {
    val (_, df) = planted(d = 8, n = 420)
    val m = Pca.fit(df, "embedding", k = 2)
    val proj = Pca.project(df, "vec_id", "embedding", m, whiten = true)
    assert(proj.count() == 420L)
    // population variance of each whitened component ≈ 1
    val stats = proj.select(
        posexplode(col("proj")).as(Seq("c", "y")))
      .groupBy("c")
      .agg((sum(col("y") * col("y")) / count(lit(1)) -
        pow(sum(col("y")) / count(lit(1)), 2)).as("variance"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(stats.size == 2)
    stats.foreach { case (c, v) =>
      assert(math.abs(v - 1.0) < 1e-6, s"component $c variance $v")
    }
    // unwhitened: component variances equal the eigvals
    val raw = Pca.project(df, "vec_id", "embedding", m, whiten = false)
      .select(posexplode(col("proj")).as(Seq("c", "y")))
      .groupBy("c")
      .agg((sum(col("y") * col("y")) / count(lit(1)) -
        pow(sum(col("y")) / count(lit(1)), 2)).as("variance"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    raw.foreach { case (c, v) =>
      assert(math.abs(v - m.eigvals(c)) < 1e-6 * math.max(1.0, m.eigvals(c)),
        s"component $c variance $v != eigval ${m.eigvals(c)}")
    }
  }

  test("q_emb_pca: k rows per vector; whitened coordinates keep unit variance through the integer path") {
    val out = graft.queries.DocQueries.qEmbPca(spark, "/root/testdata/sf0.001")
      .collect()
    val n = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings").count()
    assert(out.length == n * 8, s"expected ${n * 8} (vec, comp) rows")
    // wq ≈ 1e15 × the whitened float coordinate: E[Σ_k y_k²] = k for
    // unit-variance components over a centered cloud; loose band —
    // the real pin is the operator specs above
    val norms = out.groupBy(_.getLong(0)).values.map(rows =>
      rows.map(r => { val w = BigDecimal(r.getString(3)).toDouble / 1e15; w * w }).sum)
    val meanNorm = norms.sum / norms.size
    assert(meanNorm > 4.0 && meanNorm < 12.0, s"mean whitened norm $meanNorm")
  }

  test("C69p: projectPortable matches the float projection within quantization error; praw recomputes by hand") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(0.5f, -0.25f, 0.125f, 1.0f)),
      (2L, Seq(-1.0f, 0.75f, 0.0f, -0.5f)),
      (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (4L, Seq(0.3f, 0.9f, -0.7f, 0.2f)))
      .toDF("vec_id", "embedding")
    val m = Pca.fit(vecs, "embedding", k = 2)
    val rules = Pca.portableRules(m)
    val got = Pca.projectPortable(vecs, "vec_id", "embedding", rules)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), BigDecimal(r.getString(3)))))
      .toMap
    assert(got.size == 8, "4 vectors × 2 components")
    // hand recompute: praw = Σ round(1e6·x)·qc − Σ qm·qc, wq = praw·qinv
    val data = Map(1L -> Seq(0.5, -0.25, 0.125, 1.0),
      2L -> Seq(-1.0, 0.75, 0.0, -0.5), 3L -> Seq(0.0, 0.0, 0.0, 0.0),
      4L -> Seq(0.3, 0.9, -0.7, 0.2))
    for ((id, xs) <- data; c <- 0 until 2) {
      val qx = xs.map(x => BigDecimal(x * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      val praw = qx.zip(rules.qcomps(c)).map { case (a, b) => a * b }.sum -
        rules.consts(c)
      val wq = BigDecimal(praw) * BigDecimal(rules.qinvsd(c))
      assert(got((id, c.toLong)) == ((praw, wq)),
        s"($id, $c): got ${got((id, c.toLong))} want ($praw, $wq)")
      // and the integer path tracks the float path: praw/1e12 vs proj
    }
    val flt = Pca.project(vecs, "vec_id", "embedding", m, whiten = true)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for ((id, _) <- data; c <- 0 until 2) {
      val w = got((id, c.toLong))._2.toDouble / 1e15
      // 1e6 coordinate quantization + 1e3 whitening-scale quantization:
      // agreement to ~1e-3 absolute on unit-range data
      assert(math.abs(w - flt(id)(c)) < 5e-3,
        s"($id, $c): portable $w vs float ${flt(id)(c)}")
    }
  }
}
