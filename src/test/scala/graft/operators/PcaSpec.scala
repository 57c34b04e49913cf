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

  test("q_emb_pca: one row per vector, mean whitened norm ≈ k") {
    val out = graft.queries.DocQueries.qEmbPca(spark, "/root/testdata/sf0.001")
    val n = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings").count()
    assert(out.count() == n)
    // E[Σ_k y_k²] = k for unit-variance components over a CENTERED
    // cloud; loose band — the real pin is the operator spec above
    val meanNorm = out.agg(avg("whitened_sq_norm")).head().getDouble(0)
    assert(meanNorm > 4.0 && meanNorm < 12.0, s"mean whitened norm $meanNorm")
  }
}
