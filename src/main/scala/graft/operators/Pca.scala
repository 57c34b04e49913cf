package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA / whitening over an embedding column (SURVEY.md §2
  * C69) — the embedding-space normalization stage of a training-data
  * pipeline: decorrelate and variance-normalize vectors before
  * semantic dedup / ANN indexing (whitening measurably improves
  * retrieval on anisotropic embedding spaces — the "all vectors point
  * the same way" pathology of contrastive encoders), or project to a
  * smaller k for cheap pre-filters.
  *
  * Scale shape (100 TB): [[fit]] is ONE data pass (plus a 1-row
  * limit(1) probe for d) — per-dim sums AND the upper TRIANGLE of
  * Σ x·xᵀ ride one posexploded relation with d + d(d+1)/2 grouping
  * keys, partial-aggregated map-side, so the shuffle is model-sized
  * (d=1024 → ~525k keys), never data-sized; the ragged-row guard
  * falls out of the same pass's per-position counts for free. The
  * driver materializes exactly d + d(d+1)/2 doubles
  * and eigensolves the d×d covariance by cyclic Jacobi — the
  * IVF-centroid stance: driver state is MODEL-sized; the O(n·d²)
  * products run where the data lives. [[project]] broadcasts the
  * model as literals and is map-only codegen'd HOF arithmetic (one
  * `zip_with`/`aggregate` dot product per component).
  *
  * Determinism: Jacobi rotations are cyclic (fixed visit order) and
  * the eigenbasis is sign-fixed (largest-|component| positive) and
  * sorted by descending eigenvalue (ties by first differing
  * component), so a given covariance matrix yields ONE model.
  * Float sums across partitions carry the usual re-association
  * jitter, which is why PCA outputs are rows-only in the harness and
  * spec-pinned with tolerances instead of hashed.
  *
  * Reference scope note: QOPCFDR delegates analytics to Athena
  * (/root/reference/README.md:48) and has no embedding story; this
  * operator belongs to the training-data extension surface.
  */
object Pca {

  /** The fitted model: `components` holds k rows of d loadings
    * (orthonormal, descending `eigvals` — population variances along
    * each component). */
  final case class PcaModel(dim: Int, n: Long, mean: Array[Double],
                            eigvals: Array[Double],
                            components: Array[Array[Double]],
                            totalVariance: Double) {
    /** Fraction of total variance the k kept components carry —
      * the accounting relation for the lossy projection (the
      * dropped-bucket stance: what a k-dim view discards is a
      * number, not a surprise). */
    def varianceExplained: Double =
      if (totalVariance <= 0) 1.0 else eigvals.sum / totalVariance
  }

  /** Fit a k-component PCA on `df(vecCol)` (array<float|double>,
    * fixed length). One data pass; driver work is the d×d Jacobi
    * eigensolve. Rows whose vector length differs from the first
    * row's are rejected (fail loud — a ragged embedding column is an
    * upstream bug, the [[Similarity]] stance). */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val v = col(vecCol)
    val first = df.select(size(v)).limit(1).collect()
    require(first.nonEmpty, "cannot fit PCA on an empty table")
    val d = first(0).getInt(0)
    require(k >= 1 && k <= d, s"need 1 <= k <= d, got k=$k d=$d")

    // THE one data pass, as a partition-local accumulator: each task
    // folds its rows into d sums + the d(d+1)/2 upper-triangle product
    // sums and emits ONE model-sized record, collected and combined on
    // the driver (numPartitions × ~(d²/2) doubles — model-sized, never
    // data-sized; zero shuffle). This replaced a posexplode of d +
    // d(d+1)/2 values per row into a grouped agg: declaratively
    // correct, but a 2000×-per-row amplification through interpreted
    // HOF lambdas that cost 16.9 s at the 20k×64 decade corpus where
    // this loop costs <1 s — and at 100 TB the explode materializes
    // d²/2 shuffle-input values per ROW where this emits d²/2 per
    // PARTITION. The rare justified `mapPartitions`: Spark has no
    // builtin vector-sum aggregate, and this is genuine per-partition
    // imperative accumulation (MLlib's computeCovariance shape).
    // Raggedness stays fail-loud: any row whose length differs from
    // the first row's d is reported, never silently mis-multiplied.
    val nTri = d * (d + 1) / 2
    val partials = df.select(transform(v, x => x.cast("double")).as("v"))
      .where(col("v").isNotNull)
      .rdd.mapPartitions { it =>
        var n = 0L
        var bad = -1
        val sums = new Array[Double](d)
        val tri = new Array[Double](nTri)
        while (it.hasNext) {
          val seq = it.next().getSeq[Double](0)
          if (seq.length != d) bad = seq.length
          else {
            n += 1
            val arr = seq.toArray
            var i = 0
            var t = 0
            while (i < d) {
              val xi = arr(i)
              sums(i) += xi
              var j = i
              while (j < d) { tri(t) += xi * arr(j); j += 1; t += 1 }
              i += 1
            }
          }
        }
        Iterator.single((n, bad, sums, tri))
      }.collect()
    partials.collectFirst { case (_, bad, _, _) if bad >= 0 => bad }
      .foreach(bad => throw new IllegalArgumentException(
        s"ragged $vecCol: saw length $bad, first row has $d"))
    val n = partials.map(_._1).sum
    require(n > 0, s"cannot fit PCA: no non-null $vecCol rows")
    val mean = new Array[Double](d)
    val triSum = new Array[Double](nTri)
    partials.foreach { case (_, _, s, t) =>
      var i = 0
      while (i < d) { mean(i) += s(i); i += 1 }
      var p = 0
      while (p < nTri) { triSum(p) += t(p); p += 1 }
    }
    var mi = 0
    while (mi < d) { mean(mi) /= n; mi += 1 }
    // tri pos -> (i, j) of the row-major upper triangle
    val cov = Array.ofDim[Double](d, d)
    (0 until nTri).foreach { p =>
      var pos = p; var i = 0
      while (pos >= d - i) { pos -= d - i; i += 1 }
      val j = i + pos
      val c = triSum(p) / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }

    val (vals, vecs) = jacobiEigen(cov)
    // sort descending, sign-fix each vector (largest-|x| entry > 0)
    val order = vals.indices.sortBy(c => -vals(c))
    val comps = order.take(k).map { c =>
      val vcol = Array.tabulate(d)(r => vecs(r)(c))
      val m = vcol.indices.maxBy(i => math.abs(vcol(i)))
      if (vcol(m) < 0) vcol.map(-_) else vcol
    }.toArray
    PcaModel(d, n, mean, order.take(k).map(vals(_)).toArray, comps,
      totalVariance = vals.sum)
  }

  /** Project to the model's k components: `(idCol, proj array<double>)`
    * — map-only, model broadcast as literals. `whiten = true` divides
    * each component by √eigval so the projected dims have unit
    * population variance (a zero-variance component projects to 0,
    * not NaN). */
  def project(df: DataFrame, idCol: String, vecCol: String,
              model: PcaModel, whiten: Boolean = false): DataFrame = {
    val meanLit = typedLit(model.mean.toSeq)
    val centered = zip_with(col(vecCol), meanLit,
      (x, m) => x.cast("double") - m)
    val projCols: Seq[Column] = model.components.toSeq.zipWithIndex.map {
      case (comp, c) =>
        val dot = aggregate(
          zip_with(centered, typedLit(comp.toSeq), (a, b) => a * b),
          lit(0.0), (acc, e) => acc + e)
        val ev = model.eigvals(c)
        if (whiten) { if (ev > 0) dot / math.sqrt(ev) else lit(0.0) } else dot
    }
    df.select(col(idCol), array(projCols: _*).as("proj"))
  }

  /** ENGINE-PORTABLE projection rules (r18, the trained-rule-stash
    * recipe): the fitted model quantized to integers — mean and
    * components at 1e6, the whitening scale `1/√λ` at 1e3 (zero for a
    * zero-variance component, matching [[project]]'s 0-not-NaN
    * stance). With these rules interpolated as literals, an
    * independent engine recomputes every projection row from the raw
    * embeddings with integer arithmetic only: the eigensolve stays
    * declared (rows-only float), but the map-only projection math —
    * where a regression would actually land — hash-checks. */
  final case class PortableRules(qmean: Seq[Long], qcomps: Seq[Seq[Long]],
                                 qinvsd: Seq[Long]) {
    /** Σ qmean·qcomp per component — since the projection distributes,
      * `Σ(qx−qm)·qc = Σ qx·qc − const`, the mirror subtracts one
      * precomputed constant instead of list-zipping a subtraction. */
    def consts: Seq[Long] =
      qcomps.map(c => c.iterator.zip(qmean.iterator).map {
        case (a, b) => a * b
      }.sum)
  }

  /** Quantize a fitted model into [[PortableRules]]. */
  def portableRules(model: PcaModel): PortableRules = {
    def q(x: Double, scale: Double): Long =
      BigDecimal(x * scale)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    PortableRules(
      model.mean.toSeq.map(q(_, 1e6)),
      model.components.toSeq.map(_.toSeq.map(q(_, 1e6))),
      model.eigvals.toSeq.map(ev =>
        if (ev > 0) q(1.0 / math.sqrt(ev), 1e3) else 0L))
  }

  /** ENGINE-PORTABLE projection: one row per (id, component) with the
    * integer raw projection `praw = Σ qx·qc − const` (≈ 1e12 × the
    * float projection; |praw| ≤ dim·(coord·1e6)·1e6 — int64 at any
    * realistic embedding range) and the whitened coordinate
    * `wq = praw·qinv` (≈ 1e15 × the whitened float) carried as a
    * decimal(38,0) STRING — the product can pass int64 when λ is
    * tiny, and emitting the decimal as text sidesteps the
    * HUGEINT→float64 pandas widening that cost C56 two rounds.
    * Map-only, rules broadcast as literals; quantization is the MMR
    * recipe (`round(x·1e6)` per coordinate), so the mirror's DuckDB
    * twin recomputes bit-for-bit. */
  def projectPortable(df: DataFrame, idCol: String, vecCol: String,
                      rules: PortableRules): DataFrame = {
    require(rules.qcomps.nonEmpty, "need at least one component")
    val qx = transform(col(vecCol),
      x => round(x.cast("double") * 1e6, 0).cast("long"))
    val prawCols: Seq[Column] = rules.qcomps.zip(rules.consts).map {
      case (comp, cst) =>
        aggregate(zip_with(qx, typedLit(comp),
            (a, b) => coalesce(a * b, lit(0L))),
          lit(0L), (s, x) => s + x) - lit(cst)
    }
    val qinvLit = typedLit(rules.qinvsd)
    df.select(col(idCol), posexplode(array(prawCols: _*)).as(Seq("comp", "praw")))
      .select(col(idCol), col("comp").cast("long").as("comp"), col("praw"),
        (col("praw").cast("decimal(38,0)") *
          element_at(qinvLit, col("comp").cast("int") + 1)
            .cast("decimal(38,0)"))
          .cast("string").as("wq"))
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: returns
    * (eigenvalues, eigenvectors-as-COLUMNS), unsorted. Deterministic:
    * fixed (p,q) sweep order, fixed sweep budget with an off-diagonal
    * convergence exit. Driver-side by design — the input is the
    * model-sized d×d covariance, never data. */
  private[operators] def jacobiEigen(aIn: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = Array.tabulate(d, d)((i, j) => aIn(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < 64 && off > 1e-14) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            // 2x2 symmetric Schur rotation (Golub & Van Loan 8.4)
            val tau = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(tau) match {
              case 0.0 => 1.0 / (tau + math.sqrt(1.0 + tau * tau))
              case s   => s / (math.abs(tau) + math.sqrt(1.0 + tau * tau))
            }
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) {
        if (i != j) s += a(i)(j) * a(i)(j); j += 1
      }
      i += 1
    }
    math.sqrt(s)
  }
}
