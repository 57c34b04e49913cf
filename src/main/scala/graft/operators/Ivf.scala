package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.VectorFunctions._

/** IVF (inverted-file) approximate nearest neighbor over an embedding
  * column — the coarse-quantizer scale path complementing the LSH one
  * (SURVEY.md §2 C6).
  *
  * The index build ([[fit]]) and the probe ([[IvfIndex.topK]]) are
  * separate steps, mirroring production IVF systems: the build is an
  * offline batch job (k-means over the corpus, then one assignment
  * pass); queries only touch the `nprobe` cells nearest to the query
  * vector. At 100 TB the assigned corpus is written bucketed /
  * partitioned by `centroid_id` ([[IvfIndex.writeBucketed]]) so a probe
  * prunes file groups before any IO — the query plan contains no
  * k-means jobs and no full-corpus scan.
  *
  * The coarse quantizer is Lloyd's k-means expressed as DataFrame
  * programs: assignment is a broadcast join against the centroid
  * table with a `max_by` argmax (scored by the codegen'd
  * `graft_cosine`; the plan is k-independent, so production cell
  * counts of 10⁴+ don't explode it), the update step is posexplode +
  * groupBy (cid, dim) mean — both linear, both shuffle-light. k
  * centroids live on the driver between iterations (k × dim doubles —
  * trivially small).
  */
object Ivf {

  /** A fitted IVF index: driver-side centroids + the corpus with its
    * cell assignment (`idCol`, `v`, `centroid_id`), cached so probes
    * never recompute assignments. */
  final case class IvfIndex(centroids: Seq[Array[Double]], assigned: DataFrame,
                            idCol: String) {

    /** Top-k by cosine against the vector with id `queryId`, searching
      * only the `nprobe` cells nearest to the query. The only driver
      * work is one single-row lookup of the query vector and a k ×
      * nprobe centroid scan — no k-means, no corpus pass outside the
      * probed cells. */
    def topK(queryId: Long, k: Int, nprobe: Int): DataFrame = {
      val qv = Ann.queryVector(assigned, idCol, col("v"), queryId)
        .getOrElse { return Ann.emptyTopK(assigned, idCol) }
      val query = assigned.filter(col(idCol) === queryId)
        .select(col("v").as("qv")).limit(1)
      def cosineLocal(c: Array[Double]): Double = {
        val dot = c.zip(qv).map { case (a, b) => a * b }.sum
        val d = math.sqrt(c.map(x => x * x).sum) * math.sqrt(qv.map(x => x * x).sum)
        if (d == 0.0) 0.0 else dot / d
      }
      val probeCells = centroids.zipWithIndex
        .sortBy { case (c, _) => -cosineLocal(c) }
        .take(nprobe).map(_._2)
      assigned
        .filter(col("centroid_id").isin(probeCells.map(x => x: Any): _*))
        .filter(col(idCol) =!= queryId)
        .join(broadcast(query))
        .select(col(idCol), round(cosineNative(col("v"), col("qv")), 4).as("cosine"))
        .orderBy(col("cosine").desc, col(idCol))
        .limit(k)
    }

    /** Materializes the index for a 100 TB corpus: one directory per
      * cell (`partitionBy(centroid_id)`), so probes prune whole file
      * groups at planning time, plus the centroid table under
      * `_centroids` (underscore-prefixed → invisible to the corpus
      * read). [[Ivf.load]] restores the index in a different job —
      * the build/serve split as separate processes. */
    def writeBucketed(path: String): Unit = {
      assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)
      val spark = assigned.sparkSession
      import spark.implicits._
      centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }
        .toDF("centroid_id", "centroid")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$path/_centroids")
    }

    /** Incremental index append — the daily-delta path: assign the new
      * vectors to the EXISTING centroids (one broadcast-join pass over
      * the delta only; no k-means, no touch of the base corpus) and
      * serve the union. Returns a NEW index sharing this one's
      * centroids; the caller owns both caches (unpersist the old index
      * when its plans are retired). Probes over the merged index prune
      * cells exactly as before — the append changes cell CONTENTS,
      * never the cell geometry, which is what keeps it cheap.
      *
      * The frozen quantizer is the accuracy trade: recall degrades only
      * as far as the delta's distribution drifts from the fitted one.
      * Gauge it with [[meanAssignedCosine]] — when the delta's
      * assignment quality drops materially below the base corpus's,
      * schedule a refit ([[Ivf.fit]]); AccuracySpec pins recall within
      * ε of a full refit for an in-distribution 20% append. */
    def append(newVectors: DataFrame, vecCol: String): IvfIndex = {
      val delta = Ivf.assignCells(newVectors, idCol, vecCol, centroids)
      val merged = assigned.select(col(idCol), col("v"), col("centroid_id"))
        .unionByName(delta)
        .persist(StorageLevel.MEMORY_AND_DISK)
      IvfIndex(centroids, merged, idCol)
    }

    /** Quantizer-staleness gauge over any assigned relation (defaults
      * to this index's corpus): mean cosine of each vector to its
      * assigned centroid. Compare the delta's value (pass
      * `Ivf.assignCells(delta, …)`) against the base corpus's — a
      * materially lower delta mean says the frozen centroids no longer
      * describe the incoming data and a refit is due. One broadcast
      * join + one avg; no k-means. */
    def meanAssignedCosine(of: DataFrame = assigned): Double = {
      val spark = of.sparkSession
      import spark.implicits._
      val cdf = centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toDF("__cid", "__centroid")
      of.join(broadcast(cdf), col("centroid_id") === col("__cid"))
        .agg(avg(cosineNative(col("v"), col("__centroid"))))
        .head().getDouble(0)
    }

    def unpersist(): Unit = { assigned.unpersist(); () }
  }

  /** Assign vectors to a FROZEN centroid set — (idCol, v, centroid_id)
    * with `v` as double array. The shared primitive behind [[fit]]'s
    * one-time assignment and [[IvfIndex.append]]'s delta pass. */
  private[operators] def assignCells(emb: DataFrame, idCol: String,
                                     vecCol: String,
                                     centroids: Seq[Array[Double]]): DataFrame =
    withAssignment(
      emb.select(col(idCol), toDoubles(col(vecCol)).as("v")), idCol, "v",
      centroids)

  /** ENGINE-PORTABLE coarse quantizer — the frozen-centroid recipe
    * whose every comparison is an integer, so an independent engine
    * (the DuckDB oracle, a future reader) derives the IDENTICAL cell
    * partition:
    *
    *  - [[seedCentroids]] picks the `k` corpus vectors with the
    *    smallest `(md5(id), id)` — a deterministic seeded sample (the
    *    k-means‖ init step without the Lloyd iterations, whose float
    *    per-dim means are NOT portable: avg over shuffled partitions
    *    reorders the summation run to run). Coordinates quantize to
    *    1e-6 integers (the C81 recipe).
    *  - [[assignCellsPortable]] assigns by integer squared-L2 argmin:
    *    Σ(qx−qc)² per (vector, centroid) — |q| ≤ ~4e6 per dim keeps
    *    the 64-dim sum < 1e16, inside int64 — ties to the lowest
    *    cell id. No float enters any comparison.
    *
    * The Lloyd-refined [[fit]]/[[fitCentroids]] path remains the
    * quality quantizer (tighter cells after 3 iterations); this is
    * the REPRODUCIBILITY configuration — cross-engine gates, audits,
    * and any pipeline whose sample/report must replay bit-identically
    * months later on different infrastructure. */
  def seedCentroids(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    emb
      .select(col(idCol),
        transform(toDoubles(col(vecCol)),
          x => round(x * 1e6, 0).cast("bigint")).as("qc"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(k)
      // window over the k-row post-limit relation only (never the corpus)
      .withColumn("__cid", (row_number().over(w) - 1).cast("int"))
      .select(col("__cid"), col("qc"))
  }

  /** Integer-exact cell assignment against a [[seedCentroids]]-shaped
    * relation `(cid, qc)`: returns (idCol, qv, centroid_id). Same
    * broadcast-join + partial-agg shape as the float path — the
    * shuffle carries one row per vector, not k. */
  def assignCellsPortable(emb: DataFrame, idCol: String, vecCol: String,
                          seedCents: DataFrame): DataFrame = {
    val qv = transform(toDoubles(col(vecCol)),
      x => round(x * 1e6, 0).cast("bigint"))
    val d2 = aggregate(
      zip_with(col("qv"), col("qc"), (x, c) => (x - c) * (x - c)),
      lit(0L), (acc, z) => acc + z)
    emb.select(col(idCol), qv.as("qv"))
      .crossJoin(broadcast(seedCents))
      .groupBy(col(idCol))
      .agg(
        min_by(col("__cid"), struct(d2.as("d2"), col("__cid").as("tie")))
          .cast("int").as("centroid_id"),
        first(col("qv")).as("qv"))
      .select(col(idCol), col("qv"), col("centroid_id"))
  }

  /** An ENGINE-PORTABLE IVF index ([[fitPortable]]): seeded integer
    * cells + the cached integer assignment. Probes rank cells by
    * INTEGER squared L2 of the 1e-6-quantized query (ties to the
    * lowest cell) and re-rank the probed cells' vectors by the
    * C5-proven round4 exact cosine — every candidate decision an
    * integer, so an independent engine derives the identical top-k.
    * The Lloyd-refined [[IvfIndex]] stays the quality/recall path. */
  final case class PortableIvfIndex(cells: Seq[Array[Long]],
                                    assigned: DataFrame, emb: DataFrame,
                                    idCol: String, vecCol: String) {

    def topK(queryId: Long, k: Int, nprobe: Int): DataFrame = {
      val qRaw = Ann.queryVector(emb, idCol, toDoubles(col(vecCol)), queryId)
        .getOrElse { return Ann.emptyTopK(emb, idCol) }
      // the query's integers come from the PLAN's round (HALF_UP),
      // never JVM math.round — the Pq portable stance
      val qq = emb.filter(col(idCol) === queryId)
        .select(transform(toDoubles(col(vecCol)),
          x => round(x * 1e6, 0).cast("bigint")))
        .limit(1).collect().head.getSeq[Long](0).toArray
      val probed = cells.zipWithIndex.map { case (c, ci) =>
        // fail loudly on a query/cell dim mismatch — a silent shared-
        // prefix score would probe plausibly-wrong cells with no signal
        require(c.length == qq.length,
          s"query dim ${qq.length} != cell dim ${c.length} (cell $ci)")
        var s = 0L
        var i = 0
        while (i < c.length) {
          val d = qq(i) - c(i); s += d * d; i += 1
        }
        (s, ci)
      }.sorted.take(math.max(1, nprobe)).map(_._2)
      assigned
        .filter(col("centroid_id").isin(probed.map(x => x: Any): _*) &&
          col(idCol) =!= queryId)
        .join(emb.select(col(idCol), col(vecCol)), Seq(idCol))
        .select(col(idCol),
          round(cosineNative(toDoubles(col(vecCol)), typedLit(qRaw.toSeq)), 4)
            .as("cosine"))
        .orderBy(col("cosine").desc, col(idCol))
        .limit(k)
    }

    /** C97 — incremental delta admission: assign ONLY the new vectors
      * to the FROZEN seeded cells and serve from the union — the
      * C58/C83 never-rebuild stance applied to ANN index maintenance.
      * Seeds are a property of the base corpus (smallest-(md5, id)
      * vectors), so admitting a delta re-reads nothing: the work is
      * |delta| integer-L2 assignments against the model-sized cell
      * literal, exactly what a production IVF system does on its
      * daily vector arrivals (FAISS `add` semantics — centroids
      * frozen until the next scheduled re-train). The delta
      * assignment is NOT cached here: a serve recomputes delta-sized
      * work per probe, the intended offline/online split (cache the
      * admitted index yourself for repeated serving).
      *
      * The base assignment, cells and tie rules are untouched, so
      * every pre-delta candidate decision is bit-identical — only new
      * ids can enter a probe's candidate set. */
    def admitDelta(delta: DataFrame): PortableIvfIndex = {
      val spark = delta.sparkSession
      import spark.implicits._
      // guard EVERY delta row, not a sampled one: a mixed-dim delta
      // would zip_with-pad to NULL distances and silently land in an
      // arbitrary cell. One delta-sized aggregate — the delta is the
      // small side by definition, so this costs what one more probe
      // costs. NULL vectors are raggedness too (size(NULL) aggregates
      // to nothing, so min==max would pass on a null-only delta —
      // count them explicitly).
      val szCol = org.apache.spark.sql.functions.size(col(vecCol))
      val dims = delta.agg(
        org.apache.spark.sql.functions.min(szCol),
        org.apache.spark.sql.functions.max(szCol),
        coalesce(org.apache.spark.sql.functions.sum(
          when(col(vecCol).isNull, 1L).otherwise(0L)), lit(0L)),
        org.apache.spark.sql.functions.count(col(idCol)),
        org.apache.spark.sql.functions.count_distinct(col(idCol)),
        coalesce(org.apache.spark.sql.functions.sum(
          when(col(idCol).isNull, 1L).otherwise(0L)), lit(0L))).collect().head
      require(dims.getLong(2) == 0L,
        s"delta has ${dims.getLong(2)} NULL $vecCol rows")
      // NULL ids first: count() and count_distinct() both SKIP nulls,
      // so a delta carrying several NULL-id rows would pass the
      // duplicate check below yet land indistinguishable candidates
      require(dims.getLong(5) == 0L,
        s"delta has ${dims.getLong(5)} NULL $idCol rows")
      // a delta carrying the same id twice would be admitted and appear
      // twice in a probe's candidate set silently — the same failure
      // mode as base/delta overlap, guarded in the same aggregate pass
      require(dims.getLong(3) == dims.getLong(4),
        s"delta carries duplicate $idCol values: ${dims.getLong(3)} rows, " +
          s"${dims.getLong(4)} distinct ids")
      if (!dims.isNullAt(0)) {
        val (lo, hi) = (dims.getInt(0), dims.getInt(1))
        require(cells.isEmpty || (lo == hi && lo == cells.head.length),
          s"delta dims [$lo, $hi] != index dim ${cells.head.length}")
      }
      // id disjointness guard: a delta row whose id already exists in
      // the base would be unioned into BOTH assigned and emb and
      // appear twice in a probe's candidate set — silently. One
      // broadcast-hash probe of the (cached) base assignment against
      // the delta ids; the base side is the cached index relation, so
      // this costs one cached scan, not a shuffle. Callers that
      // guarantee disjointness upstream (id allocators, the md5-slice
      // split) pay only that probe.
      val dupIds = assigned
        .join(org.apache.spark.sql.functions.broadcast(
          delta.select(col(idCol))), Seq(idCol))
        .limit(5).select(col(idCol)).collect().map(_.get(0))
      require(dupIds.isEmpty,
        s"delta ids already present in the base index (first ${dupIds.length}): " +
          dupIds.mkString(", "))
      val seedDf = cells.zipWithIndex
        .map { case (qc, cid) => (cid, qc.toSeq) }.toDF("__cid", "qc")
      val deltaAssigned = assignCellsPortable(delta, idCol, vecCol, seedDf)
      copy(
        assigned = assigned.unionByName(deltaAssigned),
        emb = emb.unionByName(delta.select(emb.columns.map(col).toSeq: _*)))
    }

    def unpersist(): Unit = { assigned.unpersist(); () }
  }

  /** Build the portable index: seed cells, assign once, cache — the
    * same offline/serve split as [[fit]], in the reproducibility
    * configuration. */
  def fitPortable(emb: DataFrame, idCol: String, vecCol: String,
                  numCells: Int): PortableIvfIndex = {
    val seedDf = seedCentroids(emb, idCol, vecCol, numCells)
    val cells = seedDf.orderBy("__cid").collect()
      .map(_.getSeq[Long](1).toArray).toSeq
    val assigned = assignCellsPortable(emb, idCol, vecCol, seedDf)
      .persist(StorageLevel.MEMORY_AND_DISK)
    assigned.count()
    PortableIvfIndex(cells, assigned, emb, idCol, vecCol)
  }

  /** C86 — the ANN screen operating curve (the C78 "measure the screen
    * before it gates 100 TB" stance applied to embeddings): recall@k
    * of the portable IVF probe vs the exact round4-cosine truth, one
    * row per probe width. The number that answers "is nprobe = 4
    * losing real neighbors on MY corpus?" before an index serves
    * production traffic.
    *
    * Probe points are the `numQueries` corpus vectors with the
    * smallest `(md5(id), id)` — the deterministic seed draw, so the
    * curve reproduces anywhere. Fully DISTRIBUTED multi-query: probe
    * ranking, exact truth and the candidate check are all relations
    * (queries × cells broadcast, truth via one windowed rank per
    * query — WindowGroupLimit-able), no per-query driver loop, so the
    * harness itself scales to thousands of probe points. Every recall
    * decision is an integer (quantized-L2 cell ranks, round4-tied
    * truth ranks), so the whole curve SQL-oracles.
    *
    * Output: (nprobe, n_queries, truth_rows, hits, recall) —
    * `hits` = truth neighbors whose cell falls inside the probe set,
    * `recall` = hits / truth_rows rounded to 4. */
  def probeRecallCurve(emb: DataFrame, idCol: String, vecCol: String,
                       numCells: Int = 16, k: Int = 20,
                       nprobes: Seq[Int] = Seq(1, 2, 4, 8),
                       numQueries: Int = 8): DataFrame = {
    require(nprobes.nonEmpty && nprobes.forall(_ >= 1), "nprobes must be >= 1")
    require(numQueries >= 1 && k >= 1, "numQueries and k must be >= 1")
    val spark = emb.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val seedDf = seedCentroids(emb, idCol, vecCol, numCells)
    val assigned = assignCellsPortable(emb, idCol, vecCol, seedDf)
      .select(col(idCol), col("centroid_id").as("cell"))
    val queries = emb
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(numQueries)
      .select(col(idCol).as("qid"), toDoubles(col(vecCol)).as("qv_raw"),
        transform(toDoubles(col(vecCol)),
          x => round(x * 1e6, 0).cast("bigint")).as("qq"))
      .localCheckpoint() // read 2× (cell ranks + truth); tiny by construction
    // query × cell integer-L2 rank: numQueries·numCells rows — model-sized
    val cellRank = queries.crossJoin(broadcast(seedDf))
      .select(col("qid"), col("__cid").as("cell"),
        aggregate(zip_with(col("qq"), col("qc"), (a, b) => (a - b) * (a - b)),
          lit(0L), (s, x) => s + x).as("d2"))
      .withColumn("cell_rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("d2"), col("cell"))))
      .select(col("qid"), col("cell"), col("cell_rank"))
    // exact truth: one rank window per query over the broadcast-scored
    // corpus — rank <= k pushes as a group limit, no query ever sorts
    // the corpus
    val truth = emb.select(col(idCol), toDoubles(col(vecCol)).as("v"))
      .crossJoin(broadcast(queries.select(col("qid"), col("qv_raw"))))
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol),
        round(cosineNative(col("v"), col("qv_raw")), 4).as("cosine"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cosine").desc, col(idCol))))
      .filter(col("rk") <= k)
    val truthCells = truth
      .join(assigned, Seq(idCol))
      .join(cellRank, Seq("qid", "cell"))
    nprobes.toDF("nprobe").crossJoin(truthCells)
      .groupBy(col("nprobe"))
      .agg(
        countDistinct(col("qid")).cast("bigint").as("n_queries"),
        count(lit(1)).cast("bigint").as("truth_rows"),
        sum(when(col("cell_rank") <= col("nprobe"), 1L).otherwise(0L))
          .as("hits"))
      .withColumn("recall", graft.functions.TextFunctions.round4(
        col("hits").cast("double") / col("truth_rows")))
  }

  /** Restores a bucketed index written by [[IvfIndex.writeBucketed]].
    * The corpus read keeps `centroid_id` as a directory-partition
    * column, so `topK`'s `isin(probeCells)` filter prunes whole cell
    * directories before any IO. */
  def load(spark: SparkSession, path: String, idCol: String): IvfIndex = {
    val centroids = spark.read.parquet(s"$path/_centroids")
      .orderBy("centroid_id").collect()
      .map(r => r.getSeq[Double](1).toArray).toSeq
    IvfIndex(centroids, spark.read.parquet(path), idCol)
  }

  /** Offline index build: fit the coarse quantizer, assign every vector
    * to its cell once, cache the assignment. */
  def fit(emb: DataFrame, idCol: String, vecCol: String, numCentroids: Int,
          iters: Int = 3, seed: Long = 42L): IvfIndex = {
    val centroids = fitCentroids(emb, idCol, vecCol, numCentroids, iters, seed)
    val assigned = withAssignment(
      emb.select(col(idCol), toDoubles(col(vecCol)).as("v")), idCol, "v", centroids)
      .persist(StorageLevel.MEMORY_AND_DISK)
    IvfIndex(centroids, assigned, idCol)
  }

  /** Centroids after `iters` Lloyd iterations, as driver-side arrays.
    * Initialization is a deterministic hash-ordered sample. `metric`
    * picks the assignment score — `"cosine"` (the IVF cells, where the
    * serve path also scores by cosine) or `"l2"` (squared euclidean —
    * what [[Pq]] needs: its subvectors are slices of normalized
    * vectors, NOT themselves normalized, and its ADC serve incurs
    * L2/dot distortion, so fitting under cosine would train for a
    * different partition than encode uses). */
  def fitCentroids(emb: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int = 5, seed: Long = 42L,
                   metric: String = "cosine"): Seq[Array[Double]] = {
    val base = emb.select(col(idCol).as("id"), toDoubles(col(vecCol)).as("v"))
    var centroids: Seq[Array[Double]] = base
      .orderBy(xxhash64(col("id"), lit(seed)))
      .limit(k)
      .collect().map(_.getSeq[Double](1).toArray).toSeq
    for (_ <- 0 until iters) {
      val assigned = withAssignment(base, "id", "v", centroids, metric)
      val updated = assigned
        .select(col("centroid_id"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("centroid_id", "dim")
        .agg(avg("x").as("m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dims"))
        .select(col("centroid_id"),
          transform(col("dims"), d => d.getField("m")).as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      // empty cells keep their previous centroid
      centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i)))
    }
    centroids
  }

  /** Adds `centroid_id` = argmax cosine, via a broadcast join against
    * the centroid table + `max_by`: the plan stays k-INDEPENDENT, so
    * k = 4096+ cells (what a real 100 TB IVF needs) work where k
    * centroid-array literals would explode the plan itself. Ties break
    * to the lowest centroid id (deterministic). The k-way expansion is
    * collapsed map-side by partial aggregation — the shuffle carries
    * one row per vector, not k. */
  private def withAssignment(df: DataFrame, idCol: String, vCol: String,
                             centroids: Seq[Array[Double]],
                             metric: String = "cosine"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cdf = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("__cid", "__centroid")
    // both metrics expressed as an argMAX score so the same max_by
    // tie-break (lowest centroid id) applies: cosine as-is, l2 as the
    // negated squared distance
    val score = metric match {
      case "cosine" => cosineNative(col(vCol), col("__centroid"))
      case "l2" => -aggregate(zip_with(col(vCol), col("__centroid"),
        (x, y) => (x - y) * (x - y)), lit(0.0), (acc, z) => acc + z)
      case other => throw new IllegalArgumentException(
        s"unknown metric '$other' (expected cosine or l2)")
    }
    df.crossJoin(broadcast(cdf))
      .groupBy(col(idCol))
      .agg(
        max_by(col("__cid"), struct(
          score.as("sim"),
          (-col("__cid")).as("tie"))).cast("int").as("centroid_id"),
        first(col(vCol)).as(vCol))
      .select(col(idCol), col(vCol), col("centroid_id"))
  }

  /** Fit-and-probe convenience for small/ad-hoc inputs (specs, demos).
    * Production callers hold an [[IvfIndex]] from [[fit]] instead —
    * this builds a throwaway index per call. */
  def topK(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
           queryId: Long, k: Int, numCentroids: Int = 16, nprobe: Int = 4,
           iters: Int = 3, seed: Long = 42L): DataFrame = {
    val index = fit(emb, idCol, vecCol, numCentroids, iters, seed)
    val result = index.topK(queryId, k, nprobe)
    // the probe is fully planned; drop the cache pin for throwaway use
    index.unpersist()
    result
  }
}
