package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for large text corpora (SURVEY.md §2 C1–C4).
  *
  * Scale design (100 TB): nothing here ever joins raw text against raw
  * text. Exact dedup groups on a 128-bit content hash; near-dup
  * candidate generation shuffles on high-cardinality band-hash keys
  * (MinHash-LSH) so data distributes evenly and only within-bucket
  * pairs are materialized — no all-pairs (cartesian) stage anywhere.
  */
object Dedup {

  /** Guards [[contaminationHitsBloom]]'s session-conf set/restore. */
  private val bloomConfLock = new Object

  /** C1 — exact dedup: one survivor (min id) per distinct content hash.
    * Grouping on md5(text) rather than the text itself keeps shuffle
    * rows small at scale; md5 collisions are negligible at 2^64 docs. */
  def exactDedup(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Distinct (id, gram) pairs from word `n`-grams — the shared shingle
    * relation used by MinHash, Jaccard and contamination screening.
    *
    * MAP-ONLY: the token array is projected to a plain attribute
    * first, so the gram lambda captures only attribute references —
    * safe under Catalyst's per-element re-evaluation of captured
    * computed expressions (capturing `split(text)` directly would
    * re-split the text once per gram — quadratic; capturing the
    * projected attribute costs nothing). Each gram is a 3-element
    * slice + concat, O(tokens·n) per document and NO shuffle — the
    * earlier posexplode+lead-window shape paid a full
    * repartition-by-id for what is a purely local computation.
    *
    * `dedupGrams = false` skips the distinct shuffle for consumers
    * whose aggregate is idempotent over duplicates (MinHash's min). */
  def shingles(docs: DataFrame, textCol: String, idCol: String, n: Int = 3,
               dedupGrams: Boolean = true): DataFrame = {
    // dedupGrams is a PER-DOCUMENT dedup (the distinct key was
    // (id, gram)), so it computes MAP-SIDE via array_distinct on the
    // doc's own gram array — the old global distinct() paid a full
    // exchange of the gram relation for per-row arithmetic (r20,
    // guide §2.4). Both variants stay a single collapsed generate
    // (child is an expression referenced once, so
    // InferFiltersFromGenerate does not re-evaluate the gram pipeline
    // in a scan filter — see ngramJaccardPairs for the trap).
    val grams =
      when(size(col("toks")) >= n,
        transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", slice(col("toks"), i + lit(1), lit(n)))))
        .otherwise(expr("CAST(array() AS array<string>)"))
    docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        explode(if (dedupGrams) array_distinct(grams) else grams).as("gram"))
  }

  /** C2 — MinHash signatures: `numHashes` independent min-hashes per
    * document. Hash family i is xxhash64 salted with the function index
    * (single shuffle: one groupBy over the exploded shingle relation,
    * all mins computed map-side first).
    *
    * `portableHash = true` swaps the family for ONE md5 per gram with
    * 32 independent multiply-mod derivations over the digest's four
    * 32-bit words: `hash_i = (a_i·x1 + b_i·x2 + c_i·x3 + d_i·x4) mod
    * (2^31 − 1)` (the [[MinhashPortableP]] Mersenne prime — see its
    * doc for why a near-2^62 modulus was rejected) with per-function
    * random 28-bit coefficients
    * ([[minhashPortableCoef]]), so every product stays < 2^60 and the
    * sum < 2^62 — no signed overflow in ANY engine. This is the C3
    * recipe that makes the signature ENGINE-PORTABLE: md5 is
    * identical everywhere and the derivation is plain positive-long
    * arithmetic, so an independent SQL engine recomputes the exact
    * mins and the banded pairs become hash-oracle-checkable. The
    * coefficients must be INDEPENDENT per function — the cheaper
    * `(h1 + i·h2) mod p` family was measured to correlate argmins
    * across functions (whole bands agree when two docs share one
    * low-hash gram: 15,189 candidates at sf0.1 vs 256 for xxhash64 —
    * a 59× false-candidate blowup this family removes). xxhash64
    * stays the default: one codegen'd op per (function, gram) with no
    * hex render/parse. */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
                        numHashes: Int = 32, ngram: Int = 3,
                        portableHash: Boolean = false): DataFrame = {
    // min() is idempotent over duplicate grams → skip the dedup
    // (r20 counter-example: per-doc array_distinct before hashing
    // measured NEUTRAL-to-worse in-JVM — this corpus has ~0.1%
    // within-doc duplicate grams, so the saved hash work is nil and
    // the distinct pass is pure cost)
    val grams = shingles(docs, textCol, idCol, ngram, dedupGrams = false)
    if (portableHash) {
      // The digest words MUST be projected to attributes before the
      // aggregate: referenced as expressions inside the 32 min()s,
      // each conv(substring(..)) re-evaluates once per function — 128
      // hex parses per row instead of 4 (measured 6.6 s → the
      // xxhash64 path's ballpark at sf0.1 after hoisting; the mixes
      // themselves are plain long arithmetic).
      val xs = (0 until 4).map(k =>
        conv(substring(col("g128"), 1 + 8 * k, 8), 16, 10)
          .cast("long").as(s"x$k"))
      val mins = (0 until numHashes).map { i =>
        val mix = (0 until 4).map(k =>
          lit(minhashPortableCoef(i, k)) * col(s"x$k")).reduce(_ + _)
        min(mix % lit(MinhashPortableP)).as(s"mh_$i")
      }
      grams
        .withColumn("g128", md5(col("gram")))
        .select(col(idCol) +: xs: _*)
        .groupBy(col(idCol))
        .agg(mins.head, mins.tail: _*)
    } else {
      val mins = (0 until numHashes).map(i =>
        min(xxhash64(concat(lit(s"mh$i|"), col("gram")))).as(s"mh_$i"))
      grams.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
    }
  }

  /** Modulus of the portable minhash family: the Mersenne prime
    * 2^31 − 1 — shared with the generated DuckDB oracle. The modulus
    * must be MUCH smaller than the pre-mod sum (< 2^62) so the form
    * wraps ~2^31 times: with a near-2^62 modulus the form is almost
    * monotone in the md5 words and the gram with the smallest digest
    * becomes every function's argmin (measured: 9× candidate
    * inflation at sf0.1 with 2^61−1 vs this). 31-bit outputs keep
    * per-gram-pair collision odds at 2^-31 — noise for min
    * statistics. */
  val MinhashPortableP: Long = (1L << 31) - 1

  /** Coefficient (function `i`, word `k`) of the portable family: the
    * first 28 bits of md5("mh-i-k"), computed HERE once so the Spark
    * plan and the generated DuckDB oracle interpolate the same
    * literals and can never drift. */
  def minhashPortableCoef(i: Int, k: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"mh-$i-$k".getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(4).map(b => f"$b%02x").mkString.take(7), 16)
  }

  /** All ordered pairs (a < b in array order) within one bucket's id
    * list, as an array of `{a, b}` structs. `xs` MUST be an attribute
    * reference (project computed expressions — e.g. an `array_sort` —
    * to a column FIRST): a computed expression captured inside these
    * nested lambdas is re-evaluated once per outer element, turning an
    * O(m²) expansion into O(m² log m) re-sorts — the per-element
    * re-evaluation trap documented on [[shingles]]. */
  private def pairsWithin(xs: Column): Column =
    flatten(transform(xs, (a, i) =>
      transform(slice(xs, i + 2, size(xs)), b => struct(a.as("a"), b.as("b")))))

  /** C2 — LSH banding: candidate pairs sharing at least one band.
    * Signature is cut into `bands` bands of `numHashes/bands` rows; the
    * band hash is the shuffle key.
    *
    * Shape: ONE aggregation per band bucket (`collect_list` of ids),
    * pairs expanded bucket-locally — the signature relation is computed
    * once, vs twice for a bucket self-join, and the only shuffles are
    * the signature groupBy, the bucket groupBy and the final pair
    * distinct. Band-hash keys are high-cardinality (64-bit hash of r
    * mins) → even distribution at scale; buckets larger than
    * `maxBucket` are dropped, because a bucket of m ids expands to
    * m²/2 pairs — oversized buckets are exact-duplicate clusters that
    * [[exactDedup]] already handles for a fraction of the cost. */
  def minhashCandidatePairs(docs: DataFrame, textCol: String, idCol: String,
                            numHashes: Int = 32, bands: Int = 8,
                            ngram: Int = 3, maxBucket: Int = 4096,
                            portableHash: Boolean = false): DataFrame =
    minhashBuckets(docs, textCol, idCol, numHashes, bands, ngram, portableHash)
      .filter(size(col("ids")).between(2, maxBucket))
      .withColumn("ids", array_sort(col("ids"))) // plain attribute for pairsWithin
      .select(explode(pairsWithin(col("ids"))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()

  /** The band-bucket relation behind [[minhashCandidatePairs]]:
    * (band, bh, ids). */
  private def minhashBuckets(docs: DataFrame, textCol: String, idCol: String,
                             numHashes: Int, bands: Int, ngram: Int,
                             portableHash: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig =
      minhashSignatures(docs, textCol, idCol, numHashes, ngram, portableHash)
    val bandKeys = (0 until bands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(i => col(s"mh_$i"))
      // portable band key: md5 over the comma-joined decimal mins —
      // longs render identically in every SQL engine, so the bucket
      // assignment (not just the signature) is oracle-reproducible
      val bh =
        if (portableHash)
          conv(substring(md5(concat_ws(",", cols: _*)), 1, 15), 16, 10)
            .cast("long")
        else xxhash64(cols: _*)
      struct(lit(b).as("band"), bh.as("bh"))
    }
    sig
      .select(col(idCol), explode(array(bandKeys: _*)).as("bk"))
      .groupBy(col("bk.band").as("band"), col("bk.bh").as("bh"))
      .agg(collect_list(col(idCol)).as("ids"))
  }

  /** The band-bucket relation (band, bh, ids) as a PERSISTABLE index:
    * write it partitioned/bucketed by (band, bh) once per corpus
    * snapshot and feed it to [[incrementalMinhashPairs]] so daily
    * deltas dedup against 100 TB without recomputing the corpus. */
  def minhashBandBuckets(docs: DataFrame, textCol: String, idCol: String,
                         numHashes: Int = 32, bands: Int = 8,
                         ngram: Int = 3,
                         portableHash: Boolean = false): DataFrame =
    minhashBuckets(docs, textCol, idCol, numHashes, bands, ngram, portableHash)

  /** C2e — INCREMENTAL near-dup candidates: a new delta screened
    * against an existing corpus using the corpus's persisted
    * band-bucket index ([[minhashBandBuckets]] — same numHashes/bands/
    * ngram, or the band hashes will not line up). Emits delta↔delta
    * and delta↔corpus candidate pairs only — corpus↔corpus pairs are
    * already known from the index build, and at 100 TB re-deriving
    * them daily is the cost this operator exists to avoid. The join is
    * bucket-local on (band, bh) exactly like the batch path; buckets
    * whose combined size exceeds `maxBucket` are dropped (account via
    * the same dropped-bucket stance if the cap is live). Ids must be
    * LONG-typed (the empty-bucket coalesce is typed array<bigint> to
    * line up with a persisted index's schema).
    *
    * PLAN SHAPE (r19): with `broadcastDelta` (the default) the DELTA
    * buckets broadcast and the corpus index is PROBED map-side — the
    * index is never shuffled or sorted, so the per-screen cost is one
    * distributed scan of the index, the shape that survives an index
    * thousands of times the delta's size (the r19 soak measured the
    * old shuffled left join's sort+exchange of the whole index every
    * trigger). The probe runs as an inner join plus a delta-local
    * anti-join that re-creates the left join's semantics exactly
    * (within-delta pairs for unmatched buckets; a bucket whose every
    * row-local combined size blows the cap emits nothing) — the
    * hash-green gate pins the equivalence. Pass `broadcastDelta =
    * false` for deltas too large to broadcast (≳1M docs × bands rows):
    * it falls back to the shuffled join. */
  def incrementalMinhashPairs(corpusBuckets: DataFrame, docs: DataFrame,
                              textCol: String, idCol: String,
                              numHashes: Int = 32, bands: Int = 8,
                              ngram: Int = 3, maxBucket: Int = 4096,
                              portableHash: Boolean = false,
                              broadcastDelta: Boolean = true): DataFrame = {
    // the delta bucket relation is referenced twice on the broadcast
    // path (probe + unmatched anti-join) and its banding subtree is
    // the expensive part (md5 minhash + groupBy) — materialize it once
    // (delta-sized by construction) or the plan evaluates the whole
    // signature pipeline per reference (r19: the composed admission
    // plan carried 110 parquet scans before this cut).
    // CONTRACT NOTE (repo-wide for the eager localCheckpoint cuts,
    // here and in screenEval / hammingSetPairs / mineBitextSymmetric /
    // bitextMinedLadder): construction runs a job eagerly and the
    // checkpointed blocks carry no lineage — an executor loss
    // mid-query fails the query instead of recomputing. The accepted
    // trade for bounded (pair/probe-sized) intermediates; a 100 TB
    // deployment that needs fault tolerance here persists them as
    // tables instead.
    val deltaB =
      minhashBuckets(docs, textCol, idCol, numHashes, bands, ngram, portableHash)
        .withColumnRenamed("ids", "new_ids")
        .withColumn("new_ids", array_sort(col("new_ids")))
        .localCheckpoint()
    def emitPairs(rows: DataFrame, cross: Boolean): DataFrame = {
      val crossPairs = flatten(transform(col("new_ids"), a =>
        transform(col("old_ids"), b =>
          struct(least(a, b).as("a"), greatest(a, b).as("b")))))
      val exploded =
        if (cross) concat(pairsWithin(col("new_ids")), crossPairs)
        else pairsWithin(col("new_ids"))
      rows.select(explode(exploded).as("p"))
    }
    val pairs =
      if (broadcastDelta) {
        // inner probe: corpus streamed map-side against the broadcast
        // delta; output is delta-sized (≤ one row per index row that
        // matches a delta key)
        val probed = corpusBuckets.withColumnRenamed("ids", "old_ids")
          .join(broadcast(deltaB), Seq("band", "bh"))
        val matched = probed.filter(
          (size(col("new_ids")) + size(col("old_ids"))).between(2, maxBucket))
        // delta buckets with NO index match at all keep their
        // within-delta pairs under the delta-only cap (the left join's
        // coalesce-to-empty branch). Anti-join against ALL probed keys
        // — pre-cap — so a bucket whose every matched row failed the
        // cap stays dropped, exactly as the left join dropped it.
        // Both sides of this anti-join are delta-sized.
        val unmatched = deltaB
          .join(probed.select(col("band"), col("bh")).distinct(),
            Seq("band", "bh"), "left_anti")
          .filter(size(col("new_ids")).between(2, maxBucket))
        emitPairs(matched, cross = true)
          .unionByName(emitPairs(unmatched, cross = false))
      } else {
        val newOld = deltaB
          .join(corpusBuckets.withColumnRenamed("ids", "old_ids"),
            Seq("band", "bh"), "left")
          .withColumn("old_ids",
            coalesce(col("old_ids"), expr("CAST(array() AS array<bigint>)")))
          .filter((size(col("new_ids")) + size(col("old_ids")))
            .between(2, maxBucket))
        emitPairs(newOld, cross = true)
      }
    pairs
      // a re-run delta overlapping the index puts the same id on both
      // sides; the degenerate (x, x) pair would delete the doc as its
      // own near-duplicate downstream
      .filter(col("p.a") =!= col("p.b"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
  }

  /** Fold a STREAMING band-bucket index's accumulated parquet appends
    * into one compacted snapshot — the IdempotentSink.compactCommits
    * stance applied to the dedup index. [[graft.streaming
    * .CurationStream]] appends one small parquet file set per
    * micro-batch, so after N triggers every batch's index read
    * lists/opens O(N) files: per-trigger index-read cost grows
    * linearly with stream AGE, the one scale-killer in the streaming
    * curation story. This folds all current appends into `outFiles`
    * files, merging same-(band, bh) rows into one bucket row
    * (`array_distinct` — replay-duplicated ids collapse).
    *
    * Crash-safe by ORDERING alone, because the index is idempotent
    * under row duplication (duplicate bucket rows produce duplicate
    * candidate pairs, and [[incrementalMinhashPairs]] emits distinct
    * pairs — a replay can re-flag, never un-flag):
    *  1. snapshot the exact live file list;
    *  2. write the compacted rows under `_compact_tmp_*` (the
    *     underscore prefix hides it from every parquet reader, so a
    *     partial write is never visible);
    *  3. rename the finished parts into the live dir (atomic per
    *     file — a crash mid-way leaves originals + some compacted
    *     copies: duplicates, harmless);
    *  4. delete the snapshotted originals (partial deletion again
    *     means duplicates, never loss).
    * No cut point loses a bucket entry or exposes a partial file.
    * SINGLE-WRITER contract: run it from the stream's own
    * foreachBatch (between appends) or while the stream is down —
    * the same contract the index append itself already requires.
    *
    * Semantics note: merging makes the `maxBucket` cap in
    * [[incrementalMinhashPairs]] apply to the TRUE bucket size where
    * pre-compaction it applied per append row — the cap's intended
    * policy. Verdicts for buckets under the cap are identical.
    *
    * TIERED FOLD (r19): with `tierBytes > 0` files at or above that
    * size are treated as settled RUNS and left untouched — only the
    * small append tail folds. The r19 soak measured the full fold's
    * cost growing linearly with the index (it rewrites everything
    * every `compactEvery` batches — 4.9→7.8 s/compaction across 48
    * triggers); tiering bounds each fold to the tail bytes, LSM-style,
    * at the price of a slowly growing run count (≤ indexBytes /
    * tierBytes extra files for the screen to open — still bounded,
    * never stream-age-linear). Buckets split across runs keep the
    * per-row cap semantics appends had. Fold with `tierBytes = 0`
    * occasionally (or at maintenance) to merge the runs themselves.
    *
    * Returns the number of files folded (0 = nothing to do). */
  def compactBandBucketIndex(spark: org.apache.spark.sql.SparkSession,
                             indexDir: String, outFiles: Int = 4,
                             tierBytes: Long = 0L): Int = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(indexDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) return 0
    def isLive(n: String) =
      n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    // sweep tmp dirs crashed attempts left behind: each run only ever
    // deletes its OWN stamp's tmp dir on success, so a crash mid-write
    // would otherwise accumulate hidden garbage forever. Underscore
    // prefix means no reader can see them — deletion is always safe
    // under the single-writer contract this method already requires.
    fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith("_compact_tmp_"))
      .foreach(fs.delete(_, true))
    val originals = fs.listStatus(dir)
      .filter(s => isLive(s.getPath.getName))
      .filter(s => tierBytes <= 0L || s.getLen < tierBytes)
      .map(_.getPath)
    if (originals.length < 2) return 0
    val stamp = java.util.UUID.randomUUID.toString.take(8)
    val tmp = new Path(dir, s"_compact_tmp_$stamp")
    spark.read.parquet(originals.map(_.toString).toIndexedSeq: _*)
      .groupBy(col("band"), col("bh"))
      .agg(array_sort(array_distinct(flatten(collect_list(col("ids")))))
        .as("ids"))
      .coalesce(math.max(1, outFiles))
      .write.mode("overwrite").parquet(tmp.toString)
    val parts = fs.listStatus(tmp).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (p, i) =>
      val dst = new Path(dir, s"compact-$stamp-$i.parquet")
      require(fs.rename(p, dst), s"publish rename $p -> $dst failed")
    }
    originals.foreach(fs.delete(_, false))
    fs.delete(tmp, true)
    originals.length
  }

  /** Accounting for the `maxBucket` cap in [[minhashCandidatePairs]]:
    * one row per DROPPED bucket with (band, bh, bucket_size). The cap
    * is correct policy (an m-id bucket expands to m²/2 pairs, and
    * mega-buckets are exact-dup clusters [[exactDedup]] handles for a
    * fraction of the cost) but must not be invisible data loss — the
    * same quarantine-not-drop stance as FdrSource.loadWithQuarantine.
    * Count it, histogram `bucket_size`, or join `ids` back for replay. */
  def minhashDroppedBuckets(docs: DataFrame, textCol: String, idCol: String,
                            numHashes: Int = 32, bands: Int = 8,
                            ngram: Int = 3, maxBucket: Int = 4096,
                            portableHash: Boolean = false): DataFrame =
    minhashBuckets(docs, textCol, idCol, numHashes, bands, ngram, portableHash)
      .select(col("band"), col("bh"), size(col("ids")).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)

  /** C3 — 64-bit SimHash: per bit, sum +1/-1 votes of each distinct
    * token's hash bit, then pack the sign vector into a Long.
    * One shuffle (groupBy id); the 64 per-bit sums combine map-side.
    *
    * The 64 token-hash bits are the first 16 hex digits of md5 —
    * deliberately ENGINE-PORTABLE (md5 is identical everywhere, and
    * the two 32-bit halves parse as exact integers in any SQL
    * dialect), so the signature itself is oracle-checkable against an
    * independent engine rather than being hash-family-private the way
    * xxhash64 would make it. Ties (a zero vote sum) pack as bit 0 in
    * every engine. Bit 63 is added as Long.MinValue — the only power
    * of two that doesn't fit a signed 64-bit positive — which keeps
    * the packing pure integer arithmetic with no unsigned types. */
  def simhash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // LANE-PACKED vote aggregate (r20, guide §4 expression width): the
    // per-bit ±1 vote sum only needs each bit's ONES count o_k and the
    // doc's distinct-token count n (votes_k = 2·o_k − n, sign positive
    // iff 2·o_k > n — ties pack as bit 0 exactly as before). Bit k of
    // the 64-bit token hash accumulates in 22-bit lane (k div 22) of
    // packed sum s_(k mod 22): per token each addend is
    // (h >>> i) & (1 | 1<<22 | 1<<44) — ONE logical shift + ONE mask
    // (unsigned, so the phantom lane past bit 63 reads zero) — and the
    // aggregate carries 23 long slots instead of 64 slots with 3-op
    // inputs. A lane addend is 0/1, so a lane sum is ≤ n: no inter-
    // lane carry below 2^22 and no signed-long overflow in the TOP
    // lane (bits 44+) below 2^19. Docs beyond 524287 DISTINCT tokens
    // raise loudly (assert_true) instead of wrapping — widen the lanes
    // before raising that limit.
    val laneMask = 1L | (1L << 22) | (1L << 44)
    val tok = docs.select(col(idCol),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("tok"))
      // project the digest to an attribute so the two 32-bit halves
      // parse one md5, then fuse them into the full 64-bit hash
      .select(col(idCol), md5(col("tok")).as("g128"))
      .select(col(idCol),
        shiftleft(conv(substring(col("g128"), 1, 8), 16, 10).cast("long"), 32)
          .bitwiseOR(conv(substring(col("g128"), 9, 8), 16, 10).cast("long"))
          .as("h"))
    val sums = (0 until 22).map { i =>
      sum(shiftrightunsigned(col("h"), i).bitwiseAND(lit(laneMask))).as(s"s_$i")
    }
    // ones_k unpacks from lane (k div 22) of sum (k mod 22); the
    // ±1-vote sign test 2·ones_k > n reproduces the old per-bit sums'
    // v_k > 0 bit-for-bit (v_k = ones_k − (n − ones_k))
    def ones(k: Int): Column =
      shiftrightunsigned(col(s"s_${k % 22}"), 22 * (k / 22))
        .bitwiseAND(lit(0x3FFFFFL))
    val packed = (0 until 63)
      .map(k => when(ones(k) * 2 > col("__n"), shiftleft(lit(1L), k)).otherwise(0L))
      .reduce(_.bitwiseOR(_))
      .bitwiseOR(when(ones(63) * 2 > col("__n"), lit(Long.MinValue)).otherwise(0L))
    tok.groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"), sums: _*)
      .select(col(idCol),
        when(assert_true(col("__n") <= 524287L,
          concat(lit("simhash lane overflow: doc "), col(idCol).cast("string"),
            lit(" has "), col("__n").cast("string"),
            lit(" distinct tokens (max 524287)"))).isNull, packed)
          .as("simhash"))
  }

  /** C3b — near-dup pairs with simhash hamming distance ≤ `maxDist`,
    * by pigeonhole banding: the 64-bit signature splits into
    * `maxDist + 1` bands, and any pair within `maxDist` differing bits
    * must agree EXACTLY on at least one band — so candidates come from
    * a band-value equi-join (same one-aggregation bucket shape as
    * MinHash banding, never all-pairs) and the exact hamming filter
    * (`bit_count(xor)`) runs on candidates only.
    *
    * The banding is EXACT in signature space (AccuracySpec pins it
    * against a brute-force hamming scan). But signature distance is
    * NOT n-gram Jaccard: on template-generated text, token-DISTRIBUTION
    * look-alikes land within hamming 3 while true near-dups that swap
    * a few tokens flip more bits (measured at sf0.01: precision 0.004
    * / recall 0.16 vs the Jaccard≥0.5 oracle). When the dedup target
    * is Jaccard, use [[minhashCandidatePairs]] +
    * [[exactJaccardForPairs]]; use this for signature-space dedup. */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   maxDist: Int = 3, maxBucket: Int = 4096): DataFrame =
    hammingPairs(simhash(docs, textCol, idCol), idCol, "simhash",
      maxDist, maxBucket)

  /** GENERIC pigeonhole hamming-pair join over any (id, 64-bit
    * signature) relation — simhash text signatures, image average
    * hashes ([[graft.multimodal.Multimodal.imageHashes]]), any
    * fingerprint that measures similarity in bit flips. Same
    * guarantees as [[simhashPairs]]: exact in signature space,
    * band-bucket shuffle keys, never all-pairs. */
  def hammingPairs(sigs: DataFrame, idCol: String, sigCol: String,
                   maxDist: Int = 3, maxBucket: Int = 4096): DataFrame = {
    val hamming = bit_count(col("p.a.sh").bitwiseXOR(col("p.b.sh")))
    hammingBuckets(sigs, idCol, sigCol, maxDist)
      .filter(size(col("xs")).between(2, maxBucket))
      .withColumn("xs", array_sort(col("xs"))) // plain attribute for pairsWithin
      .select(explode(pairsWithin(col("xs"))).as("p"))
      .filter(hamming <= maxDist)
      .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
              hamming.cast("int").as("hamming"))
      .distinct()
  }

  /** The pigeonhole-band bucket relation behind [[hammingPairs]]:
    * (band, bh, xs) with xs = [{id, sh}]. */
  private def hammingBuckets(sigs: DataFrame, idCol: String, sigCol: String,
                             maxDist: Int): DataFrame = {
    require(maxDist >= 0 && 64 % (maxDist + 1) == 0,
      "maxDist+1 must divide 64 (e.g. 0, 1, 3, 7, 15)")
    val bands = maxDist + 1
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val bandKeys = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col(sigCol), b * width).bitwiseAND(mask).as("bh"))
    }
    sigs
      .select(col(idCol), col(sigCol), explode(array(bandKeys: _*)).as("bk"))
      .groupBy(col("bk.band").as("band"), col("bk.bh").as("bh"))
      .agg(collect_list(struct(col(idCol).as("id"), col(sigCol).as("sh"))).as("xs"))
  }

  /** Dropped-bucket accounting for [[simhashPairs]]'s `maxBucket` cap —
    * see [[minhashDroppedBuckets]]. */
  def simhashDroppedBuckets(docs: DataFrame, textCol: String, idCol: String,
                            maxDist: Int = 3, maxBucket: Int = 4096): DataFrame =
    hammingDroppedBuckets(simhash(docs, textCol, idCol), idCol, "simhash",
      maxDist, maxBucket)

  /** Dropped-bucket accounting for [[hammingPairs]]'s `maxBucket`. */
  def hammingDroppedBuckets(sigs: DataFrame, idCol: String, sigCol: String,
                            maxDist: Int = 3, maxBucket: Int = 4096): DataFrame =
    hammingBuckets(sigs, idCol, sigCol, maxDist)
      .select(col("band"), col("bh"), size(col("xs")).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)

  /** The persistable pigeonhole band-bucket index behind
    * [[hammingPairs]]: (band, bh, xs) with xs = [{id, sh}] — the
    * signature rides along so an incremental probe can run the exact
    * hamming verify without re-reading corpus text. Write this once
    * per corpus build; [[incrementalHammingPairs]] probes it. Same
    * maxDist as the probe, or the band keys will not line up. */
  def hammingBandBuckets(sigs: DataFrame, idCol: String, sigCol: String,
                         maxDist: Int = 3): DataFrame =
    hammingBuckets(sigs, idCol, sigCol, maxDist)

  /** C3c — INCREMENTAL signature-space near-dup pairs: a new delta of
    * (id, 64-bit signature) rows screened against an existing corpus
    * through the corpus's persisted band-bucket index
    * ([[hammingBandBuckets]]) — the [[incrementalMinhashPairs]] stance
    * applied to the hamming family (simhash text signatures, image
    * aHashes, any bit-flip fingerprint). Emits delta↔delta and
    * delta↔corpus pairs only; corpus↔corpus pairs are known from the
    * index build, and at 100 TB re-banding yesterday's corpus daily is
    * the cost this operator exists to avoid. Because the index carries
    * signatures, the exact `bit_count(xor)` verify runs bucket-locally
    * on candidates exactly like the batch path; bucket admission is on
    * the COMBINED (delta + corpus) size. A re-run delta overlapping
    * the index puts the same id on both sides — the degenerate (x, x)
    * pair is dropped, same as the minhash path. */
  def incrementalHammingPairs(corpusBuckets: DataFrame, sigs: DataFrame,
                              idCol: String, sigCol: String,
                              maxDist: Int = 3,
                              maxBucket: Int = 4096): DataFrame = {
    val joined = hammingBuckets(sigs, idCol, sigCol, maxDist)
      .withColumnRenamed("xs", "new_xs")
      .join(corpusBuckets.withColumnRenamed("xs", "old_xs"),
        Seq("band", "bh"), "left")
      .withColumn("old_xs", coalesce(col("old_xs"),
        expr("CAST(array() AS array<struct<id:bigint,sh:bigint>>)")))
      .filter((size(col("new_xs")) + size(col("old_xs")))
        .between(2, maxBucket))
      .withColumn("new_xs", array_sort(col("new_xs")))
    // cross pairs oriented by id so (a, b) lands in canonical order no
    // matter which side is the delta
    val crossPairs = flatten(transform(col("new_xs"), n =>
      transform(col("old_xs"), o =>
        struct(when(n("id") <= o("id"), n).otherwise(o).as("a"),
               when(n("id") <= o("id"), o).otherwise(n).as("b")))))
    val hamming = bit_count(col("p.a.sh").bitwiseXOR(col("p.b.sh")))
    joined
      .select(explode(concat(pairsWithin(col("new_xs")), crossPairs)).as("p"))
      .filter(col("p.a.id") =!= col("p.b.id") && hamming <= maxDist)
      .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
              hamming.cast("int").as("hamming"))
      .distinct()
  }

  /** [[incrementalHammingPairs]] specialized to C3 simhash text
    * signatures: build the delta's signatures with [[simhash]] and
    * probe a persisted [[hammingBandBuckets]] index built over the
    * corpus's [[simhash]] output. Ids must be LONG-typed to line up
    * with the persisted index schema. */
  def incrementalSimhashPairs(corpusBuckets: DataFrame, delta: DataFrame,
                              textCol: String, idCol: String,
                              maxDist: Int = 3,
                              maxBucket: Int = 4096): DataFrame =
    incrementalHammingPairs(corpusBuckets, simhash(delta, textCol, idCol),
      idCol, "simhash", maxDist, maxBucket)

  /** C83 — the composed DAILY-DELTA ADMISSION screen: one verdict per
    * delta document from the three incremental screens probing the
    * corpus's PERSISTED indexes, in strictness order —
    *
    *   - `exact_dup`: text md5 in `corpusExactIdx` (column `h`), or a
    *     smaller-id delta doc carries the same hash (the
    *     [[incrementalExactDedup]] survivors relation, inverted);
    *   - `near_dup`: an [[incrementalMinhashPairs]] candidate VERIFIED
    *     at n-gram Jaccard ≥ `jaccardThreshold` against the corpus or
    *     a smaller-id delta doc;
    *   - `signature_dup`: an [[incrementalSimhashPairs]] pair at
    *     hamming ≤ `maxDist` — the token-distribution look-alike
    *     screen that catches template clones Jaccard misses;
    *   - `new`: admitted.
    *
    * Admission is keep-smallest-id: candidate pairs orient
    * `id_a < id_b` and the LATER copy (`id_b`) is rejected, so callers
    * must assign delta ids above the corpus high-water mark (the
    * standard monotonic doc-id discipline) for "later" to mean "newer".
    *
    * Shape at 100 TB: three delta-sized index probes, never corpus
    * re-scans — the exact screen anti-joins the hash column, the two
    * signature screens are bucket-local band joins, and the Jaccard
    * verify reads text ONLY for pair-incident ids (`corpusTexts` is
    * semi-joined down to the candidate set before gram expansion, so
    * the verify is candidate-sized even though the full corpus text
    * relation is passed in). Screens run independently; the CASE
    * priority only orders the verdict label. */
  def deltaAdmission(corpusExactIdx: DataFrame, corpusMinhashIdx: DataFrame,
                     corpusSimhashIdx: DataFrame, corpusTexts: DataFrame,
                     delta: DataFrame, textCol: String, idCol: String,
                     jaccardThreshold: Double = 0.5,
                     numHashes: Int = 32, bands: Int = 8, ngram: Int = 3,
                     maxDist: Int = 3, maxBucket: Int = 4096,
                     portableHash: Boolean = false): DataFrame = {
    val survivors = incrementalExactDedup(corpusExactIdx, delta,
        textCol, idCol)
      .select(col(idCol), lit(1).as("surv"))
    // the candidate relation feeds pairIds (twice), the Jaccard verify
    // AND the verify-text semi-join below — without a cut the whole
    // incremental screen re-evaluates per reference (the r19 plan
    // audit counted the delta banding subtree ~7× in one plan).
    // Pair-sized by construction, so the materialization is bounded.
    val mhPairs = incrementalMinhashPairs(corpusMinhashIdx, delta,
      textCol, idCol, numHashes, bands, ngram, maxBucket, portableHash)
      .localCheckpoint()
    val pairIds = mhPairs.select(col("id_a").as(idCol))
      .union(mhPairs.select(col("id_b").as(idCol))).distinct()
    val verifyTexts = corpusTexts.select(col(idCol), col(textCol))
      .unionByName(delta.select(col(idCol), col(textCol)))
      .join(pairIds, Seq(idCol), "left_semi")
    val nearDup = exactJaccardForPairs(verifyTexts, textCol, idCol,
        mhPairs, ngram)
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_b").as(idCol)).distinct()
      .withColumn("near", lit(1))
    val sigDup = incrementalSimhashPairs(corpusSimhashIdx, delta,
        textCol, idCol, maxDist, maxBucket)
      .select(col("id_b").as(idCol)).distinct()
      .withColumn("sig", lit(1))
    delta.select(col(idCol))
      .join(survivors, Seq(idCol), "left")
      .join(nearDup, Seq(idCol), "left")
      .join(sigDup, Seq(idCol), "left")
      .select(col(idCol),
        when(col("surv").isNull, lit("exact_dup"))
          .when(col("near") === 1, lit("near_dup"))
          .when(col("sig") === 1, lit("signature_dup"))
          .otherwise(lit("new")).as("verdict"))
  }

  /** C68 — near-dup pairs between SETS of 64-bit perceptual hashes
    * (e.g. a video's sampled-frame aHashes,
    * [[graft.multimodal.Multimodal.videoHashes]]): candidates come
    * from per-ELEMENT pigeonhole banding — two sets sharing ANY
    * element within hamming `maxDist` collide on ≥1 band key, the
    * [[hammingPairs]] guarantee applied per element — then each
    * candidate pair is verified pair-locally by CONTAINMENT: the
    * fraction of one side's hashes lying within `maxDist` of SOME hash
    * of the other. `overlap` is the max of the two directions, which
    * makes the relation trim-robust: a clipped copy still contains
    * ~all of its own frames in the original while the reverse fraction
    * shrinks with the clip. Output `(id_a, id_b, overlap)` rows with
    * overlap ≥ `minOverlap`; a band collision between genuinely
    * different sets dies in the verify (the band key matches 16 bits,
    * the verify checks all 64).
    *
    * Scale shape: the candidate stage is a posting join on (band, bh)
    * — Σ|bucket|², never |videos|² — with buckets > `maxBucket`
    * dropped ([[hammingSetDroppedBuckets]] accounts, the C2/C4
    * stance). The verify joins each side's hash ARRAY back by id: row
    * width is bounded by the caller's frame sampling (stride), and the
    * containment double loop is a codegen'd HOF over
    * |a|·|b| ≤ (frames/stride)² longs — constant per pair,
    * data-independent. */
  def hammingSetPairs(sigs: DataFrame, idCol: String, sigsCol: String,
                      maxDist: Int = 3, minOverlap: Double = 0.5,
                      maxBucket: Int = 4096): DataFrame = {
    // the signature relation feeds the bucket stage AND both verify
    // joins; for media callers it sits on top of a decode pipeline, so
    // without a cut every reference re-decodes the corpus (r19 plan
    // audit: 3 evaluations per q_mm_video_dups plan). Hash-set-sized
    // rows (≤ frames/stride longs per id), bounded materialization —
    // the lshCosinePairs stance.
    val sig0 = sigs.select(col(idCol), col(sigsCol)).localCheckpoint()
    val cands = hammingSetBuckets(sig0, idCol, sigsCol, maxDist)
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(pairsWithin(col("ids"))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
    val hs = sig0.select(col(idCol).as("id"), col(sigsCol).as("hs"))
    // containment of x in y: fraction of x's hashes within maxDist of
    // some y hash (empty x ⇒ 0.0 — an undecoded side never pairs)
    def contain(x: Column, y: Column): Column =
      when(size(x) === 0, lit(0.0)).otherwise(
        size(filter(x, a =>
          exists(y, b => bit_count(a.bitwiseXOR(b)) <= maxDist)))
          .cast("double") / size(x))
    cands
      .join(hs.select(col("id").as("id_a"), col("hs").as("ha")), Seq("id_a"))
      .join(hs.select(col("id").as("id_b"), col("hs").as("hb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        greatest(contain(col("ha"), col("hb")),
          contain(col("hb"), col("ha"))).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  /** Dropped-bucket accounting for [[hammingSetPairs]]'s `maxBucket`
    * cap — the same stance as [[minhashDroppedBuckets]]. */
  def hammingSetDroppedBuckets(sigs: DataFrame, idCol: String,
                               sigsCol: String, maxDist: Int = 3,
                               maxBucket: Int = 4096): DataFrame =
    hammingSetBuckets(sigs, idCol, sigsCol, maxDist)
      .select(col("band"), col("bh"), size(col("ids")).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)

  /** The per-element band-bucket relation behind [[hammingSetPairs]]:
    * (band, bh, ids), ids sorted, each id listed once per bucket even
    * when several of its elements share the band key. */
  private def hammingSetBuckets(sigs: DataFrame, idCol: String,
                                sigsCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && 64 % (maxDist + 1) == 0,
      "maxDist+1 must divide 64 (e.g. 0, 1, 3, 7, 15)")
    val bands = maxDist + 1
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val bandKeys = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sh"), b * width).bitwiseAND(mask).as("bh"))
    }
    sigs
      .select(col(idCol).as("id"), explode(col(sigsCol)).as("sh"))
      .select(col("id"), explode(array(bandKeys: _*)).as("bk"))
      .groupBy(col("bk.band").as("band"), col("bk.bh").as("bh"))
      .agg(array_sort(collect_set(col("id"))).as("ids"))
  }

  /** C4 — n-gram Jaccard similarity pairs ≥ `threshold`. Candidate pairs
    * come from the shared-shingle join (gram is the shuffle key), so
    * complexity is Σ|posting list|², not |docs|².
    *
    * `maxDocFreq` caps that Σ|posting list|² term: a gram appearing in
    * more than `maxDocFreq` documents ("of the and" at web scale has a
    * posting list ~O(corpus)) is dropped before the join. Such grams
    * carry no similarity signal — every document contains them — while
    * contributing the quadratically dominant join blow-up; dropping
    * them only slightly underestimates Jaccard for genuinely similar
    * pairs (per-doc totals `n1`/`n2` are computed before the cap, so
    * the denominator is exact). The default is far above the test
    * corpus size (500 docs), i.e. a no-op locally; at 100 TB set it to
    * ~0.1–1% of the document count. */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, threshold: Double = 0.1,
                        maxDocFreq: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // MAP-SIDE gram prep (r20, guide §2.4): the per-doc gram dedup and
    // the n_grams denominator are both per-document functions, so they
    // compute BEFORE the explode (array_distinct + size on the gram
    // array) — the old global `distinct()` exchange and the
    // count-over-Window.partitionBy(id) exchange bought nothing this
    // arithmetic can't. What remains distributed is exactly what must
    // be: ONE exchange (the df window on gram, whose partitioning the
    // posting self-join below reuses) + the pair aggregate. 4 gram-
    // relation exchanges → 2.
    //
    // A full posting-list shape (collect_list per gram + suffix-pair
    // explode, one fewer join) was measured WORSE at sf0.1 (the
    // collect_list ObjectHashAggregate falls back to sort-based past
    // 128 keys/partition and re-sorts the gram relation twice: in-JVM
    // A/B 1.1 s join form vs 2.1-3.1 s posting form) — the join stays.
    val g = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        array_distinct(
          when(size(col("toks")) >= n,
            transform(sequence(lit(0), size(col("toks")) - n),
              i => concat_ws(" ", slice(col("toks"), i + lit(1), lit(n)))))
            .otherwise(expr("CAST(array() AS array<string>)"))).as("grams"))
      // explode_OUTER, then drop the null-gram rows on the exploded
      // ATTRIBUTE: a plain explode of a projected array lets
      // InferFiltersFromGenerate add `size(grams) > 0` and predicate
      // pushdown substitute the WHOLE gram pipeline (split + transform
      // + concat_ws + array_distinct) into a scan-level filter — the
      // pipeline then evaluates 3× per document (measured: the explode
      // stage alone went 4.5 s → ~1 s at sf0.1). The outer generate
      // infers nothing; the isNotNull filter costs one null check per
      // gram row and removes exactly the empty-array rows the inner
      // explode would have dropped.
      .select(col(idCol), size(col("grams")).cast("long").as("n_grams"),
        explode_outer(col("grams")).as("gram"))
      .filter(col("gram").isNotNull)
      // hot-gram cap; the window repartitions by gram, which the join
      // below reuses as its own partitioning. Materialize once: both
      // join sides read the relation (pair-sized cut, bounded).
      .withColumn("df", count(lit(1)).over(Window.partitionBy("gram")))
      .filter(col("df") <= maxDocFreq)
      .localCheckpoint()
    val a = g.select(col(idCol).as("doc1"), col("gram"), col("n_grams").as("n1"))
    val b = g.select(col(idCol).as("doc2"), col("gram"), col("n_grams").as("n2"))
    a.join(b, "gram")
      .filter(col("doc1") < col("doc2"))
      .groupBy("doc1", "doc2", "n1", "n2")
      .agg(count(lit(1)).as("inter"))
      // round4, not round(x,4): jaccard is a ratio of small ints, the
      // class whose .xxxx5 ties Spark's BigDecimal rounding and
      // DuckDB's scaled rounding land on opposite sides of
      .withColumn("jaccard", TextFunctions.round4(
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc1"), col("doc2"), col("jaccard"))
  }

  /** Labels for the EDGE-INCIDENT vertices of a pair relation, with
    * convergence accounting — the output of [[propagateMinLabels]].
    * `labels` has columns (id, comp); vertices with no incident pair
    * (the overwhelming majority of a near-dup corpus) are NOT present —
    * [[connectedComponents]] unions them back once at the end. */
  final case class ComponentLabels(labels: DataFrame, converged: Boolean,
                                   rounds: Int)

  /** Min-label propagation over the edge-incident vertex set ONLY.
    *
    * On a near-dup graph at 100 TB, <1% of documents appear in any
    * pair; iterating the full corpus would shuffle and checkpoint the
    * unchanging 99% every round. So every relation inside the loop is
    * EDGE-sized: the vertex set is `distinct src` of the symmetric edge
    * relation, each round is one edge⋈labels join + one groupBy (both
    * shuffling on vertex id over edge-sized inputs), and the
    * convergence probe is folded into the update pass as a `changed`
    * flag scanned off the round's already-materialized checkpoint — no
    * separate convergence join. Converges in O(component diameter)
    * rounds; `localCheckpoint` per round cuts the iterative lineage so
    * round N doesn't replan rounds 1..N-1.
    *
    * Never silently truncates: the result carries `converged` and the
    * round count, so callers can retry with a higher budget or fail —
    * the same accounting stance as [[minhashDroppedBuckets]]. */
  def propagateMinLabels(pairs: DataFrame, maxIter: Int = 20): ComponentLabels = {
    val edges = pairs
      .select(col("doc1").as("src"), col("doc2").as("dst"))
      .union(pairs.select(col("doc2").as("src"), col("doc1").as("dst")))
      .distinct()
      .localCheckpoint()
    // symmetric edges → every incident vertex appears as some `src`
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("comp").as("ncomp")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("ncomp")).as("nmin"))
      // inner join: symmetry guarantees every labeled id has a neighbor
      val updated = labels
        .join(neighborMin, Seq("id"))
        .select(col("id"), least(col("comp"), col("nmin")).as("comp"),
          (col("nmin") < col("comp")).as("changed"))
        .localCheckpoint()
      converged = updated.filter(col("changed")).isEmpty
      labels = updated.select(col("id"), col("comp"))
      rounds += 1
    }
    ComponentLabels(labels, converged, rounds)
  }

  /** Alternating large-star / small-star connected components (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC'14)
    * — the HIGH-DIAMETER scale path. [[propagateMinLabels]] needs
    * O(diameter) rounds: a duplicate CHAIN a thousand docs long (news
    * wire re-edits, versioned pages — real corpora have them) would
    * need a thousand shuffles. The star operations contract paths
    * toward each component's minimum so the edge set converges to
    * per-component stars in O(log² n) rounds — a 500-long chain
    * measures 8 rounds, and round cost stays EDGE-sized throughout
    * (one groupBy-min + one join per operation; no relation ever
    * exceeds 2·|E| rows).
    *
    * Each operation processes the symmetrized edge relation: per
    * directed (u,v), with `m(u)` = min of u's closed neighborhood,
    * large-star rewires every LARGER neighbor to m (`v > u` → emit
    * (m,v)), small-star every smaller-or-equal neighbor AND u itself
    * (`v < u` → emit (m,v); every u → emit (m,u)). Emitted edges are
    * kept canonical (small,large) — m is a closed-neighborhood min, so
    * the orientation is free — self-loops drop, and the loop ends when
    * a full round leaves the edge set unchanged (at the fixpoint every
    * non-root points straight at its component min, which IS the label
    * relation). `localCheckpoint` per round truncates the iterative
    * lineage like the propagation loop. */
  def alternatingComponents(pairs: DataFrame, maxIter: Int = 30): ComponentLabels = {
    var e = pairs
      .select(least(col("doc1"), col("doc2")).as("u"),
              greatest(col("doc1"), col("doc2")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var converged = e.isEmpty
    var rounds = 0
    while (!converged && rounds < maxIter) {
      // LARGE-STAR
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val minsL = sym.groupBy("u").agg(min(col("v")).as("nm"))
        .select(col("u"), least(col("u"), col("nm")).as("m"))
      val ls = sym.join(minsL, "u")
        .filter(col("v") > col("u"))
        .select(col("m").as("u"), col("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // SMALL-STAR
      val sym2 = ls.union(ls.select(col("v").as("u"), col("u").as("v")))
      val minsS = sym2.groupBy("u").agg(min(col("v")).as("nm"))
        .select(col("u"), least(col("u"), col("nm")).as("m"))
      val ss = sym2.join(minsS, "u")
        .filter(col("v") < col("u"))
        .select(col("m").as("u"), col("v"))
        .union(minsS.select(col("m").as("u"), col("u").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()
      converged = ss.count() == e.count() && ss.except(e).isEmpty
      e = ss
      rounds += 1
    }
    val labels = e.select(col("v").as("id"), col("u").as("comp"))
      .union(e.select(col("u")).distinct()
        .select(col("u").as("id"), col("u").as("comp")))
    ComponentLabels(labels, converged, rounds)
  }

  /** Accounting for [[ngramJaccardPairs]]'s `maxDocFreq` cap: one row
    * per DROPPED gram with its document frequency. The cap is correct
    * policy (a corpus-frequent gram carries no similarity signal while
    * contributing the quadratically dominant posting-list blow-up) but
    * must not be invisible: count the dropped grams, histogram `df`,
    * or join them back to bound the per-pair Jaccard underestimate —
    * the same stance as [[minhashDroppedBuckets]]. One aggregation
    * over the shingle relation; no joins. */
  def ngramDroppedGrams(docs: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, maxDocFreq: Long = 100000L): DataFrame =
    shingles(docs, textCol, idCol, n)
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq)

  /** C16 — near-dup CLUSTERING: connected components over a pair
    * relation, labeling every document with the minimum id of its
    * component. The keep-smallest pass ([[graft.operators.Corpus
    * .removeNearDups]]) only drops docs that appear as the LARGER side
    * of some pair — on a chain like (b,c),(a,c) it keeps both a and b
    * even though they share a component — while the component label
    * gives exact transitive clusters (keep one representative per
    * component, as production dedup does over MinHash candidates).
    *
    * ADAPTIVE execution, both paths producing identical labels:
    *  - pair relations of at most `driverMaxEdges` rows (long-typed
    *    ids) run as a driver union-find — the collect is bounded by
    *    the threshold (100k edges ≈ 1.6 MB, the same O(MB) class as
    *    the IVF centroid collect), and a multi-round Spark loop over a
    *    KB-scale graph is pure scheduling overhead;
    *  - larger graphs run [[alternatingComponents]]'s distributed
    *    star-contraction loop over the edge-incident vertices only
    *    (edge-sized rounds, O(log² n) round count — diameter-PROOF,
    *    unlike min-label propagation; see its scaladoc), throwing if
    *    `maxIter` is exhausted rather than silently truncating.
    * Either way ONE corpus-sized anti-join then labels the untouched
    * singletons with their own id. Pass `driverMaxEdges = 0` to force
    * the distributed path. */
  def connectedComponents(vertices: DataFrame, idCol: String, pairs: DataFrame,
                          maxIter: Int = 20,
                          driverMaxEdges: Long = 100000L): DataFrame = {
    // materialize the (often expensive) pair computation once: the
    // size probe and whichever path runs both read this
    val p = pairs.select(col("doc1"), col("doc2")).localCheckpoint()
    val longIds = p.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    val incident =
      if (longIds && driverMaxEdges > 0 && p.count() <= driverMaxEdges)
        driverUnionFind(vertices.sparkSession, p, idCol)
      else {
        val r = alternatingComponents(p, maxIter)
        if (!r.converged)
          throw new IllegalStateException(
            s"connectedComponents did not converge in ${r.rounds} rounds " +
              s"(maxIter=$maxIter): raise maxIter (the star-contraction " +
              "round count grows ~log², so a small increase goes far) or " +
              "use propagateMinLabels for partial labels")
        r.labels.select(col("id").as(idCol), col("comp").as("component"))
      }
    val singletons = vertices.select(col(idCol))
      .join(incident.select(col(idCol)), Seq(idCol), "left_anti")
      .select(col(idCol), col(idCol).as("component"))
    incident.union(singletons)
  }

  /** Min-representative union-find over a collected edge list — the
    * small-graph path of [[connectedComponents]]. Roots are always the
    * component minimum (unions attach the larger root under the
    * smaller), so labels equal min-label propagation's fixpoint. */
  private def driverUnionFind(spark: org.apache.spark.sql.SparkSession,
                              pairs: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.collect().foreach { row =>
      val (a, b) = (row.getLong(0), row.getLong(1))
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra
      else if (rb < ra) parent(ra) = rb
    }
    parent.keys.toSeq.map(v => (v, find(v)))
      .toDF(idCol, "component")
  }

  /** C19 — benchmark decontamination screening: every corpus document
    * sharing at least one word n-gram with a benchmark/eval set, with
    * the count of distinct overlapping grams — the contamination check
    * a training pipeline runs before a model ever sees the data.
    *
    * Scale shape: eval suites are KB–MB scale, so the benchmark gram
    * set BROADCASTS and the join is a map-side gram-equality probe
    * over the corpus shingle relation (one explode + window per doc) —
    * never a corpus×corpus join, and documents with zero hits never
    * shuffle at all. */
  def contaminationHits(docs: DataFrame, textCol: String, idCol: String,
                        benchGrams: DataFrame, n: Int = 13): DataFrame =
    shingles(docs, textCol, idCol, n)
      .join(broadcast(benchGrams.select(col("gram")).distinct()), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))

  /** C88 — per-document n-gram NOVELTY vs a reference corpus: the
    * graded generalization of the C19 contamination flag. Where C19
    * answers "does this doc hit the eval set at all?" (a broadcastable
    * benchmark), novelty answers "how much of this doc is NEW relative
    * to what we already trained on?" — the memorization/boilerplate
    * screen a continual-pretraining pipeline runs before admitting a
    * crawl increment (near-0 novelty = the increment re-buys yesterday's
    * data; docs below a novelty floor are skipped or down-weighted).
    *
    * `novelty = 1 − |distinct grams ∩ reference grams| / |distinct
    * grams|`; docs shorter than `n` tokens report 0 grams and novelty
    * 1.0 (nothing matched, nothing covered — they pass to the length
    * filters, not the dedup ones).
    *
    * Scale shape: the reference side is corpus-sized, NOT
    * broadcastable — both sides reduce to DISTINCT gram relations and
    * the membership check is one equality join ON THE GRAM KEY
    * (shuffle partitioned by gram, AQE-splittable), then one groupBy
    * per doc. Every count is an integer; the single float is the
    * final round4 ratio — the relation SQL-oracles. */
  def ngramNovelty(docs: DataFrame, textCol: String, idCol: String,
                   reference: DataFrame, refTextCol: String,
                   n: Int = 3): DataFrame = {
    val refGrams = shingles(
      reference.select(col(refTextCol).as("__t")).withColumn("__rid", lit(0L)),
      "__t", "__rid", n, dedupGrams = false)
      .select(col("gram")).distinct()
    val perDoc = shingles(docs, textCol, idCol, n) // distinct (doc, gram)
      .join(refGrams.withColumn("__seen", lit(1L)), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__seen"), lit(0L))).as("n_seen"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).cast("bigint").as("n_grams"),
        coalesce(col("n_seen"), lit(0L)).cast("bigint").as("n_seen"),
        when(coalesce(col("n_grams"), lit(0L)) === 0L, lit(1.0))
          .otherwise(graft.functions.TextFunctions.round4(
            (col("n_grams") - col("n_seen")).cast("double") / col("n_grams")))
          .as("novelty"))
  }

  /** C90 — EVAL-SIDE contamination exposure: the C19 flag reversed.
    * C19 tells the corpus owner which TRAINING docs hit the benchmark;
    * the benchmark owner needs the other direction — which EVAL items
    * are burned, and how badly, because a benchmark whose items leak
    * into pretraining stops measuring anything (the "canary" audit
    * every eval release runs against a training corpus).
    *
    * Per benchmark item: its distinct n-grams, how many appear
    * anywhere in the corpus, how many distinct corpus docs share at
    * least one gram (the blast radius), and `exposure` = covered/total
    * round4 — 1.0 means the item is fully reconstructible from
    * training text.
    *
    * Scale shape: both sides reduce to distinct (id, gram) relations
    * joined ON THE GRAM KEY (corpus-sized, never broadcast — the C88
    * stance), then one per-item aggregate; `n_corpus_docs` is a
    * count(distinct) inside that aggregate, exact. */
  def evalExposure(bench: DataFrame, textCol: String, idCol: String,
                   corpus: DataFrame, corpusTextCol: String,
                   corpusIdCol: String, n: Int = 5): DataFrame = {
    val corpusGrams = shingles(
      corpus.select(col(corpusIdCol).as("__cid2"), col(corpusTextCol).as("__t")),
      "__t", "__cid2", n) // distinct (corpus doc, gram)
      .select(col("gram"), col("__cid2"))
    val perItem = shingles(bench, textCol, idCol, n)
      .join(corpusGrams, Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(countDistinct(col("gram")).as("n_grams"),
        countDistinct(when(col("__cid2").isNotNull, col("gram")))
          .as("n_covered"),
        countDistinct(col("__cid2")).as("n_corpus_docs"))
    bench.select(col(idCol)).join(perItem, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).cast("bigint").as("n_grams"),
        coalesce(col("n_covered"), lit(0L)).cast("bigint").as("n_covered"),
        coalesce(col("n_corpus_docs"), lit(0L)).cast("bigint")
          .as("n_corpus_docs"),
        when(coalesce(col("n_grams"), lit(0L)) === 0L, lit(0.0))
          .otherwise(graft.functions.TextFunctions.round4(
            col("n_covered").cast("double") / col("n_grams")))
          .as("exposure"))
  }

  /** C19b — [[contaminationHits]] with a BLOOM FILTER in place of the
    * exact gram broadcast: the screen for benchmark suites too large
    * to ship to every task verbatim. `bloom_filter_agg` folds the
    * benchmark grams into ~1.2 bytes/gram at 1% false-positive rate
    * (vs ~15-25 raw bytes per 13-gram), and the corpus side stays a
    * map-only `might_contain` probe — zero shuffle for clean docs,
    * identical shape to the exact screen.
    *
    * One-sided error, the SAFE direction for decontamination: every
    * truly-overlapping doc is flagged (no false negatives); a ~`fpp`
    * fraction of clean docs' grams false-positive, so `n_hits` is an
    * upper bound and a doc may be flagged spuriously. Use as the
    * 100 TB pre-screen and confirm flagged docs with the exact join —
    * the same candidates-then-verify shape as the dedup path.
    *
    * The sketch is built distributed (one aggregation over the gram
    * relation) and its BYTES collected to the driver — a bounded
    * collect by construction (`numBits/8` ≈ 1.2 MB per million grams
    * at 1%), the same bounded-sketch-to-driver pattern as the IVF
    * centroids — then embedded as a literal, because Spark's
    * `BloomFilterMightContain` requires a constant filter. The probe
    * side is then a pure map-side filter: no join node at all. */
  def contaminationHitsBloom(docs: DataFrame, textCol: String, idCol: String,
                             benchGrams: DataFrame, n: Int = 13,
                             expectedGrams: Long = 1000000L,
                             fpp: Double = 0.01): DataFrame = {
    // numBits ≈ -items·ln(fpp)/ln(2)² — the standard Bloom sizing
    val numBits = math.max(64L,
      math.ceil(-expectedGrams * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    // Spark's BloomFilterAggregate silently CLAMPS items/bits to the
    // runtime-join-filter session caps (4M items / 64M bits by
    // default) — above ~7M grams the sketch would quietly degrade to
    // fpp→1 while reporting as if sized. Raise the caps for this
    // build, restore after; the sketch itself stays a bounded driver
    // collect (numBits/8 bytes).
    val spark = benchGrams.sparkSession
    def raised(key: String, needed: Long): Option[String] = {
      val old = spark.conf.get(key)
      if (old.toLong < needed) { spark.conf.set(key, needed.toString); Some(old) }
      else None
    }
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    // serialize the set→build→restore on a JVM-wide lock: two
    // concurrent builders would otherwise race the shared session
    // confs (one's restore clamping the other's still-running build)
    val bloomBytes = bloomConfLock.synchronized {
      val (oldItems, oldBits) =
        (raised(itemsKey, expectedGrams), raised(bitsKey, numBits))
      // no distinct(): Bloom insertion is idempotent, so duplicates
      // cost nothing while a pre-dedup would shuffle every benchmark
      // gram just to drop repeats — partial sketches merge map-side
      try benchGrams.select(col("gram"))
        .agg(expr(s"graft_bloom_agg(xxhash64(gram), ${expectedGrams}L, ${numBits}L)")
          .as("bf"))
        .head().getAs[Array[Byte]](0)
      finally {
        oldItems.foreach(spark.conf.set(itemsKey, _))
        oldBits.foreach(spark.conf.set(bitsKey, _))
      }
    }
    shingles(docs, textCol, idCol, n)
      .filter(call_function("graft_bloom_contains",
        lit(bloomBytes), xxhash64(col("gram"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Exact n-gram Jaccard computed ONLY for the given candidate pairs
    * (`id_a`, `id_b`) — the verify half of the candidates-then-verify
    * composition every approximate dedup runs at 100 TB: MinHash or
    * SimHash proposes, this confirms. Two equi-joins on the id attach
    * each side's gram set; cost is O(|pairs| × grams-per-doc), never
    * the corpus-wide posting-list join of [[ngramJaccardPairs]].
    *
    * Row width is BOUNDED: each doc's gram set travels as a sorted
    * array of distinct xxhash64 values — 8 bytes per gram instead of
    * the raw gram strings (a book-length doc has 10⁵–10⁶ grams; at
    * ~20 B per raw 3-gram that is a tens-of-MB row meeting the join
    * side by side, vs single-MB hashed). Intersection/union sizes — so
    * the Jaccard — equal the raw-string computation absent 64-bit
    * collisions within a pair's union (~m²/2⁶⁴, negligible). Hashing
    * also drops a shuffle: the gram `distinct` folds into the
    * `collect_set`, leaving one exchange (the groupBy on the id).
    *
    * `maxGrams > 0` additionally caps each doc at its `maxGrams`
    * SMALLEST hashes — a bottom-k (KMV) sketch. The capped Jaccard is
    * the PROPER KMV estimator: take the k smallest hashes of the
    * UNION (computable from the two bottom-k arrays, since the union's
    * bottom-k is the bottom-k of their concatenation) and count how
    * many of them lie in both sketches — membership is exact inside
    * that window, because a hash among the union's k smallest that
    * belongs to a set is necessarily among that set's own k smallest.
    * Error ~1/√maxGrams regardless of the two docs' relative sizes.
    * (The naive `|A_k∩B_k| / |A_k∪B_k|` is NOT that estimator: for a
    * short doc contained in a long one it counts B-only hashes far
    * beyond A's sketch horizon and underestimates J by up to ~2×.)
    * Set the cap above the corpus's per-doc gram P99 so estimation
    * only touches outlier documents, and keep 0 (uncapped) when the
    * downstream is an oracle-checked exact gate. */
  def exactJaccardForPairs(docs: DataFrame, textCol: String, idCol: String,
                           pairs: DataFrame, n: Int = 3,
                           maxGrams: Int = 0): DataFrame = {
    val sets = hashedGramSets(docs, textCol, idCol, n, maxGrams)
    // LEFT joins + empty-set coalesce: a doc with fewer than n tokens
    // has no gram row, and an inner join would silently DROP its
    // candidate pairs — neither confirmed nor rejected. Scoring against
    // the empty set yields 0.0 (grams cannot confirm the pair), which
    // keeps the candidates-then-verify accounting total.
    val empty = expr("CAST(array() AS array<bigint>)")
    val joined = pairs.select(col("id_a"), col("id_b"))
      .join(sets.select(col(idCol).as("id_a"), col("grams").as("ga")), Seq("id_a"), "left")
      .join(sets.select(col(idCol).as("id_b"), col("grams").as("gb")), Seq("id_b"), "left")
      .withColumn("ga", coalesce(col("ga"), empty))
      .withColumn("gb", coalesce(col("gb"), empty))
    val jac =
      if (maxGrams > 0)
        joined
          // union's bottom-k window; project to an attribute so the
          // intersect below doesn't recompute the sort (the
          // per-element re-evaluation trap documented on shingles)
          .withColumn("uk",
            slice(array_sort(array_union(col("ga"), col("gb"))), 1, maxGrams))
          .withColumn("jaccard", when(size(col("uk")) === 0, lit(0.0))
            .otherwise(TextFunctions.round4(
              size(array_intersect(col("uk"),
                array_intersect(col("ga"), col("gb")))).cast("double") /
                size(col("uk")))))
      else
        joined.withColumn("jaccard",
          when(size(array_union(col("ga"), col("gb"))) === 0, lit(0.0))
            .otherwise(TextFunctions.round4(
              size(array_intersect(col("ga"), col("gb"))).cast("double") /
                size(array_union(col("ga"), col("gb"))))))
    jac.select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** The per-doc gram relation [[exactJaccardForPairs]] joins through:
    * `(idCol, grams array<bigint>)`, sorted distinct xxhash64 gram
    * hashes, bottom-`maxGrams` when capped. Exposed so callers (and the
    * width spec) can audit exactly what meets the pair join. */
  def hashedGramSets(docs: DataFrame, textCol: String, idCol: String,
                     n: Int = 3, maxGrams: Int = 0): DataFrame = {
    // collect_set dedups, so the shingle relation can skip its distinct
    val hashed = shingles(docs, textCol, idCol, n, dedupGrams = false)
      .groupBy(col(idCol))
      .agg(array_sort(collect_set(xxhash64(col("gram")))).as("grams"))
    if (maxGrams > 0) hashed.withColumn("grams",
      slice(col("grams"), 1, maxGrams))
    else hashed
  }

  /** C32 — repeated-SPAN detection: the span-level complement to
    * doc-level near-dup removal (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"). Doc-level dedup
    * keeps one copy of a duplicated PAGE; it cannot see the license
    * header, nav boilerplate or quoted passage repeated verbatim
    * inside otherwise-distinct documents — the spans LMs memorize
    * first. Per document: its count of distinct `span`-token windows,
    * how many of those windows also occur in ≥ `minDocs` documents
    * (itself included), and the resulting duplicated-span fraction —
    * the per-doc removal/penalty signal. Short docs (< `span` tokens)
    * report zero spans, fraction 0.0 — surfaced, never dropped.
    *
    * Scale shape: spans travel as md5 hashes from the map side on
    * (32 B/span regardless of span length — a 50-token window never
    * rides the shuffle as a ~300 B string), so both shuffles key on
    * high-cardinality hashes. Doc frequency is counted on the DISTINCT
    * (id, hash) relation — a span looping 1 000× inside one doc counts
    * once. The shared-span flag joins back on the hash (never
    * broadcast: at 100 TB the hot-span set is itself huge), a plain
    * shuffle join AQE can skew-split when one boilerplate span hits
    * 10⁶ docs; the md5 collision rate is negligible at 2^64 spans.
    * Left joins preserve every document through to the report. */
  /** C47 — winnowing fingerprints (Schleimer, Wilkerson & Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD'03 — the MOSS algorithm, the standard code-dedup
    * fingerprinter in LLM data pipelines). Every k-gram is hashed and
    * each length-`w` window of consecutive gram hashes keeps only its
    * MINIMUM — an expected 2/(w+1) of grams survive, so the posting
    * relation [[spanDuplication]] would build from every gram shrinks
    * ~w/2× while keeping the guarantee: any run of ≥ w+k−1 shared
    * tokens contributes at least one shared fingerprint (the winnowing
    * theorem; spec-pinned). Cross-engine determinism comes free: the
    * hash is an md5 prefix (identical in DuckDB), selection is a plain
    * windowed min, and ties are impossible in practice (equal prefix ⇒
    * equal gram, and equal mins select the same VALUE either way).
    * Trailing (shorter-than-w) windows are included — their mins are
    * suffix minima, deterministic and mirrored identically, so the SQL
    * oracle needs no end-of-doc special case.
    *
    * Scale shape: the per-doc window partitions on doc id (thousands
    * of parallel partitions, never a global sort), and the fingerprint
    * relation it emits is the SPARSE one — that sparsity is the whole
    * point at 100 TB. Returns distinct `(idCol, fp)`. */
  def winnowFingerprints(docs: DataFrame, textCol: String, idCol: String,
                         k: Int = 4, w: Int = 8): DataFrame =
    winnowFingerprintsRaw(docs, textCol, idCol, k, w).distinct()

  /** [[winnowFingerprints]] BEFORE the (id, fp) distinct — for
    * consumers whose downstream aggregate absorbs duplicates
    * (collect_set in [[winnowPairs]]), which skips the distinct's
    * exchange. The per-doc window min is computed MAP-SIDE over the
    * doc's own gram-hash array (`array_min` of each w-slice — the
    * selection is a pure per-document function, so the old
    * Window-partitionBy(id) paid an exchange + per-doc sort for a
    * purely local computation; r20, guide §2.4). Trailing windows
    * (< w grams left) clip exactly like `rowsBetween(0, w-1)` did:
    * suffix minima, same fingerprints. */
  private def winnowFingerprintsRaw(docs: DataFrame, textCol: String,
                                    idCol: String, k: Int, w: Int): DataFrame =
    docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col(idCol),
        transform(sequence(lit(0), size(col("toks")) - k),
          i => substring(md5(concat_ws(" ",
            slice(col("toks"), i + lit(1), lit(k)))), 1, 16)).as("hs"))
      // hs projected to a plain attribute before the windowing lambda
      // (the per-element re-evaluation trap documented on shingles)
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(col("hs"))),
          j => array_min(slice(col("hs"), j, lit(w))))).as("fp"))

  /** Winnowed near-dup candidate pairs: a posting join over the SPARSE
    * fingerprint relation — (doc1, doc2, n_shared fingerprints), kept
    * when ≥ `minShared`. `maxDocFreq` drops boilerplate fingerprints
    * (the [[ngramJaccardPairs]] stop-gram stance: a fingerprint in
    * hundreds of docs is a hot key whose df² pair blowup buys no
    * signal); [[winnowDroppedFingerprints]] is its accounting
    * relation. */
  def winnowPairs(docs: DataFrame, textCol: String, idCol: String,
                  k: Int = 4, w: Int = 8, minShared: Int = 2,
                  maxDocFreq: Int = 20): DataFrame = {
    // POSTING-LIST shape (r20, guide §2.4 — the ngramJaccardPairs
    // rewrite applied to the sparse fingerprint relation): collect_set
    // absorbs the per-doc fingerprint distinct, df = posting-list size
    // folds the hot-fingerprint cap into the same aggregate, and pairs
    // stream out of a posexplode+slice suffix pairing (doc1 < doc2 by
    // array_sort). One exchange on fp + the pair aggregate replace the
    // distinct exchange, the checkpoint, the df join and the posting
    // self-join.
    val fp = winnowFingerprintsRaw(docs, textCol, idCol, k, w)
    fp.groupBy(col("fp"))
      .agg(array_sort(collect_set(col(idCol))).as("xs"))
      .filter(size(col("xs")).between(2, maxDocFreq))
      // posexplode_OUTER: see ngramJaccardPairs — avoids the inferred
      // size>0 filter re-evaluating the sorted list; xs is never empty
      .select(col("xs"), posexplode_outer(col("xs")).as(Seq("i", "doc1")))
      .select(col("doc1"),
        explode(slice(col("xs"), col("i") + lit(2), size(col("xs")))).as("doc2"))
      .groupBy(col("doc1"), col("doc2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The fingerprints [[winnowPairs]]' `maxDocFreq` cap dropped, with
    * their document frequencies — every lossy cap gets an accounting
    * relation. */
  def winnowDroppedFingerprints(docs: DataFrame, textCol: String,
                                idCol: String, k: Int = 4, w: Int = 8,
                                maxDocFreq: Int = 20): DataFrame =
    winnowFingerprints(docs, textCol, idCol, k, w)
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq)

  /** Span-level dedup WITH document reconstruction (SURVEY.md §2 C49)
    * — [[spanDuplication]] only reports the duplicated-span signal;
    * this operator acts on it: every document is tiled into
    * consecutive NON-OVERLAPPING `span`-token tiles, each repeated
    * full tile keeps exactly its globally-first occurrence (min
    * `(doc_id, tile_idx)` — deterministic on any cluster layout) and
    * loses the rest, and the surviving tiles are re-joined into
    * `clean_text`. This is the remove-the-boilerplate step of
    * substring-level corpus dedup (Lee et al. 2022 shape, tiled so
    * removal is well-defined and engine-exact): headers, license
    * blocks and navigation chrome vanish from every copy but one
    * while the documents themselves survive.
    *
    * Ragged tail tiles (< `span` tokens) are never dedup-eligible —
    * short tails collide by chance and removing them would truncate
    * most documents.
    *
    * Scale shape: tiling is map-only arithmetic over the token array
    * (no self-join, no window over the corpus); the keeper choice is
    * ONE hash agg on the tile hash (partial-agg'd min/count); the
    * rebuild is one hash agg on the doc id with `array_sort` +
    * `array_join` — tiles per doc are bounded by doc length, so no
    * group blows up. md5 tiles + plain min make every step
    * engine-exact, so the operator carries a full SQL oracle. */
  def spanScrub(docs: DataFrame, textCol: String, idCol: String,
                span: Int = 32): DataFrame = {
    require(span >= 1, "span must be >= 1")
    val toks = TextFunctions.tokens(coalesce(col(textCol), lit("")))
    // ceil(n/span) tiles; n >= 1 always (splitting "" yields [""])
    val nTiles = floor((size(toks) + lit(span - 1)).cast("double") / span)
      .cast("int")
    val tiles = docs.select(col(idCol), toks.as("toks"),
        posexplode(sequence(lit(0), nTiles - 1)).as(Seq("ord", "tile_idx")))
      .select(col(idCol), col("tile_idx"),
        array_join(slice(col("toks"),
          col("tile_idx") * span + 1, lit(span)), " ").as("tile"),
        ((col("tile_idx") + 1) * span <= size(col("toks"))).as("full"))
      .withColumn("h", md5(col("tile")))
    val keepers = tiles.filter(col("full"))
      .groupBy(col("h"))
      .agg(min(struct(col(idCol), col("tile_idx"))).as("keeper"),
           count(lit(1)).as("n_occ"))
    val marked = tiles.join(keepers, Seq("h"), "left")
      .withColumn("dropped",
        col("full") && col("n_occ") >= 2 &&
          !(col(idCol) === col("keeper")(idCol) &&
            col("tile_idx") === col("keeper.tile_idx")))
    marked.groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(!col("dropped"),
            struct(col("tile_idx"), col("tile"))))),
          s => s.getField("tile")), " ").as("clean_text"),
        count(lit(1)).as("n_tiles"),
        sum(col("dropped").cast("long")).as("n_removed"))
      .select(col(idCol), col("clean_text"), col("n_tiles"),
        col("n_removed"))
  }

  /** C54 — SURGICAL benchmark decontamination: where
    * [[contaminationHits]] only FLAGS documents sharing an n-gram with
    * the eval set (and dropping the whole doc throws away everything
    * else it contains), this operator removes exactly the overlapping
    * token spans and keeps the document — the decontamination stance
    * of GPT-3/PaLM-style dedup ("remove the contaminated substring,
    * not the page"). A token is contaminated iff ANY eval n-gram
    * window covers it; clean_text is the remaining tokens in order.
    *
    * Scale shape: the eval gram set BROADCASTS (eval suites are KB–MB);
    * the positioned-window relation is a map-only transform+posexplode
    * of the token array; only HIT windows (contaminated docs) ever
    * shuffle — a clean corpus aggregates nothing; the position
    * expansion is hit-bounded (≤ n rows per hit window) and the
    * rebuild is one hash agg on the doc id. Every step is integer
    * positions + string equality — engine-exact, full SQL oracle. */
  def decontamScrub(docs: DataFrame, textCol: String, idCol: String,
                    benchGrams: DataFrame, n: Int = 13): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val toks = TextFunctions.tokens(coalesce(col(textCol), lit("")))
    val based = docs.select(col(idCol), toks.as("toks"))
    // 1-based window starts: window p covers tokens [p, p+n-1]
    val wins = based.select(col(idCol),
        posexplode(when(size(col("toks")) >= n,
          transform(sequence(lit(1), size(col("toks")) - (n - 1)),
            p => concat_ws(" ", slice(col("toks"), p, lit(n)))))
          .otherwise(expr("CAST(array() AS array<string>)")))
          .as(Seq("ord", "gram")))
    val hits = wins
      .join(broadcast(benchGrams.select(col("gram")).distinct()), "gram")
      .select(col(idCol), (col("ord") + 1).as("p"))
    val bad = hits
      .select(col(idCol), explode(sequence(col("p"), col("p") + (n - 1))).as("bp"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_set(col("bp"))).as("badpos"))
    based.join(bad, Seq(idCol), "left")
      .select(col(idCol),
        array_join(filter(col("toks"),
          (tok, i) => !array_contains(
            coalesce(col("badpos"), expr("CAST(array() AS array<int>)")),
            i + 1)), " ").as("clean_text"),
        size(col("toks")).cast("bigint").as("n_tokens"),
        coalesce(size(col("badpos")), lit(0)).cast("bigint").as("n_removed"))
  }

  /** C58 — INCREMENTAL exact dedup: screen a daily delta against the
    * persisted hash index of the already-ingested corpus — the exact
    * counterpart of [[incrementalMinhashPairs]] (near-dup has had an
    * incremental path since r5; exact dedup deserves the same: never
    * re-hash yesterday's 100 TB to admit today's delta). Survivors =
    * delta docs whose text hash is (a) not in the corpus index and
    * (b) the minimum id among intra-delta copies; `n_delta_copies`
    * accounts sibling copies arriving in the same delta. The returned
    * relation is exactly what gets appended to the index for the next
    * delta (hash + id), closing the loop.
    *
    * Scale shape: grouping + anti-join both key on the 128-bit md5 —
    * uniformly distributed, partial-agg'd; the corpus index never
    * re-scans its text, only its hash column (a narrow parquet read);
    * delta-sized output. */
  def incrementalExactDedup(corpusIndex: DataFrame, delta: DataFrame,
                            textCol: String, idCol: String): DataFrame = {
    val hashed = delta.select(col(idCol),
      md5(coalesce(col(textCol), lit(""))).as("h"))
    hashed.groupBy(col("h"))
      .agg(min(col(idCol)).as(idCol),
           count(lit(1)).as("n_delta_copies"))
      .join(corpusIndex.select(col("h")).distinct(), Seq("h"), "left_anti")
      .select(col(idCol), col("h"), col("n_delta_copies"))
  }

  def spanDuplication(docs: DataFrame, textCol: String, idCol: String,
                      span: Int = 32, minDocs: Int = 2): DataFrame = {
    val spans = shingles(docs, textCol, idCol, n = span, dedupGrams = false)
      .select(col(idCol), md5(col("gram")).as("span_hash"))
      .distinct()
    val shared = spans.groupBy(col("span_hash"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("span_hash"), lit(1L).as("is_shared"))
    val perDoc = spans.join(shared, Seq("span_hash"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
           sum(coalesce(col("is_shared"), lit(0L))).as("n_shared_spans"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_shared_spans"), lit(0L)).as("n_shared_spans"),
        when(coalesce(col("n_spans"), lit(0L)) === 0, lit(0.0))
          .otherwise(TextFunctions.round4(
            col("n_shared_spans").cast("double") / col("n_spans")))
          .as("dup_span_fraction"))
  }

  /** Default prefix-key length for [[editDistancePairs]]. Shared with
    * the generated DuckDB oracle so the two engines can never disagree
    * on the grid. */
  val EditKeyLen = 100
  /** Default edit-distance threshold for [[editDistancePairs]]. */
  val EditMaxDist = 4

  /** C70 — edit-distance near-dup pairs (PassJoin-style pigeonhole
    * segment blocking; Li, Deng & Feng, VLDB 2011). Character-level
    * fuzzy matching is the dedup axis MinHash (token Jaccard, C2) and
    * SimHash (token bit votes, C3) cannot see: a doc re-crawled with a
    * handful of single-character typos keeps almost all its character
    * identity but can lose whole token shingles. The key is the first
    * `keyLen` chars of the text (prefix-key dedup: boilerplate
    * templates and re-crawls diverge late, not early).
    *
    * Blocking: the key is cut into a FIXED grid of `maxDist + 1`
    * contiguous segments of `keyLen / (maxDist + 1)` chars. By
    * pigeonhole, two FULL-GRID keys (length = `keyLen`, so all
    * `maxDist + 1` segments exist) within `maxDist` edits share at
    * least one segment with NO edit touching it — that segment appears
    * VERBATIM in the other key, at its canonical offset shifted by the
    * net insertions−deletions aligned before it, so |shift| ≤
    * `maxDist` (and ≥ the key start: segment 0 can only shift right,
    * by insertions in front of it). The grid therefore emits TWO entry
    * roles per doc: INDEX entries (role 0) — each segment at its
    * canonical offset — and PROBE entries (role 1) — the `segLen`-char
    * substrings at every canonical offset shifted by 1..`maxDist`
    * either way (clamped to the key). A candidate is any bucket pair
    * with at least one role-0 side: the unedited segment sits at its
    * canonical offset in its OWN key and at a shifted offset in the
    * other, so index×probe (plus index×index for shift 0) is a
    * COMPLETE candidate generator over full-grid keys — substitutions
    * AND indels — and a recall-only screen (never a false positive:
    * every candidate is re-verified with the exact `levenshtein`
    * before it is emitted). ONE DECLARED recall gap remains: keys
    * SHORTER than the grid contribute only their complete segments,
    * so a pair of equal-length short keys has fewer pigeonholes than
    * `maxDist + 1` and can diverge in every segment it does have
    * (e.g. 50-char keys = 2 complete 20-char segments; distance 3
    * spread across both is missed). Choose keyLen ≤ the corpus's min
    * length to restore the full-grid guarantee; keys shorter than one
    * segment are unblockable and fall out entirely. [[screenEval]]'s
    * edit row measures the achieved recall per distance bucket.
    *
    * Shape at 100 TB: grid entries explode ×(maxDist+1)(2·maxDist+1)
    * worst case (probe side ~2·maxDist× the r14 index-only grid), ONE
    * groupBy on the (i, seg) bucket key, pairs expanded bucket-locally
    * with the same [[pairsWithin]] used by the LSH paths, exact
    * `levenshtein` (codegen'd, O(maxDist·keyLen) banded — constant
    * work per candidate) verifies inside the same stage; never
    * all-pairs. Hot buckets (shared boilerplate prefixes) are
    * exact-duplicate segments — capped at `maxBucket` (counting BOTH
    * roles) with [[editDroppedBuckets]] accounting, same stance as
    * the LSH caps. */
  def editDistancePairs(docs: DataFrame, textCol: String, idCol: String,
                        maxDist: Int = EditMaxDist, keyLen: Int = EditKeyLen,
                        maxBucket: Int = 4096): DataFrame = {
    // thresholded banded form: O(maxDist·keyLen) per candidate and
    // computed ONCE (the 2-arg form sat in both the filter and the
    // projection — two full O(keyLen²) matrices per candidate);
    // -1 = past the bound, exact distance otherwise, so the kept
    // relation is identical
    editBuckets(docs, textCol, idCol, maxDist, keyLen)
      .filter(size(col("xs")).between(2, maxBucket))
      .withColumn("xs", array_sort(col("xs"))) // plain attribute for pairsWithin
      .select(explode(pairsWithin(col("xs"))).as("p"))
      // id first in the entry struct → sorted pairs have a.id ≤ b.id;
      // same-doc entries (shift-0 probe = index, repetitive keys) drop
      .filter(col("p.a.id") =!= col("p.b.id"))
      // the unedited segment is CANONICAL in its own key: one side
      // must be role 0 (probe×probe adds nothing pigeonhole requires)
      .filter(col("p.a.role") === 0 || col("p.b.role") === 0)
      .filter(abs(length(col("p.a.key")) - length(col("p.b.key"))) <= maxDist)
      .withColumn("edit_dist",
        levenshtein(col("p.a.key"), col("p.b.key"), maxDist))
      .filter(col("edit_dist") >= 0)
      .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
        col("edit_dist").cast("long").as("edit_dist"))
      .distinct()
  }

  /** The segment-grid bucket relation behind [[editDistancePairs]]:
    * (i, seg, xs) with xs = [{id, key, role}] — role 0 = canonical
    * (index) grid entry, role 1 = indel-shifted probe. A probe start
    * clamps to the key (`i·segLen + shift ≥ 0` — which also makes
    * segment 0 right-shift-only, the tight bound: nothing before it
    * can be deleted). */
  private def editBuckets(docs: DataFrame, textCol: String, idCol: String,
                          maxDist: Int, keyLen: Int): DataFrame = {
    require(maxDist >= 1 && keyLen % (maxDist + 1) == 0,
      "maxDist+1 must divide keyLen")
    val nSegs = maxDist + 1
    val segLen = keyLen / nSegs
    val segKeys = for {
      i <- 0 until nSegs
      shift <- -maxDist to maxDist
      if i * segLen + shift >= 0
    } yield struct(lit(i).as("i"),
      substring(col("key"), 1 + i * segLen + shift, segLen).as("seg"),
      lit(if (shift == 0) 0 else 1).as("role"))
    docs
      .select(col(idCol).as("id"),
        substring(col(textCol), 1, keyLen).as("key"))
      .select(col("id"), col("key"), explode(array(segKeys: _*)).as("sk"))
      .filter(length(col("sk.seg")) === segLen) // truncated tail segments
      .groupBy(col("sk.i").as("i"), col("sk.seg").as("seg"))
      .agg(collect_list(struct(col("id"), col("key"),
        col("sk.role").as("role"))).as("xs"))
  }

  /** Dropped-bucket accounting for [[editDistancePairs]]'s `maxBucket`
    * cap — see [[minhashDroppedBuckets]]. `bucket_size` counts BOTH
    * entry roles (index + shifted probes), matching the cap. */
  def editDroppedBuckets(docs: DataFrame, textCol: String, idCol: String,
                         maxDist: Int = EditMaxDist, keyLen: Int = EditKeyLen,
                         maxBucket: Int = 4096): DataFrame =
    editBuckets(docs, textCol, idCol, maxDist, keyLen)
      .select(col("i"), col("seg"), size(col("xs")).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)

  /** [[maximalSpans]] grid: anchor gram width (tokens), content-defined
    * sampling modulus and the per-side extension bound. Shared with
    * the generated DuckDB oracle. */
  val SpanAnchorK = 8
  val SpanModP = 4
  val SpanMaxExt = 1024

  /** C73 — EXACT maximal duplicated token spans (the ExactSubstr
    * artifact of Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better"): for every document pair sharing a run
    * of ≥ `minTokens` identical consecutive tokens, the maximal extent
    * of that run in BOTH documents — where [[spanDuplication]]/
    * [[spanScrub]] quantize to fixed tiles, this reports the precise
    * token-aligned boundaries a surgical dedup pass removes.
    *
    * Seed-and-extend, the suffix-array-free distributed shape:
    *  1. ANCHORS: every `anchorK`-token gram whose md5 ≡ 0 (mod
    *     `modP`) — content-defined sampling (the rsync/CDC stance), so
    *     two copies of a substring select the SAME anchors regardless
    *     of their offsets; expected anchor density 1/modP, so a shared
    *     run of ≥ anchorK + modP·c tokens is seeded with probability
    *     ≥ 1 − e^(−c) (probabilistic recall, tunable; [[winnowPairs]]
    *     is the worst-case-guaranteed screen when presence, not
    *     extent, is the question). Boilerplate anchors over
    *     `maxDocFreq` occurrences are dropped with
    *     [[spanDroppedAnchors]] accounting.
    *  2. CANDIDATES: one equi-join on the gram hash — never all-pairs.
    *  3. EXTEND: per candidate, the maximal equal extension left and
    *     right of the anchor as a CLOSED-FORM longest-common-prefix:
    *     `zip_with` token equality over the clamped slices, first
    *     mismatch via `array_position(…, false)` — one codegen'd
    *     expression per side, work linear in the actual extent (an
    *     iterative binary-search formulation was measured to explode
    *     Catalyst's collapsed projection ~4^steps — OOM at plan time);
    *     bounds clamp to the arrays and `maxExt`, and an extent
    *     hitting `maxExt` is flagged `truncated`, never silently
    *     clipped.
    *  4. Same-diagonal anchors inside one run extend to the SAME
    *     maximal span — a final `distinct` collapses them; different
    *     diagonals (shifted re-use) stay separate, as they should.
    *
    * Scale shape: anchors are a map-only transform (≈ tokens/modP
    * rows), the candidate join keys on uniformly-distributed md5, the
    * extension is ONE closed-form first-mismatch scan per candidate —
    * a zip_with equality map + array_position, work linear in the
    * clamped extent, inside the same stage (token arrays fetched by
    * TWO id equi-joins, corpus scanned not collected) — and the
    * output distinct is candidate-sized. Intra-doc repeats are [[spanScrub]]'s job;
    * pairs here are inter-document (`id_a < id_b`). */
  def maximalSpans(docs: DataFrame, textCol: String, idCol: String,
                   minTokens: Int = 12, anchorK: Int = SpanAnchorK,
                   modP: Int = SpanModP, maxExt: Int = SpanMaxExt,
                   maxDocFreq: Int = 20): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val kept = spanAnchors(toks, anchorK, modP, maxDocFreq)
    val cand = kept.select(col("id").as("id_a"), col("pos").as("pa"), col("g"))
      .join(kept.select(col("id").as("id_b"), col("pos").as("pb"), col("g")),
        Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("pa"), col("id_b"), col("pb"))
      .distinct()
    // clamped slices have EQUAL lengths on both sides, so zip_with
    // never null-pads and the first `false` is the true first mismatch
    cand
      .join(toks.select(col("id").as("id_a"), col("toks").as("ta")), "id_a")
      .join(toks.select(col("id").as("id_b"), col("toks").as("tb")), "id_b")
      .withColumn("avail_r", greatest(least(
        size(col("ta")) - col("pa") - anchorK + 1,
        size(col("tb")) - col("pb") - anchorK + 1, lit(maxExt)), lit(0)))
      .withColumn("avail_l", greatest(least(
        col("pa") - 1, col("pb") - 1, lit(maxExt)), lit(0)))
      .withColumn("m_r", zip_with(
        slice(col("ta"), col("pa") + anchorK, col("avail_r")),
        slice(col("tb"), col("pb") + anchorK, col("avail_r")),
        (x, y) => x === y))
      .withColumn("m_l", zip_with(
        reverse(slice(col("ta"), col("pa") - col("avail_l"), col("avail_l"))),
        reverse(slice(col("tb"), col("pb") - col("avail_l"), col("avail_l"))),
        (x, y) => x === y))
      .withColumn("rext", when(array_position(col("m_r"), false) > 0,
        array_position(col("m_r"), false) - 1).otherwise(col("avail_r"))
        .cast("int"))
      .withColumn("lext", when(array_position(col("m_l"), false) > 0,
        array_position(col("m_l"), false) - 1).otherwise(col("avail_l"))
        .cast("int"))
      .filter(col("lext") + anchorK + col("rext") >= minTokens)
      .select(col("id_a"), col("id_b"),
        (col("pa") - col("lext")).as("start_a"),
        (col("pb") - col("lext")).as("start_b"),
        (col("lext") + anchorK + col("rext")).cast("long").as("n_tokens"),
        (col("lext") === maxExt || col("rext") === maxExt).cast("int")
          .as("truncated"))
      .distinct()
  }

  /** The content-defined anchor relation behind [[maximalSpans]]:
    * (id, pos, g) — 1-based gram start, md5 of the anchorK-token gram,
    * sampled at md5 mod modP = 0, boilerplate-capped. */
  private def spanAnchors(toks: DataFrame, anchorK: Int, modP: Int,
                          maxDocFreq: Int): DataFrame = {
    // materialize once: the relation feeds both the df cap and the
    // candidate join — unchecked, the explode+md5 pipeline runs twice
    // (the winnowPairs fingerprint stance; ~tokens/modP rows)
    val anchors = preCapSpanAnchors(toks, anchorK, modP).localCheckpoint()
    val hot = anchors.groupBy(col("g"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq)
      .select(col("g"))
    anchors.join(hot, Seq("g"), "left_anti")
  }

  /** The PRE-CAP content-defined anchor relation (id, pos, g): every
    * anchorK-token gram start whose md5 mod modP == 0. The single
    * definition consumed by BOTH [[spanAnchors]] (candidate side) and
    * [[spanDroppedAnchors]] (accounting side) — shared so a change to
    * the sampling can never desynchronize the accounting relation
    * from what [[maximalSpans]] actually drops. */
  private def preCapSpanAnchors(toks: DataFrame, anchorK: Int,
                                modP: Int): DataFrame =
    toks
      .filter(size(col("toks")) >= anchorK)
      .select(col("id"), posexplode(
        transform(sequence(lit(1), size(col("toks")) - anchorK + 1),
          p => md5(concat_ws(" ", slice(col("toks"), p, lit(anchorK))))))
        .as(Seq("pidx", "g")))
      .select(col("id"), (col("pidx") + 1).as("pos"), col("g"))
      .filter(conv(substring(col("g"), 1, 8), 16, 10).cast("long")
        % modP === 0)

  /** C74 — exact-extent duplicate REMOVAL (the action half of
    * ExactSubstr; [[maximalSpans]] is the detection half): every
    * maximal duplicated run keeps its first occurrence (the smaller
    * doc id — [[maximalSpans]] orients pairs `id_a < id_b`, so the
    * extent is removed from the `id_b` side only) and the covered
    * tokens are dropped from every later copy, documents surviving
    * with their unique content — the Lee et al. "remove the duplicated
    * substring, not the page" stance at exact token boundaries, where
    * [[spanScrub]] (C49) approximates with fixed tiles.
    *
    * Chains are safe without transitivity bookkeeping: in a
    * duplicate chain a < b < c, b's copy is removed via (a,b) and c's
    * via (a,c) (and (b,c) re-covers the same tokens — coverage is a
    * union, removing twice is removing once).
    *
    * Shape at 100 TB: spans are candidate-sized (C73), ONE groupBy
    * collects each doc's removal intervals (bounded by that doc's
    * pair count), ONE left equi-join hands them to the corpus scan,
    * and the removal itself is a map-only indexed `filter` HOF over
    * the token array — a token survives iff no interval covers its
    * position. No explode of corpus tokens, no window over the
    * corpus. */
  def maximalSpanScrub(docs: DataFrame, textCol: String, idCol: String,
                       minTokens: Int = 12, anchorK: Int = SpanAnchorK,
                       modP: Int = SpanModP, maxExt: Int = SpanMaxExt,
                       maxDocFreq: Int = 20): DataFrame = {
    val spans = maximalSpans(docs, textCol, idCol, minTokens, anchorK,
      modP, maxExt, maxDocFreq)
    val ivl = spans
      .select(col("id_b").as("id"),
        struct(col("start_b").cast("int").as("s"),
          (col("start_b") + col("n_tokens") - 1).cast("int").as("e")).as("iv"))
      .groupBy(col("id")).agg(collect_list(col("iv")).as("ivl"))
    docs
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .join(ivl, Seq("id"), "left")
      .withColumn("ivl", coalesce(col("ivl"),
        array().cast("array<struct<s:int,e:int>>")))
      .withColumn("kept", filter(col("toks"), (_, i) =>
        !exists(col("ivl"), v =>
          v.getField("s") <= i + 1 && i + 1 <= v.getField("e"))))
      .select(col("id").as(idCol),
        concat_ws(" ", col("kept")).as("clean_text"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"))
  }

  /** C78 — measured LSH operating curve: the minhash screen's recall
    * against EXACT n-gram Jaccard truth, bucketed by similarity — the
    * empirical S-curve (theory: P(candidate) = 1 − (1 − j^r)^b for b
    * bands of r rows) measured on the actual corpus with the actual
    * banding configuration. The number that justifies a screen before
    * anyone trusts it to gate 100 TB: recall must be ~1 above the
    * dedup threshold and is EXPECTED to fall away below it (that
    * fall-off is the screen's selectivity, not a defect).
    *
    * Truth = [[ngramJaccardPairs]] at `truthThreshold` (exact, itself
    * SQL-oracled); screen = [[minhashCandidatePairs]] with the given
    * banding. Output schema is SELF-DESCRIBING per row kind — every
    * row is (screen, kind, bucket, n_denom, n_num, ratio):
    * `kind = 'recall'` rows carry one 0.1-wide Jaccard bucket
    * (bucket = j_lo, ratio = true pairs recalled); the
    * `kind = 'precision'` row (bucket = -1) is the candidate
    * efficiency — n_denom candidates emitted, n_num of them true
    * (the verify stage's workload). The kinds denominate over
    * DIFFERENT universes (truth pairs vs emitted candidates), which
    * is why they are labeled instead of sharing recall-named columns.
    *
    * Shape: both relations are the operators' own (bucket joins,
    * never all-pairs); the evaluation adds ONE pair-keyed left join
    * truth⋈screen + ONE ≤11-group aggregate. Rows-only by
    * construction (the screen is hash-family-specific); the planted
    * spec pins exact-dup recall = 1. */
  def screenEval(docs: DataFrame, textCol: String, idCol: String,
                 truthThreshold: Double = 0.5, ngram: Int = 3,
                 numHashes: Int = 32, bands: Int = 8,
                 portableHash: Boolean = false): DataFrame = {
    // truth feeds BOTH the recall buckets and the efficiency row —
    // without a cut the exact posting-list join runs twice per plan
    // (pair-sized result, so the materialization is bounded)
    val truth = ngramJaccardPairs(docs, textCol, idCol, ngram,
      truthThreshold)
      .localCheckpoint()
    val screen = minhashCandidatePairs(docs, textCol, idCol, numHashes,
        bands, ngram, portableHash = portableHash)
      .select(col("id_a").as("doc1"), col("id_b").as("doc2"),
        lit(1L).as("hit"))
      .localCheckpoint()
    val joined = truth.join(screen, Seq("doc1", "doc2"), "left")
    val buckets = joined
      .groupBy(floor(col("jaccard") * 10).cast("int").as("j_lo10"))
      .agg(count(lit(1)).as("n_denom"),
        coalesce(sum(col("hit")), lit(0L)).as("n_num"))
      .select(lit("minhash").as("screen"), lit("recall").as("kind"),
        TextFunctions.round4(col("j_lo10") / 10.0).as("bucket"),
        col("n_denom"), col("n_num"),
        TextFunctions.round4(col("n_num").cast("double") /
          greatest(col("n_denom"), lit(1L))).as("ratio"))
    val efficiency = screen
      .join(truth.select(col("doc1"), col("doc2"), lit(1L).as("t")),
        Seq("doc1", "doc2"), "left")
      .agg(count(lit(1)).as("n_denom"), // candidates emitted
        coalesce(sum(col("t")), lit(0L)).as("n_num")) // of them, true
      .select(lit("minhash").as("screen"), lit("precision").as("kind"),
        lit(-1.0).as("bucket"), col("n_denom"), col("n_num"),
        TextFunctions.round4(col("n_num").cast("double") /
          greatest(col("n_denom"), lit(1L))).as("ratio"))
    buckets.unionByName(efficiency)
  }

  /** C70 eval — the edit-distance screen's measured recall against
    * EXACT levenshtein truth, per distance bucket: the PassJoin
    * grid's declared indel/short-key recall gap as a NUMBER (one row
    * per distance 0..maxDist in the [[screenEval]] schema —
    * screen = 'edit', kind = 'recall', bucket = distance). Screen
    * precision is 1 by construction ([[editDistancePairs]]
    * exact-verifies every candidate), so no precision row.
    *
    * Truth is complete by construction without a cross join: two keys
    * within `maxDist` edits differ by ≤ maxDist in length, so the
    * SHORTER key probes each length len..len+maxDist and pairs come
    * from an equi-join on (probed length = other key's length), with
    * equal-length pairs kept once via id order. COST: exact truth is
    * inherently quadratic in the largest same-length key cohort
    * (full-length keys all share length = keyLen) — this is an EVAL
    * operator for sampled / planted corpora; the screen itself is the
    * scale path. */
  def editScreenEval(docs: DataFrame, textCol: String, idCol: String,
                     maxDist: Int = EditMaxDist,
                     keyLen: Int = EditKeyLen): DataFrame = {
    val keys = docs.select(col(idCol).as("id"),
        substring(col(textCol), 1, keyLen).as("key"))
      .withColumn("len", length(col("key")))
    val probes = keys.select(col("id").as("id_a"), col("key").as("ka"),
      col("len").as("la"),
      explode(sequence(col("len"), col("len") + maxDist)).as("lb"))
    // THRESHOLDED levenshtein (the 3-arg banded form, -1 past the
    // bound): the truth pass visits every same-length-band pair, so
    // the O(maxDist·keyLen) band beats the O(keyLen²) full matrix
    // ~keyLen/(2·maxDist+1)× — measured 34.8 s → ~3 s at the 1000-doc
    // gate window with identical output (exact distance for every
    // within-bound pair)
    val truth = probes
      .join(keys.select(col("id").as("id_b"), col("key").as("kb"),
        col("len").as("lb")), "lb")
      .filter(col("la") < col("lb") ||
        (col("la") === col("lb") && col("id_a") < col("id_b")))
      .withColumn("dist", levenshtein(col("ka"), col("kb"), maxDist))
      .filter(col("dist") >= 0)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        col("dist").cast("int").as("dist"))
    val screen = editDistancePairs(docs, textCol, idCol, maxDist, keyLen)
      .select(col("id_a"), col("id_b"), lit(1L).as("hit"))
    truth.join(screen, Seq("id_a", "id_b"), "left")
      .groupBy(col("dist"))
      .agg(count(lit(1)).as("n_denom"),
        coalesce(sum(col("hit")), lit(0L)).as("n_num"))
      .select(lit("edit").as("screen"), lit("recall").as("kind"),
        col("dist").cast("double").as("bucket"),
        col("n_denom"), col("n_num"),
        TextFunctions.round4(col("n_num").cast("double") /
          greatest(col("n_denom"), lit(1L))).as("ratio"))
  }

  /** Anchors [[maximalSpans]]' `maxDocFreq` cap dropped, with their
    * occurrence counts — every lossy cap gets an accounting
    * relation. */
  def spanDroppedAnchors(docs: DataFrame, textCol: String, idCol: String,
                         anchorK: Int = SpanAnchorK, modP: Int = SpanModP,
                         maxDocFreq: Int = 20): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    preCapSpanAnchors(toks, anchorK, modP)
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq)
  }
}
