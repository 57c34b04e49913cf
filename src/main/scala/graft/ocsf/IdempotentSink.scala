package graft.ocsf

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Exactly-once per (route, batch) parquet landing (SURVEY.md §2 A24).
  *
  * The plain `mode("append")` fan-out is at-least-once across a crash
  * MID-batch: Structured Streaming replays the whole micro-batch with
  * the same batchId, re-appending files for routes that already
  * finished. The reference tolerates the same window via Firehose
  * retry idempotence (/root/reference/README.md:34-46); here the
  * window is closed with a two-phase commit, every step of which is
  * idempotent under replay:
  *
  *  1. STAGE — write the batch's files (final partition layout) under
  *     a per-ATTEMPT dir `table/_staging/batch_<id>/g<gen>/`. `gen` is
  *     a process-wide generation counter per (table, batch), so a
  *     replayed attempt in the same JVM never shares a staging path
  *     with a timed-out attempt it superseded — the two bulk writes
  *     cannot interleave on the same files.
  *  2. MANIFEST — atomically publish the staged file list WITH SIZES
  *     (paths carry the `g<gen>/` component; a count header plus a
  *     `#end` trailer make the format self-terminating, so a torn
  *     publish on a non-atomic store is detectable at ANY cut point,
  *     even one inside the last entry's length digits) as
  *     `_committed_batches/<id>.manifest`
  *     (write-temp-then-rename). Until a VALID manifest exists, a
  *     replay restarts from step 1 under a fresh generation; a
  *     truncated manifest is discarded and replaced under the lock.
  *  3. PROMOTE — move each manifest entry into the table and VERIFY
  *     its length against the manifest. Replays resume: a destination
  *     already at its recorded length means that file already moved; a
  *     destination at the WRONG length is the half-copied residue of a
  *     crashed non-atomic (copy+delete) rename and is deleted and
  *     re-promoted from staging. Nothing is marked done on length
  *     mismatch — copy, verify, only then mark.
  *  4. COMMIT — atomically publish `_committed_batches/<id>.committed`
  *     and delete the batch staging dir (ALL generations). Once this
  *     exists the (route, batch) is done and every later replay
  *     returns without touching data — and sweeps any staging leftovers
  *     an earlier crash orphaned. The in-process bookkeeping for the
  *     (table, batch) — its generation counter and control lock — is
  *     evicted here: the committed marker itself fences any straggler
  *     (and a straggler that races the eviction sees a freshly-zeroed
  *     generation counter, which can never equal its own generation).
  *
  * Concurrent attempts for the same (table, batch) — the timed-out
  * route future the streaming layer abandoned racing the replayed
  * batch — are serialized at the CONTROL steps (manifest publish,
  * promote, commit run under one in-process lock per key) and the
  * stale attempt is rejected there with [[SupersededAttemptException]]
  * before it can publish or promote anything. Only the bulk staging
  * write runs unlocked, and it targets a generation-unique dir. The
  * control steps are metadata-only (a handful of renames), so holding
  * the lock through them cannot wedge on data volume. A superseded
  * attempt whose staging write straggles past the winner's cleanup can
  * leave an orphaned `_staging` dir behind; it is invisible to readers
  * (underscore-prefixed) and swept by the next replay of any committed
  * batch for that table.
  *
  * OBJECT-STORE SAFETY — the committed manifests are the READ
  * CONTRACT, not just bookkeeping: [[committedFiles]] returns exactly
  * the data files of committed batches, and [[OcsfTables.load]] reads
  * a batch-committed table through it (`basePath`-anchored, so
  * partition columns and pruning still work). A store whose rename is
  * copy+delete (S3A) can crash between the copy and the delete, or
  * mid-copy; either way the replay repairs the file (length-verified
  * re-promote) and readers-by-manifest see each row exactly once at
  * every point — they never see uncommitted, duplicated, or truncated
  * objects, because they only ever open the exact paths a committed
  * manifest names. Directory-scanning readers outside this contract
  * (e.g. Athena over the same prefix) keep the weaker pre-existing
  * guarantee: staged state is invisible (underscore-prefixed) but a
  * mid-promote batch may be partially visible until its marker lands.
  * Control files are write-once: existence of `.committed` implies a
  * fully promoted, length-verified batch on any store, and manifest
  * validity is self-checked via the count header + `#end` trailer.
  *
  * CONCURRENCY CONTRACT — one writer per (table, WRITER NAMESPACE),
  * not one writer per table. The stream owns the default namespace
  * (pair names are bare batch ids; Structured Streaming's checkpoint
  * lease forbids a second query on the same checkpoint). A backfill
  * running BESIDE the live stream passes a `writerId`: its control
  * pairs land as `w-<writerId>-<batchId>`, its staging dirs are
  * namespace-unique, and the two writers never share a control file,
  * a staging path, or an in-process lock key — so neither can skip,
  * overwrite, or silently drop the other's rows. Readers by manifest
  * see the union. The attempt lock is per-JVM and per-namespace:
  * TWO drivers in the SAME namespace are still out of contract (they
  * would race the manifest publish and one side's rows could be
  * silently dropped) — give every concurrent job its own writerId.
  *
  * Control files are one pair per batch: O(batches) small objects per
  * table. At streaming cadence over months, run [[compactCommits]] to
  * merge them into one pair — the read contract only requires that
  * the set of (manifest, committed) pairs names every live data file
  * exactly once, and [[committedFiles]] dedups on final paths, so the
  * compaction's publish-then-delete windows are reader-safe at every
  * crash point. Foreign-writer (`w-*`) pairs are NEVER folded by
  * default — a replay of that writer checks its own pair name, and
  * folding it away would make the replay restage and duplicate rows;
  * pass `foldWriters` once a backfill is retired (will never re-run)
  * to merge its pairs into the compacted history.
  */
object IdempotentSink {

  /** Thrown by a (route, batch) attempt that lost the generation race:
    * a newer replay of the same batch began after this attempt's
    * `writeBatch` call. The loser must not publish a manifest, promote
    * or commit — the winner owns the batch. */
  final class SupersededAttemptException(msg: String)
      extends RuntimeException(msg)

  /** Latest attempt generation per (qualified table dir, batchId).
    * Entries live only while the batch is in flight — evicted on
    * commit, so a year-long streaming query holds at most the
    * in-flight batches, not its whole history. */
  private val generations = new ConcurrentHashMap[String, AtomicLong]()

  /** Process-wide generation sequence: every attempt — across ALL
    * (table, batch) keys and across evict/recreate cycles — draws a
    * UNIQUE generation. A per-key counter restarted at 1 after
    * eviction could hand a post-evict replay the same gen a
    * first-attempt straggler still holds, letting the straggler pass
    * the fence; a globally unique gen can never collide. */
  private val genSeq = new AtomicLong(0L)

  /** Control-step lock per (qualified table dir, batchId). Evicted on
    * commit together with [[generations]]. */
  private val controlLocks = new ConcurrentHashMap[String, Object]()

  private def genCounter(key: String): AtomicLong =
    generations.computeIfAbsent(key, _ => new AtomicLong(0L))
  private[ocsf] def lockFor(key: String): Object =
    controlLocks.computeIfAbsent(key, _ => new Object)

  /** Drop the in-process bookkeeping for a committed (table, batch).
    * Safe even with a straggler attempt still running: its next
    * control step either sees the committed marker (no-op return) or
    * finds its generation entry gone ([[checkCurrent]] treats a
    * missing entry as superseded WITHOUT recreating it, and drops the
    * lock entry the straggler's `lockFor` may have just recreated), so
    * the race leaves no permanent per-(table, batch) residue. */
  private def evict(key: String): Unit = {
    generations.remove(key)
    controlLocks.remove(key)
    ()
  }

  /** In-flight bookkeeping keys (spec hook: commit must evict). */
  private[ocsf] def bookkeepingKeys: Set[String] = {
    import scala.jdk.CollectionConverters._
    generations.keySet.asScala.toSet ++ controlLocks.keySet.asScala.toSet
  }

  /** Control-pair base name for a (writer, batch): the stream (empty
    * writerId) owns bare batch ids; any other writer is namespaced as
    * `w-<writerId>-<batchId>`. `writerId` must not contain `-` (it
    * delimits the batch id) and must stay clear of the reserved
    * `compact`/`compactdata` prefixes by construction of the `w-`
    * namespace. */
  private[ocsf] def pairName(writerId: String, batchId: Long): String = {
    require(writerId.matches("[A-Za-z0-9_.]*"),
      s"writerId must match [A-Za-z0-9_.]* (got '$writerId')")
    if (writerId.isEmpty) batchId.toString else s"w-$writerId-$batchId"
  }

  /** The writerId of a namespaced pair name, None for stream batches
    * and compaction pairs. */
  private[ocsf] def writerIdOf(pair: String): Option[String] =
    if (!pair.startsWith("w-")) None
    else {
      val rest = pair.stripPrefix("w-")
      val i = rest.lastIndexOf('-')
      if (i > 0) Some(rest.substring(0, i)) else None
    }

  private[ocsf] def attemptKey(fs: FileSystem, tableDir: Path, batchId: Long): String =
    attemptKey(fs, tableDir, pairName("", batchId))

  private[ocsf] def attemptKey(fs: FileSystem, tableDir: Path, pair: String): String =
    s"${fs.makeQualified(tableDir)}#$pair"

  /** Idempotently land one route's slice of a micro-batch. Safe to
    * call again for the same (route, writerId, batchId) after a crash
    * OR timeout at ANY point — the replay either skips (already
    * committed), resumes the promote, or restages under a fresh
    * generation while the superseded attempt is fenced off at its next
    * control step.
    *
    * `writerId` namespaces this writer's commit log (see the
    * concurrency contract above): a backfill job writing beside the
    * live stream passes its own id (e.g. `"backfill20260813"`) and the
    * two writers share nothing — control pairs, staging dirs and locks
    * are all namespace-unique. The default empty id is the stream's
    * namespace. */
  def writeBatch(df: DataFrame, baseDir: String, route: String,
                 region: String, accountId: String, batchId: Long,
                 filesPerDay: Int = 0, writerId: String = ""): Unit = {
    val tableDir = new Path(s"$baseDir/${OcsfSink.tableName(route)}")
    val fs = tableDir.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    val pair = pairName(writerId, batchId)
    val gen = beginAttempt(fs, tableDir, pair)
    runAttempt(df, fs, tableDir, route, region, accountId, pair,
      filesPerDay, gen)
  }

  /** Registers a new attempt generation, superseding any in-flight
    * attempt for the same (table, batch). The generation is drawn from
    * the process-wide [[genSeq]], so it is unique across evictions —
    * a recreated entry can never equal a straggler's old gen.
    * Package-private so the spec can model a timed-out attempt racing
    * its replay. */
  private[ocsf] def beginAttempt(fs: FileSystem, tableDir: Path,
                                 batchId: Long): Long =
    beginAttempt(fs, tableDir, pairName("", batchId))

  private[ocsf] def beginAttempt(fs: FileSystem, tableDir: Path,
                                 pair: String): Long = {
    val g = genSeq.incrementAndGet()
    // max-accumulate, not set: two racing beginAttempts must leave the
    // NEWEST gen current whichever order their writes land
    genCounter(attemptKey(fs, tableDir, pair))
      .accumulateAndGet(g, (a, b) => math.max(a, b))
    g
  }

  /** Fences a stale attempt at a control step. A MISSING generation
    * entry means the batch committed and was evicted while this
    * straggler was in flight: fence it without recreating the entry
    * (a `computeIfAbsent` here would leak a zeroed counter forever in
    * exactly the timeout-race case eviction targets), and drop the
    * lock entry the straggler's own `lockFor` just recreated. */
  private[ocsf] def checkCurrent(key: String, gen: Long, route: String,
                                 pair: String): Unit = {
    val counter = generations.get(key)
    if (counter == null) {
      controlLocks.remove(key)
      throw new SupersededAttemptException(
        s"attempt g$gen for route=$route batch=$pair raced the commit " +
          "of a newer replay (bookkeeping already evicted); aborting")
    }
    if (counter.get() != gen)
      throw new SupersededAttemptException(
        s"attempt g$gen for route=$route batch=$pair was superseded " +
          "by a newer replay of the same batch; aborting without publishing")
  }

  private[ocsf] def runAttempt(df: DataFrame, fs: FileSystem, tableDir: Path,
                               route: String, region: String,
                               accountId: String, batchId: Long,
                               filesPerDay: Int, gen: Long): Unit =
    runAttempt(df, fs, tableDir, route, region, accountId,
      pairName("", batchId), filesPerDay, gen)

  /** The body of one attempt at a fixed generation. Package-private
    * for the superseded-attempt spec. */
  private[ocsf] def runAttempt(df: DataFrame, fs: FileSystem, tableDir: Path,
                               route: String, region: String,
                               accountId: String, pair: String,
                               filesPerDay: Int, gen: Long): Unit = {
    val key = attemptKey(fs, tableDir, pair)
    val committed = new Path(tableDir, s"_committed_batches/$pair.committed")
    val manifest = new Path(tableDir, s"_committed_batches/$pair.manifest")
    val batchStaging = new Path(tableDir, s"_staging/batch_$pair")
    def currentManifest(): Option[Seq[(String, Long)]] =
      if (fs.exists(manifest)) readManifest(fs, manifest) else None
    if (fs.exists(committed)) {
      // already done: sweep any staging dir a pre-commit crash (or a
      // straggling superseded attempt) orphaned, then no-op
      fs.delete(batchStaging, true)
      evict(key)
      return
    }
    if (currentManifest().isEmpty) {
      val genDir = new Path(batchStaging, s"g$gen")
      val tStage = System.nanoTime()
      OcsfSink.partitionedFrame(df, region, accountId, filesPerDay).write
        .mode("overwrite")
        .partitionBy("region", "accountId", "eventDay")
        .parquet(genDir.toString)
      if (sys.env.contains("GRAFT_SINK_TIMING"))
        System.err.println(s"[graft-timing] $route $pair stage " +
          s"${(System.nanoTime() - tStage) / 1000000} ms")
      val entries = listRelative(fs, genDir)
        .map { case (rel, len) => (s"g$gen/$rel", len) }
      lockFor(key).synchronized {
        checkCurrent(key, gen, route, pair)
        if (currentManifest().isEmpty) {
          // a torn manifest from a crashed non-atomic publish blocks
          // the write-once rename: discard it before republishing
          if (fs.exists(manifest)) fs.delete(manifest, false)
          writeAtomic(fs, manifest, manifestBody(entries))
        }
      }
    }
    lockFor(key).synchronized {
      checkCurrent(key, gen, route, pair)
      if (fs.exists(committed)) {
        fs.delete(batchStaging, true); evict(key); return
      }
      val entries = currentManifest().getOrElse(throw new IllegalStateException(
        s"manifest unreadable after publish: $manifest (route=$route batch=$pair)"))
      val tPromote = System.nanoTime()
      entries.foreach { case (rel, len) =>
        promoteOne(fs, batchStaging, tableDir, rel, len, route, pair)
      }
      writeAtomic(fs, committed, "")
      fs.delete(batchStaging, true)
      if (sys.env.contains("GRAFT_SINK_TIMING"))
        System.err.println(s"[graft-timing] $route $pair promote " +
          s"${(System.nanoTime() - tPromote) / 1000000} ms (${entries.size} files)")
      evict(key)
    }
    ()
  }

  /** Move one staged file to its final path and VERIFY the landed
    * length against the manifest (copy, verify, only then treat as
    * done). Idempotent under replay on stores with non-atomic
    * (copy+delete) rename: a complete destination is accepted as
    * already promoted, a half-copied destination is deleted and
    * re-promoted from the still-present source. The source-presence
    * check runs BEFORE any destination delete: if the length
    * mismatches and staging is gone too, the landed bytes are the only
    * copy left — preserve them and fail loudly rather than deleting
    * the evidence and wedging every replay on "staged file lost". */
  private def promoteOne(fs: FileSystem, batchStaging: Path, tableDir: Path,
                         rel: String, len: Long, route: String,
                         batch: String): Unit = {
    val src = new Path(batchStaging, rel)
    // drop the g<gen>/ attempt component: files land at the same
    // table-relative path whichever generation staged them
    val dst = new Path(tableDir, finalRelPath(rel))
    def dstComplete: Boolean =
      fs.exists(dst) && fs.getFileStatus(dst).getLen == len
    if (dstComplete) return
    if (!fs.exists(src))
      throw new IllegalStateException(
        s"staged file lost before promote: $rel (route=$route batch=$batch)" +
          (if (fs.exists(dst)) s"; incomplete destination $dst PRESERVED for inspection"
           else ""))
    if (fs.exists(dst)) fs.delete(dst, false) // torn copy residue
    fs.mkdirs(dst.getParent)
    fs.rename(src, dst)
    if (!dstComplete)
      throw new IllegalStateException(
        s"promote failed or landed incomplete: $src -> $dst " +
          s"(route=$route batch=$batch)")
    ()
  }

  private def finalRelPath(rel: String): String =
    rel.split('/').drop(1).mkString("/")

  /** True if the table has a batch-commit log with at least one
    * committed batch — i.e. [[committedFiles]] is its read contract. */
  def hasCommitLog(fs: FileSystem, tableDir: Path): Boolean = {
    val cb = new Path(tableDir, "_committed_batches")
    fs.exists(cb) && fs.listStatus(cb).exists(
      _.getPath.getName.endsWith(".committed"))
  }

  /** The read contract of a batch-committed table: the exact final
    * data-file paths of every COMMITTED batch, from the committed
    * manifests. Readers opening precisely these paths see each row
    * exactly once on any store — uncommitted batches, staging dirs,
    * torn-rename residue and straggler leftovers are simply never
    * named. One directory listing + one small read per batch. */
  def committedFiles(fs: FileSystem, tableDir: Path): Seq[Path] =
    readContract(fs, tableDir)._1

  /** The committed read contract as a DISTRIBUTED relation — the
    * 100 TB twin of [[committedFiles]]: one row per live committed
    * data file, `(file, len)` with `file` in canonical
    * [[normalizePath]] form (what the [[StatsIndex]] rows key on, so
    * pruning is a plain equi-join).
    *
    * Driver cost is O(live control PAIRS) — one LIST of the control
    * dir for names and markers, never a manifest body: the manifests
    * themselves are fetched and parsed in EXECUTORS (one GET each,
    * spread across the cluster), and dead-pair exclusion (the
    * `supersedes` graph) is a distributed anti-join. The file universe
    * therefore never materializes on the driver — a reader composes
    * this with [[StatsIndex.pruneDF]] and collects only the SURVIVING
    * paths ([[OcsfTables.loadWhere]]), which is the pre-Delta-style
    * metadata bottleneck [[committedFiles]] has at millions of files
    * solved the way Delta's checkpoint reader solves it: log parsing
    * as a Spark job.
    *
    * Failure contract matches the driver path: a committed marker
    * whose manifest is missing gets ONE fresh relisting before
    * raising (racing an in-band compaction), an unreadable committed
    * manifest raises [[IllegalStateException]] (from the executor —
    * committed data must never silently drop out of contract), and a
    * manifest that VANISHES between the driver's listing and an
    * executor's read raises the racing-compaction error. Lazy like
    * any DataFrame: the listing snapshot is taken at CALL time, the
    * GETs run per action — compose and collect promptly, against a
    * quiet table. */
  def committedFilesDF(spark: org.apache.spark.sql.SparkSession,
                       tableDir: Path): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat, lit}
    import spark.implicits._
    val fs = tableDir.getFileSystem(spark.sessionState.newHadoopConf())
    val cb = new Path(tableDir, "_committed_batches")
    def listing(): (Seq[String], Set[String]) =
      if (!fs.exists(cb)) (Seq.empty, Set.empty)
      else {
        val names = fs.listStatus(cb).map(_.getPath.getName)
        (names.filter(_.endsWith(".manifest"))
          .map(_.stripSuffix(".manifest")).toSeq.sorted,
          names.filter(_.endsWith(".committed"))
            .map(_.stripSuffix(".committed")).toSet)
      }
    var (manifests, done) = listing()
    if ((done -- manifests.toSet).nonEmpty) { // racing a compaction? reread
      val again = listing(); manifests = again._1; done = again._2
      val orphan = done -- manifests.toSet
      if (orphan.nonEmpty) throw new IllegalStateException(
        s"committed marker(s) without manifest under $cb: " +
          s"${orphan.toSeq.sorted.mkString(", ")} — committed data " +
          "would be invisible to readers; restore the manifest(s)")
    }
    val committedPairs = manifests.filter(done)
    if (committedPairs.isEmpty)
      return Seq.empty[(String, Long)].toDF("file", "len")
    // ship the Hadoop conf as plain KVs (SerializableConfiguration is
    // private[spark]); executors rebuild it so s3a/hdfs credentials
    // and endpoints survive the hop
    val confKVs: Array[(String, String)] = {
      val it = spark.sessionState.newHadoopConf().iterator()
      val b = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
      b.result()
    }
    val cbUri = fs.makeQualified(cb).toUri.toString
    val baseKey = normalizePath(fs, tableDir)
    // (pair, rel, len) entry rows + (pair, superseded) edge rows from
    // ONE parse per manifest, GETs spread over the cluster
    val rows = spark.createDataset(committedPairs)
      .repartition(math.min(committedPairs.size,
        math.max(1, spark.sparkContext.defaultParallelism)))
      .mapPartitions { pairs =>
        val c = new org.apache.hadoop.conf.Configuration(false)
        confKVs.foreach { case (k, v) => c.set(k, v) }
        val cbPath = new Path(new java.net.URI(cbUri))
        val tfs = cbPath.getFileSystem(c)
        pairs.flatMap { pair =>
          val mp = new Path(cbPath, s"$pair.manifest")
          val md =
            try readManifestFull(tfs, mp)
            catch {
              case _: java.io.FileNotFoundException =>
                throw new IllegalStateException(
                  s"manifest $pair vanished between listing and read " +
                    "under " + cbUri + " — a compaction is racing this " +
                    "reader; re-run against a quiet table")
            }
          val m = md.getOrElse(throw new IllegalStateException(
            s"committed manifest unreadable: $cbUri/$pair.manifest"))
          m.entries.iterator.map { case (rel, len) =>
            (pair, finalRelPath(rel), len, null.asInstanceOf[String])
          } ++ m.supersedes.iterator.map(s =>
            (pair, null.asInstanceOf[String], 0L, s))
        }
      }.toDF("pair", "rel", "len", "superseded")
    // dead-pair exclusion includes dead manifests' own supersedes sets
    // (every committed manifest's edges are present), matching the
    // interrupted-cleanup-chain semantics of the driver path
    val dead = rows.filter(col("superseded").isNotNull)
      .select(col("superseded").as("dead_pair")).distinct()
    rows.filter(col("rel").isNotNull)
      .join(dead, col("pair") === col("dead_pair"), "left_anti")
      .select(concat(lit(baseKey + "/"), col("rel")).as("file"), col("len"))
      .distinct()
  }

  /** Final data-file paths named by ANY parseable manifest — committed
    * or still in flight. The superset [[OcsfTables.load]] checks a
    * directory scan against to detect out-of-contract plain appends:
    * a file at a final path that no manifest names was never written
    * through this sink and would be silently invisible to readers-by-
    * manifest. (An UNCOMMITTED manifest's files are a legitimate
    * transient — a mid-promote batch — and must not trip the guard.) */
  def manifestedFiles(fs: FileSystem, tableDir: Path): Set[Path] =
    readContract(fs, tableDir)._2

  /** One listing + one parse per manifest feeding BOTH contract views:
    * `_1` the committed read contract ([[committedFiles]] semantics),
    * `_2` every final path any parseable manifest names (the
    * [[manifestedFiles]] stray-guard superset) — so a reader pays the
    * control-file LIST/GET tax once, not per view.
    *
    * The orphan-marker check (a `.committed` whose manifest is gone =
    * committed data silently out of contract) and manifest OPENS both
    * retry on ONE fresh listing before failing: a concurrent in-band
    * compaction can delete a pair's marker and manifest between a
    * reader's (paginated) LIST and its GETs, making a pair look
    * orphaned — or its manifest open throw FileNotFoundException —
    * when the directory never actually held that state. */
  def readContract(fs: FileSystem, tableDir: Path): (Seq[Path], Set[Path]) = {
    val parsed = scanPairs(fs, tableDir)
    val named = parsed
      .flatMap(_._3.map(_.entries).getOrElse(Seq.empty))
      .map { case (rel, _) =>
        fs.makeQualified(new Path(tableDir, finalRelPath(rel)))
      }.toSet
    (committedLive(tableDir, parsed)
      .flatMap(_._2.entries)
      .map { case (rel, _) => new Path(tableDir, finalRelPath(rel)) }
      .distinct, named)
  }

  /** One listing + parse of the whole control directory — the shared
    * core under [[readContract]] and [[liveCommittedPairs]]: every
    * manifest as (pair name, has a committed marker?, parsed content),
    * with the orphan-marker check and ONE reread when a concurrent
    * compaction races the listing (a pair's marker and manifest can be
    * deleted between a paginated LIST and its GETs, making the pair
    * look orphaned — or its manifest open throw — when the directory
    * never actually held that state). */
  private def scanPairs(fs: FileSystem, tableDir: Path)
      : Seq[(String, Boolean, Option[ManifestData])] = {
    val cb = new Path(tableDir, "_committed_batches")
    // Left(Some(names)) = committed markers without manifests;
    // Left(None) = a manifest vanished between LIST and GET (race)
    def attempt(): Either[Option[Set[String]],
                          Seq[(String, Boolean, Option[ManifestData])]] = {
      if (!fs.exists(cb)) return Right(Seq.empty)
      val entries = fs.listStatus(cb).map(_.getPath)
      val done = entries.filter(_.getName.endsWith(".committed"))
        .map(_.getName.stripSuffix(".committed")).toSet
      val parsed =
        try entries.toSeq
          .filter(_.getName.endsWith(".manifest"))
          .sortBy(_.getName)
          .map { m =>
            val n = m.getName.stripSuffix(".manifest")
            (n, done.contains(n), readManifestFull(fs, m))
          }
        catch { case _: java.io.FileNotFoundException => return Left(None) }
      val orphan = done -- parsed.map(_._1).toSet
      if (orphan.nonEmpty) return Left(Some(orphan))
      Right(parsed)
    }
    attempt() match {
      case Right(r) => r
      case Left(_) => attempt() match { // one reread: racing a compaction?
        case Right(r) => r
        case Left(Some(orphan)) => throw new IllegalStateException(
          s"committed marker(s) without manifest under $cb: " +
            s"${orphan.toSeq.sorted.mkString(", ")} — committed data " +
            "would be invisible to readers; restore the manifest(s)")
        case Left(None) => throw new IllegalStateException(
          s"manifests under $cb kept vanishing between listing and read — " +
            "a compaction is racing this reader; re-run against a quiet table")
      }
    }
  }

  /** The live committed pairs of a [[scanPairs]] result: committed
    * manifests that no other committed manifest supersedes. A pair
    * named in ANY committed manifest's supersedes set is dead — its
    * rows live in the superseding manifest's files; the union includes
    * dead manifests' own supersedes sets, so an interrupted cleanup
    * chain (A superseded {1,2}, B superseded {A}) keeps 1 and 2
    * excluded while they linger. */
  private def committedLive(tableDir: Path,
                            parsed: Seq[(String, Boolean, Option[ManifestData])])
      : Seq[(String, ManifestData)] = {
    val committed = parsed.collect { case (n, true, md) =>
      n -> md.getOrElse(throw new IllegalStateException(
        s"committed manifest unreadable: $tableDir/_committed_batches/$n.manifest"))
    }
    val superseded = committed.iterator.flatMap(_._2.supersedes).toSet
    committed.filterNot { case (n, _) => superseded.contains(n) }
  }

  /** Live COMMITTED pairs — (pair name, parsed manifest) for every
    * committed batch or compaction pair that no other committed
    * manifest supersedes. The per-pair view behind the time-travel /
    * incremental readers ([[filesAsOf]], [[filesSince]]). */
  private[ocsf] def liveCommittedPairs(
      fs: FileSystem, tableDir: Path): Seq[(String, ManifestData)] =
    committedLive(tableDir, scanPairs(fs, tableDir))

  /** Splits live committed pairs into (compaction pairs, per-batch
    * pairs keyed by numeric STREAM batch id, foreign-writer `w-*`
    * pairs). Writer pairs are off the stream's batch axis: their batch
    * ids count a different writer's progress, so they must neither
    * masquerade as compaction folds (which would wrongly engage the
    * time-travel horizon check) nor be ordered against stream ids. */
  private def splitPairs(live: Seq[(String, ManifestData)])
      : (Seq[(String, ManifestData)], Seq[(Long, ManifestData)],
         Seq[(String, ManifestData)]) = {
    val (writerPairs, rest) = live.partition(_._1.startsWith("w-"))
    val (batches, folded) = rest.partition(_._1.toLongOption.isDefined)
    (folded, batches.map { case (n, md) => n.toLong -> md }, writerPairs)
  }

  /** The oldest batch id at which per-batch history is still intact, or
    * None when a compaction exists whose coverage cannot be bounded.
    *
    * Invariant this rests on: streaming batch ids are monotonic and
    * every compaction folds ALL live pairs up to its `maxBatchId`
    * bound, so the folded set is always a PREFIX of history — every
    * folded batch id is strictly below every live per-batch id. The
    * floor is therefore `minLiveBatchId - 1` (conservative: the true
    * fold horizon may be lower), falling back to the compaction pairs'
    * own coverage — the `#maxbatch` header every fold writes (carried
    * transitively across chained folds), or the largest numeric id in
    * their `#supersedes` headers — when no per-batch pair survives at
    * all. */
  private def horizonFloor(folded: Seq[(String, ManifestData)],
                           batches: Seq[(Long, ManifestData)]): Option[Long] =
    batches.map(_._1).minOption.map(_ - 1).orElse(
      folded.flatMap(p =>
        p._2.maxBatch ++ p._2.supersedes.flatMap(_.toLongOption)).maxOption)

  private def requireAboveHorizon(folded: Seq[(String, ManifestData)],
                                  batches: Seq[(Long, ManifestData)],
                                  requested: Long, what: String,
                                  tableDir: Path): Unit =
    if (folded.nonEmpty) {
      val floor = horizonFloor(folded, batches).getOrElse(
        throw new IllegalStateException(
          s"$what=$requested unavailable under $tableDir: compaction has " +
            "folded the entire per-batch history and its coverage cannot " +
            "be bounded from the surviving headers"))
      require(requested >= floor,
        s"$what=$requested is below the compaction horizon ($floor) under " +
          s"$tableDir: compaction folded those batches' manifests, so " +
          "per-batch granularity is gone (run compaction less often, or " +
          "checkpoint consumers faster, to keep more history)")
    }

  /** Snapshot read contract AS OF a batch: the final data-file paths of
    * every committed batch with id <= `asOfBatch`. Compaction trades
    * history for control-file count — below its horizon only the
    * folded (latest) view exists, and this THROWS rather than serving
    * a wrong snapshot. Metadata-only: same one-LIST + one-GET-per-pair
    * cost as [[committedFiles]]. */
  def filesAsOf(fs: FileSystem, tableDir: Path, asOfBatch: Long): Seq[Path] = {
    val (folded, batches, writers) = splitPairs(liveCommittedPairs(fs, tableDir))
    requireAboveHorizon(folded, batches, asOfBatch, "asOfBatch", tableDir)
    // writer pairs (backfills) are off the stream batch axis: their
    // rows are base state, included at every snapshot — a backfill
    // loads HISTORY, so excluding it from asOf reads would make old
    // snapshots silently lose rows that were always logically there
    (folded.map(_._2) ++ writers.map(_._2) ++ batches.collect {
      case (id, md) if id <= asOfBatch => md
    }).flatMap(_.entries)
      .map { case (rel, _) => new Path(tableDir, finalRelPath(rel)) }
      .distinct
  }

  /** Incremental (CDC-style) read contract: the final data-file paths
    * of committed batches with id > `afterBatch` — what a downstream
    * consumer that already processed through `afterBatch` still needs.
    * Append-only lake, so changes are pure inserts. THROWS when
    * compaction has folded any batch beyond `afterBatch` (the consumer
    * lags the compaction cadence — its unread rows no longer exist at
    * per-batch granularity). */
  def filesSince(fs: FileSystem, tableDir: Path, afterBatch: Long): Seq[Path] = {
    val (folded, batches, _) = splitPairs(liveCommittedPairs(fs, tableDir))
    requireAboveHorizon(folded, batches, afterBatch, "afterBatch", tableDir)
    // foreign-writer (backfill) pairs are NOT emitted here: the cursor
    // is a STREAM batch id and cannot order another writer's pairs.
    // A CDC consumer detects backfills via [[writerPairNames]] and
    // re-syncs (or reads them once by name) — silent interleaving
    // would hand it the same backfill on every poll.
    batches.collect { case (id, md) if id > afterBatch => md }
      .flatMap(_.entries)
      .map { case (rel, _) => new Path(tableDir, finalRelPath(rel)) }
      .distinct
  }

  /** The live committed foreign-writer (`w-<writerId>-<batchId>`)
    * pairs of a table — the backfills a stream-axis CDC consumer
    * ([[filesSince]]) does not see. Poll it beside `filesSince`: a
    * name appearing here is a completed backfill batch to ingest once
    * (its files come from the pair's manifest via
    * [[committedFiles]]-style reads); names are stable until an
    * operator retires them via `compactCommits(foldWriters = ...)`. */
  def writerPairNames(fs: FileSystem, tableDir: Path): Seq[String] =
    splitPairs(liveCommittedPairs(fs, tableDir))._3.map(_._1).sorted

  /** Delete one superseded pair — its data files FIRST (skipping any
    * path the live read contract still names: a control-only merge
    * re-owns its inputs' files without rewriting them), then marker,
    * then manifest, so no crash cut strands a file no manifest names
    * or produces the marker-without-manifest state readers reject. */
  private def settlePair(fs: FileSystem, tableDir: Path, n: String,
                         protectedFiles: Set[Path]): Unit = {
    val cb = new Path(tableDir, "_committed_batches")
    readManifestFull(fs, new Path(cb, s"$n.manifest")).foreach(_.entries
      .foreach { case (rel, _) =>
        val p = new Path(tableDir, finalRelPath(rel))
        if (!protectedFiles.contains(fs.makeQualified(p)))
          fs.delete(p, false)
      })
    fs.delete(new Path(cb, s"$n.committed"), false)
    fs.delete(new Path(cb, s"$n.manifest"), false)
  }

  /** Merge the control files of every COMMITTED batch into ONE
    * (manifest, committed) pair named `compact-<k>`, then delete the
    * originals — bounding the O(batches) LIST/GET tax [[committedFiles]]
    * pays at streaming cadence (a 10 s trigger over months is 10⁵–10⁶
    * small control objects per table). OFFLINE maintenance: run it
    * only while no writer is active on the table (the same
    * single-writer contract the sink itself requires).
    *
    * Crash-safe on any store by ordering alone:
    *  1. publish the merged manifest (atomic), 2. publish the merged
    *  marker (atomic), 3. delete original markers, 4. delete original
    *  manifests. Until step 2 the merged manifest is unmarked and
    *  invisible; between 2 and 4 the merged pair and surviving
    *  originals name the same data files twice and [[committedFiles]]'s
    *  final-path distinct keeps the read exactly-once; markers are
    *  deleted BEFORE their manifests so no cut point ever produces a
    *  marker without a manifest (the state [[committedFiles]] rejects
    *  as data loss). A crashed compaction is simply re-run: leftover
    *  unmarked `compact-*` manifests are swept, never reused (the next
    *  attempt takes a fresh `k`).
    *
    * `maxBatchId` bounds WHICH batch pairs may merge: only pairs whose
    * name parses as a batch id <= maxBatchId (compact-* and
    * compactdata-* pairs always may — they hold only previously-folded
    * batches).
    * This is what makes the STREAMING in-band call safe: the streaming
    * checkpoint commits batch N only after foreachBatch(N) returns, so
    * folding N's own pair inside the batch would let a crash-before-
    * checkpoint replay find no pair, restage, and DUPLICATE N's rows
    * beside the merged manifest's. Pass `batchId - 1` from inside a
    * batch; the offline default folds everything.
    *
    * Foreign-writer (`w-<writerId>-<n>`) pairs are folded ONLY for
    * writerIds listed in `foldWriters` — for everyone else they are
    * untouchable for the same replay reason as maxBatchId: that
    * writer's crash replay looks for its OWN pair name, and folding it
    * away would make the replay restage and duplicate its rows. List a
    * writer only once it is RETIRED (its job finished and will never
    * re-run); this is the merge step that absorbs a completed backfill
    * into the compacted history.
    *
    * Returns the number of batch pairs merged (0 = nothing to do). */
  def compactCommits(fs: FileSystem, tableDir: Path,
                     maxBatchId: Long = Long.MaxValue,
                     foldWriters: Set[String] = Set.empty): Int = {
    val cb = new Path(tableDir, "_committed_batches")
    if (!fs.exists(cb)) return 0
    val entries = fs.listStatus(cb).map(_.getPath)
    val manifests = entries.filter(_.getName.endsWith(".manifest"))
      .map(_.getName.stripSuffix(".manifest")).toSet
    val done = entries.filter(_.getName.endsWith(".committed"))
      .map(_.getName.stripSuffix(".committed")).toSet
    // sweep unmarked compact-* manifests (a crashed attempt's step-1
    // leftover; compaction owns this namespace and runs writer-free,
    // so unlike a batch manifest it can never be an in-flight promote).
    // compactdata-* is NOT swept here: those manifests own their data
    // files, and only compactDataFiles knows how to sweep both.
    (manifests -- done).filter(_.startsWith("compact-")).foreach { n =>
      fs.delete(new Path(cb, s"$n.manifest"), false)
    }
    val full = done.toSeq.sorted.map { n =>
      val mp = new Path(cb, s"$n.manifest")
      if (!fs.exists(mp)) throw new IllegalStateException(
        s"committed marker without manifest during compaction: $mp — " +
          "committed data would leave the read contract; restore it")
      n -> readManifestFull(fs, mp).getOrElse(throw new IllegalStateException(
        s"committed manifest unreadable during compaction: $mp"))
    }
    // superseded ghosts are never merged — their rows live in the
    // superseding manifest's files. Their presence is an interrupted
    // cleanup (a crashed compactCommits step 3/4 or compactDataFiles
    // step 6); RESUME it here via the protected-aware settle: a ghost
    // of a control merge shares all its files with the merger (all
    // protected → only control files deleted), a data-compaction
    // ghost's old files are outside the live contract and are removed
    // files-first, so no cut point ever strands a file that trips the
    // stray-append guard. Exclusions are carried forward so ghosts a
    // crash leaves behind stay dead under the merged manifest.
    val ghostExclusions = full.iterator.flatMap(_._2.supersedes).toSet
    val protectedFiles = readContract(fs, tableDir)._1.map(fs.makeQualified).toSet
    ghostExclusions
      .filter(n => manifests.contains(n) || done.contains(n))
      .foreach(settlePair(fs, tableDir, _, protectedFiles))
    val live = full.filterNot { case (n, _) =>
      ghostExclusions.contains(n) ||
        // a batch newer than maxBatchId is untouchable: its streaming
        // checkpoint may not have committed yet (see scaladoc)
        n.toLongOption.exists(_ > maxBatchId) ||
        // a foreign writer's pair is untouchable unless that writer is
        // explicitly retired: its replay checks this pair's existence
        (n.startsWith("w-") && !writerIdOf(n).exists(foldWriters.contains))
    }
    if (live.size < 2) return 0
    val merged = live
      .flatMap(_._2.entries)
      // re-anchor under a dummy attempt component so finalRelPath holds
      .map { case (rel, len) => (s"c/${finalRelPath(rel)}", len) }
      .distinct
    val k = (manifests ++ done).flatMap(n =>
      if (n.startsWith("compact-")) n.stripPrefix("compact-").toIntOption
      else None).maxOption.getOrElse(-1) + 1
    // carry forward only exclusions whose pairs STILL exist after the
    // settle above (the resurrectable ones) — carrying every
    // historical name would grow the supersedes header without bound
    // across repeated compactions (same rule as compactDataFiles)
    val carried = ghostExclusions.filter(n =>
      fs.exists(new Path(cb, s"$n.manifest")) ||
        fs.exists(new Path(cb, s"$n.committed")))
    // coverage carry: the largest batch id this fold (transitively)
    // holds — from the folded batch-pair names, or from an earlier
    // fold's own #maxbatch when an input is itself a compaction pair
    val maxBatch = live.flatMap { case (n, md) =>
      n.toLongOption ++ md.maxBatch
    }.maxOption
    writeAtomic(fs, new Path(cb, s"compact-$k.manifest"),
      manifestBody(merged, live.map(_._1).toSet ++ carried, maxBatch))
    writeAtomic(fs, new Path(cb, s"compact-$k.committed"), "")
    live.foreach { case (n, _) =>
      fs.delete(new Path(cb, s"$n.committed"), false)
      fs.delete(new Path(cb, s"$n.manifest"), false)
    }
    live.size
  }

  /** Rewrite the data files of every committed batch into (at most)
    * `filesPerDay` files per (region, accountId, eventDay) partition —
    * the DATA half of the small-files problem [[compactCommits]] only
    * half-solves: at a 10 s trigger a route accrues ~8.6k batches/day,
    * each with its own parquet files, and reading a day then opens
    * thousands of small objects however few control files remain.
    *
    * OFFLINE maintenance, single operator, no concurrent writer on the
    * table (the same contract as [[compactCommits]]). Readers BY
    * MANIFEST ([[OcsfTables.load]]) are safe at every point; a
    * directory-scanning reader (Athena over the prefix) may see rows
    * doubled during the publish-to-cleanup window and must not run
    * concurrently.
    *
    * Mechanism — the same staged two-phase commit as a batch write,
    * plus the `#supersedes` manifest header:
    *  1. SETTLE: finish any interrupted predecessor — for every pair
    *     named in a committed manifest's supersedes set that still
    *     exists, delete its data files, then its marker, then its
    *     manifest; sweep unmarked `compactdata-*` manifests (deleting
    *     the files they name — never reader-visible) and orphaned
    *     compactdata staging dirs.
    *  2. STAGE: read the rows of all live committed pairs (via the
    *     read contract itself) and write them partitioned to
    *     `_staging/compactdata_<k>/c/`.
    *  3. MANIFEST: publish `compactdata-<k>.manifest` naming the new
    *     files WITH a supersedes line listing every input pair.
    *  4. PROMOTE: length-verified move of each file to its final path
    *     (fresh Spark part-file names — no collision with the old
    *     files, which stay live for readers until step 6).
    *  5. COMMIT: publish `compactdata-<k>.committed`. THIS is the
    *     atomic swap: committedFiles now returns exactly the new
    *     files, because every input pair is superseded by name.
    *  6. CLEANUP: delete the input pairs' old data files, then their
    *     markers, then their manifests (files-first ordering means a
    *     crash can never strand data files that no manifest names,
    *     and markers-before-manifests never produces the
    *     marker-without-manifest state committedFiles rejects). A
    *     crash anywhere re-runs as step 1.
    *
    * `zorderCols` additionally re-lays each day partition along the
    * Morton curve of those columns ([[graft.operators.Zorder]]) —
    * narrow per-file min-max stats on every layout column, the
    * OPTIMIZE-ZORDER maintenance op for the lake's read side.
    *
    * Returns the number of input pairs compacted (0 = nothing to do). */
  def compactDataFiles(spark: org.apache.spark.sql.SparkSession,
                       tableDir: Path, filesPerDay: Int = 1,
                       zorderCols: Seq[String] = Nil): Int = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    require(filesPerDay >= 1, "filesPerDay must be >= 1")
    val fs = tableDir.getFileSystem(spark.sessionState.newHadoopConf())
    val cb = new Path(tableDir, "_committed_batches")
    if (!fs.exists(cb)) return 0
    def listPairs(): (Set[String], Set[String]) = pairNames(fs, cb)
    // 1. settle interrupted predecessors (protected-aware: settlePair
    // never deletes a file the live read contract names)
    settleRewrites(fs, tableDir, cb)

    // 2. stage the rewrite of all live committed pairs — EXCEPT
    // foreign-writer (w-*) pairs: their owner's replay checks the pair
    // by name (rewriting + superseding it would duplicate rows on
    // replay), and leaving them as inputs while reading ALL committed
    // files would double their rows into the new files. Retire a
    // backfill via compactCommits(foldWriters) first; its rows then
    // live in a compact-* pair this rewrite CAN fold.
    val (inputs, deadExclusions) = liveNonWriterPairs(fs, cb)
    // already at the target layout? (filesPerDay files per partition
    // dir) — counts files, not pairs: a control-file merge leaves one
    // pair that can still name thousands of small objects
    val partDirs = inputs.flatMap(_._2.entries.map { case (rel, _) =>
      finalRelPath(rel).split('/').dropRight(1).mkString("/")
    }).toSet
    // With zorderCols set, a file-count-satisfying state only no-ops
    // when the surviving single pair RECORDS the same layout in its
    // manifest (`#layout zorder:...` — written by this rewrite's own
    // output): a hash-compacted, freshly written, or post-delete pair
    // at the target count still holds interleaved rows and must be
    // re-laid. This keeps the maintenance loop idempotent without ever
    // treating "few files" as "clustered files".
    val layoutStr =
      if (zorderCols.isEmpty) None
      else Some("zorder:" + zorderCols.mkString(","))
    if (inputs.isEmpty ||
        ((zorderCols.isEmpty ||
            (inputs.size <= 1 && inputs.forall(_._2.layout == layoutStr))) &&
          inputs.map(_._2.entries.size).sum <= partDirs.size * filesPerDay))
      return 0
    // read exactly the INPUT pairs' files (not all committedFiles):
    // live w-* pairs' rows must not be copied into the rewrite while
    // their own pairs keep naming them
    val files = inputs.flatMap(_._2.entries.map { case (rel, _) =>
      new Path(tableDir, finalRelPath(rel)).toString
    }).distinct
    val k = nextRewriteK(fs, cb)
    val stagingRoot = new Path(tableDir, s"_staging/compactdata_$k")
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val inferOld = spark.conf.get(inferKey, "true")
    try {
      // string partition values round-trip exactly (an accountId with a
      // leading zero must not re-land as a different directory)
      spark.conf.set(inferKey, "false")
      val rows = spark.read.option("basePath", tableDir.toString)
        .parquet(files: _*)
      rewriteLayout(rows, partDirs.size, filesPerDay, zorderCols)
        .write.mode("overwrite")
        .partitionBy("region", "accountId", "eventDay")
        .parquet(new Path(stagingRoot, "c").toString)
    } finally spark.conf.set(inferKey, inferOld)

    // 3.-5. publish, promote, commit. Supersedes carries forward the
    // inputs' own exclusions: if a prior settle deleted a superseding
    // pair but crashed before its ghosts, the ghosts must stay dead
    // under THIS manifest or they would resurrect naming deleted files.
    val entries = listRelative(fs, stagingRoot)
    // same coverage carry as compactCommits: keeps the time-travel
    // horizon boundable when this fold's inputs are compaction pairs
    val maxBatch = inputs.flatMap { case (n, md) =>
      n.toLongOption ++ md.maxBatch
    }.maxOption
    writeAtomic(fs, new Path(cb, s"compactdata-$k.manifest"),
      manifestBody(entries, inputs.map(_._1).toSet ++ deadExclusions, maxBatch,
        layoutStr))
    entries.foreach { case (rel, len) =>
      promoteOne(fs, stagingRoot, tableDir, rel, len, "compactdata", k.toString)
    }
    writeAtomic(fs, new Path(cb, s"compactdata-$k.committed"), "")
    fs.delete(stagingRoot, true)

    // 6. cleanup: the live contract is now exactly the new files —
    // settle every input pair against it (old files first, then
    // markers, then manifests)
    val keep = entries.map { case (rel, _) =>
      fs.makeQualified(new Path(tableDir, finalRelPath(rel)))
    }.toSet
    inputs.foreach { case (n, _) => settlePair(fs, tableDir, n, keep) }
    inputs.size
  }

  private def pairNames(fs: FileSystem, cb: Path): (Set[String], Set[String]) = {
    val es = fs.listStatus(cb).map(_.getPath.getName)
    (es.filter(_.endsWith(".manifest")).map(_.stripSuffix(".manifest")).toSet,
      es.filter(_.endsWith(".committed")).map(_.stripSuffix(".committed")).toSet)
  }

  /** The physical split+order of a data rewrite, shared by
    * [[compactDataFiles]] and [[deleteWhere]]. With `zorderCols`:
    * cluster each day's rows along the Morton curve
    * ([[graft.operators.Zorder]], C34) so per-file min-max stats
    * narrow on EVERY layout column; the file split is the TOP z bits —
    * a z-RANGE cut via an EXPLICIT-count `repartitionByRange` (an
    * implicit repartition would let AQE coalesce the layout away), so
    * clustering survives across files. Without: one file per day, or a
    * deterministic hash split into `filesPerDay`. */
  private def rewriteLayout(rows: org.apache.spark.sql.DataFrame,
                            numPartDirs: Int, filesPerDay: Int,
                            zorderCols: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    if (zorderCols.nonEmpty) {
      val bits = math.min(16, 63 / zorderCols.size)
      val withZ = graft.operators.Zorder
        .withZValue(rows, zorderCols, "__z", bits)
      val numParts = math.max(1, numPartDirs * filesPerDay)
      withZ
        .repartitionByRange(numParts, col("region"), col("accountId"),
          col("eventDay"), col("__z"))
        .sortWithinPartitions(col("region"), col("accountId"),
          col("eventDay"), col("__z"))
        .drop("__z")
    } else if (filesPerDay == 1)
      rows.repartition(col("region"), col("accountId"), col("eventDay"))
    else rows.repartition(col("region"), col("accountId"), col("eventDay"),
      pmod(xxhash64(col("metadata.uid"), col("time")), lit(filesPerDay)))
  }

  /** Fresh `compactdata-<k>` sequence number: one past the largest k
    * any manifest or marker (committed or crashed) has ever used. */
  private def nextRewriteK(fs: FileSystem, cb: Path): Int =
    pairNames(fs, cb) match { case (m, d) => (m ++ d).flatMap(n =>
      if (n.startsWith("compactdata-")) n.stripPrefix("compactdata-").toIntOption
      else None).maxOption.getOrElse(-1) + 1 }

  /** Step-1 settle shared by the data-rewriting maintenance ops
    * ([[compactDataFiles]], [[deleteWhere]]): finish any interrupted
    * predecessor's supersedes chain, sweep unmarked `compactdata-*`
    * manifests (protected-aware — never a file the live read contract
    * names) and orphaned compactdata staging dirs. */
  private def settleRewrites(fs: FileSystem, tableDir: Path, cb: Path): Unit = {
    val protectedFiles = committedFiles(fs, tableDir)
      .map(fs.makeQualified).toSet
    val (manifests0, done0) = pairNames(fs, cb)
    val committed0 = done0.toSeq.sorted.flatMap(n =>
      readManifestFull(fs, new Path(cb, s"$n.manifest")).map(n -> _))
    committed0.iterator.flatMap(_._2.supersedes).toSet
      .filter(n => manifests0.contains(n) || done0.contains(n))
      .foreach(settlePair(fs, tableDir, _, protectedFiles))
    (manifests0 -- done0).filter(_.startsWith("compactdata-"))
      .foreach(settlePair(fs, tableDir, _, protectedFiles))
    val staging = new Path(tableDir, "_staging")
    if (fs.exists(staging))
      fs.listStatus(staging).map(_.getPath)
        .filter(_.getName.startsWith("compactdata_"))
        .foreach(p => fs.delete(p, true))
  }

  /** Live committed pairs eligible as rewrite inputs (foreign-writer
    * `w-*` pairs excluded) plus the still-resurrectable dead exclusions
    * the new manifest must carry forward. */
  private def liveNonWriterPairs(fs: FileSystem, cb: Path)
      : (Seq[(String, ManifestData)], Set[String]) = {
    val (m, d) = pairNames(fs, cb)
    val full = d.toSeq.sorted.filterNot(_.startsWith("w-")).map(n =>
      n -> readManifestFull(fs, new Path(cb, s"$n.manifest")).getOrElse(
        throw new IllegalStateException(
          s"committed manifest unreadable during data rewrite: $n" +
            (if (m.contains(n)) "" else " (manifest missing)"))))
    val dead = full.iterator.flatMap(_._2.supersedes).toSet
    // carry forward only exclusions whose pairs still exist — those
    // are the resurrectable ones; carrying every historical name
    // would grow the supersedes header without bound
    (full.filterNot { case (n, _) => dead.contains(n) },
      dead.filter(n => m.contains(n) || d.contains(n)))
  }

  /** Row-level delete: permanently remove every committed row matching
    * SQL predicate `cond` — the erasure request (GDPR/DSAR takedown)
    * the reference punts to "rewrite the S3 prefix by hand". Rewrites
    * ONLY the files that contain matching rows; every untouched file
    * is CARRIED by name into the superseding manifest (no copy), so
    * the IO cost scales with the data actually touched, not the
    * table — and [[StatsIndex]], when built, pre-prunes which files
    * are even scanned for matches.
    *
    * Same offline single-operator contract and two-phase mechanism as
    * [[compactDataFiles]] (the pair lands in the `compactdata-*`
    * namespace so both ops share one settle/crash-recovery path):
    * stage the kept rows of affected files, publish ONE manifest
    * naming staged + carried files with `#supersedes` over EVERY live
    * pair (a partial fold would break the horizon derivation's
    * prefix invariant and leak post-snapshot rows into old snapshots),
    * promote, mark — the marker is the atomic swap — then clean up. A
    * crash anywhere re-runs safely; the re-run re-scans
    * (already-deleted rows simply no longer match). Readers by
    * manifest are exact at every point; a directory scanner may see
    * kept rows doubled and deleted rows still present during the
    * publish-to-cleanup window.
    *
    * Erasure semantics the caller must know:
    *  - rows where `cond` is NULL are KEPT (three-valued logic, same
    *    as `DELETE WHERE` in SQL);
    *  - time travel ([[OcsfTables.loadAsOf]]) below the new horizon
    *    THROWS afterwards — erased rows are not resurrectable, which
    *    is the point of an erasure;
    *  - live foreign-writer (`w-*`) pairs REFUSE the delete: their
    *    owner's replay would restage the erased rows. Retire them
    *    first via [[compactCommits]]`(foldWriters = ...)`;
    *  - pass the table's `filesPerDay`/`zorderCols` to re-lay the
    *    rewritten slice like the rest of the table. The output pair
    *    records the `#layout` header ONLY when every superseded pair
    *    already recorded the same layout (the carried files are part
    *    of the pair too — a mixed pair must stay rewrite-eligible);
    *    an erasure over a z-ordered table with matching `zorderCols`
    *    therefore keeps the maintenance loop a no-op, while one
    *    without re-layout leaves the header off and the next
    *    `compactDataFiles(zorderCols = ...)` restores clustering.
    *
    * Returns the number of rows deleted. */
  def deleteWhere(spark: org.apache.spark.sql.SparkSession,
                  tableDir: Path, cond: String,
                  filesPerDay: Int = 1,
                  zorderCols: Seq[String] = Nil): Long = {
    require(filesPerDay >= 1, "filesPerDay must be >= 1")
    import org.apache.spark.sql.functions.{coalesce, col, count, expr, input_file_name, lit, not}
    val fs = tableDir.getFileSystem(spark.sessionState.newHadoopConf())
    val cb = new Path(tableDir, "_committed_batches")
    require(fs.exists(cb) && hasCommitLog(fs, tableDir),
      s"$tableDir has no batch-commit log — deleteWhere needs a table " +
        "written through IdempotentSink")
    settleRewrites(fs, tableDir, cb)
    val liveWriters = pairNames(fs, cb)._2.filter(_.startsWith("w-"))
    require(liveWriters.isEmpty,
      s"$tableDir has live foreign-writer pairs ${liveWriters.toSeq.sorted}" +
        " — a delete over them would be undone by the writer's replay;" +
        " retire them first via compactCommits(foldWriters = ...)")
    val (inputs, deadExclusions) = liveNonWriterPairs(fs, cb)
    if (inputs.isEmpty) return 0L

    // which committed files hold matching rows? Stats-index pre-prune
    // (advisory) bounds the scan; the scan itself reads only the
    // predicate's columns
    val allFinal = inputs.flatMap(_._2.entries.map { case (rel, _) =>
      new Path(tableDir, finalRelPath(rel))
    }).distinct
    val candidates =
      StatsIndex.prune(spark, fs, tableDir, allFinal, cond)
    if (candidates.isEmpty) return 0L
    val delCond = expr(cond)
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val inferOld = spark.conf.get(inferKey, "true")
    val matches =
      try {
        spark.conf.set(inferKey, "false")
        spark.read.option("basePath", tableDir.toString)
          .parquet(candidates.map(_.toString): _*)
          .filter(delCond)
          .groupBy(input_file_name().as("file"))
          .agg(count(lit(1)).as("n"))
          .collect().map(r => normalizePath(fs, r.getString(0)) -> r.getLong(1))
      } finally spark.conf.set(inferKey, inferOld)
    val deleted = matches.map(_._2).sum
    if (deleted == 0L) return 0L
    val affectedFiles = matches.map(_._1).toSet

    // EVERY live pair is superseded — not just the affected ones —
    // because the commit log's horizon derivation rests on folds being
    // prefix-closed over the batch axis ([[horizonFloor]]): folding
    // batch 1 while batch 0 stays live would let loadAsOf(0) serve
    // batch 1's surviving rows into a batch-0 snapshot. Folding
    // everything keeps snapshots exact and gives the RIGHT erasure
    // semantics: below-horizon history (which still contains the
    // erased rows) refuses to serve rather than resurrecting them.
    // Untouched files are carried BY NAME (no copy) — only files that
    // actually contain matching rows are rewritten.
    def finalOf(rel: String): String =
      normalizePath(fs, new Path(tableDir, finalRelPath(rel)))
    val carried = inputs.flatMap(_._2.entries.filterNot {
      case (rel, _) => affectedFiles.contains(finalOf(rel))
    })
    val rewriteFiles = inputs.flatMap(_._2.entries.collect {
      case (rel, _) if affectedFiles.contains(finalOf(rel)) =>
        new Path(tableDir, finalRelPath(rel)).toString
    }).distinct
    val k = nextRewriteK(fs, cb)
    val stagingRoot = new Path(tableDir, s"_staging/compactdata_$k")
    val affectedPartDirs = rewriteFiles
      .map(f => new Path(f).getParent.toString).toSet.size
    try {
      spark.conf.set(inferKey, "false")
      val kept = spark.read.option("basePath", tableDir.toString)
        .parquet(rewriteFiles: _*)
        .where(not(coalesce(delCond, lit(false))))
      // one staged file per affected input file (capped by the per-day
      // quota): the rewrite covers only a SLICE of each day, so
      // applying the full day quota would inflate the file count past
      // the compaction target and force a needless follow-up rewrite
      val numParts = math.max(1,
        math.min(rewriteFiles.size, affectedPartDirs * filesPerDay))
      val laid =
        if (zorderCols.nonEmpty)
          rewriteLayout(kept, numParts, 1, zorderCols)
        else rewriteLayout(kept, affectedPartDirs, filesPerDay, Nil)
          .sortWithinPartitions(col("region"), col("accountId"),
            col("eventDay"), col("time"))
      laid.write.mode("overwrite")
        .partitionBy("region", "accountId", "eventDay")
        .parquet(new Path(stagingRoot, "c").toString)
    } finally spark.conf.set(inferKey, inferOld)

    val staged = listRelative(fs, stagingRoot)
    val maxBatch = inputs.flatMap { case (n, md) =>
      n.toLongOption ++ md.maxBatch
    }.maxOption
    // record the layout ONLY when the whole output pair (staged AND
    // carried files) is uniformly laid: every superseded pair must
    // already record it
    val layoutStr =
      if (zorderCols.isEmpty) None
      else Some("zorder:" + zorderCols.mkString(","))
    val recordLayout =
      layoutStr.filter(ls => inputs.forall(_._2.layout.contains(ls)))
    writeAtomic(fs, new Path(cb, s"compactdata-$k.manifest"),
      manifestBody(staged ++ carried,
        inputs.map(_._1).toSet ++ deadExclusions, maxBatch, recordLayout))
    staged.foreach { case (rel, len) =>
      promoteOne(fs, stagingRoot, tableDir, rel, len, "compactdata", k.toString)
    }
    writeAtomic(fs, new Path(cb, s"compactdata-$k.committed"), "")
    fs.delete(stagingRoot, true)
    val keep = (staged ++ carried).map { case (rel, _) =>
      fs.makeQualified(new Path(tableDir, finalRelPath(rel)))
    }.toSet
    inputs.foreach { case (n, _) => settlePair(fs, tableDir, n, keep) }
    deleted
  }

  /** Offline janitor for the residue no replay ever reclaims: a
    * writer that CRASHED AND NEVER CAME BACK leaves its attempt
    * staging dir (`_staging/batch_<pair>/g<gen>/`) and possibly a
    * `.{name}.tmp` from a torn [[writeAtomic]] — both invisible to
    * readers (staging is underscore-hidden, tmp files are dot-hidden)
    * but real object-store storage forever. Every OTHER residue class
    * already self-heals: a replay resumes its own staging, and the
    * data-rewrite ops settle crashed `compactdata` state on their next
    * run (which this also invokes).
    *
    * Deletes ONLY bookkeeping residue, never data: batch staging dirs
    * for pairs that are already COMMITTED (their rows live at final
    * paths; the staging copy is a leftover) or whose pair name has no
    * manifest at all AND is not in-flight in this process (a crashed
    * first attempt — nothing was published, nothing is lost), plus
    * torn control-dir tmp files. Final-path data files named by no
    * manifest (out-of-contract plain appends) are NOT touched — the
    * [[OcsfTables.load]] stray guard reports those; deleting them
    * could destroy data this operator does not own.
    *
    * OFFLINE, single operator, same contract as the other maintenance
    * ops. Returns (stagingDirsRemoved, tmpFilesRemoved). */
  def vacuum(spark: org.apache.spark.sql.SparkSession,
             tableDir: Path): (Int, Int) = {
    val fs = tableDir.getFileSystem(spark.sessionState.newHadoopConf())
    val cb = new Path(tableDir, "_committed_batches")
    if (!fs.exists(cb)) return (0, 0)
    settleRewrites(fs, tableDir, cb)
    val (manifests, done) = pairNames(fs, cb)
    val staging = new Path(tableDir, "_staging")
    var dirs = 0
    if (fs.exists(staging)) {
      fs.listStatus(staging).map(_.getPath)
        .filter(_.getName.startsWith("batch_")).foreach { d =>
          val pair = d.getName.stripPrefix("batch_")
          val inFlight =
            bookkeepingKeys.contains(attemptKey(fs, tableDir, pair))
          // committed → rows are at final paths, staging is residue;
          // no manifest and not in-flight → crashed first attempt,
          // nothing published. A published-but-unmarked batch manifest
          // keeps its staging (a replay may still resume its promote).
          if (!inFlight && (done.contains(pair) || !manifests.contains(pair))) {
            fs.delete(d, true)
            dirs += 1
          }
        }
    }
    var tmps = 0
    fs.listStatus(cb).map(_.getPath)
      .filter(p => p.getName.startsWith(".") && p.getName.endsWith(".tmp"))
      .foreach { p => fs.delete(p, false); tmps += 1 }
    (dirs, tmps)
  }

  /** Canonical per-file key: `input_file_name()` URIs (empty
    * authority) and manifest-derived Paths (null authority) must
    * compare equal — rebuilt from URI components, never `toString`.
    * Shared with [[StatsIndex]] so the two sides of the file-key
    * contract can never drift. */
  private[ocsf] def normalizePath(fs: FileSystem, p: Path): String = {
    val u = fs.makeQualified(p).toUri
    s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}${u.getPath}"
  }
  private[ocsf] def normalizePath(fs: FileSystem, s: String): String =
    normalizePath(fs, new Path(new java.net.URI(s)))

  /** Data files under `root` with their lengths, as `/`-relative
    * paths, skipping Spark's `_SUCCESS`/hidden bookkeeping files. */
  private def listRelative(fs: FileSystem, root: Path): Seq[(String, Long)] = {
    val rootUri = fs.makeQualified(root).toUri
    val it = fs.listFiles(root, true)
    val out = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
        out += ((rootUri.relativize(fs.makeQualified(f.getPath).toUri).getPath,
          f.getLen))
    }
    out.result()
  }

  private val ManifestHeader = "#graft-manifest files="
  private val ManifestTrailer = "#end"
  private val SupersedesHeader = "#supersedes "
  private val MaxBatchHeader = "#maxbatch "
  private val LayoutHeader = "#layout "

  /** Parsed manifest: the staged data files (with lengths), the
    * control-pair base names this manifest REPLACES, and — on
    * compaction manifests — the largest batch id the pair covers. A
    * committed manifest whose name appears in another committed
    * manifest's `supersedes` set is dead — its entries are excluded
    * from the read contract, which is what makes a data-rewriting
    * compaction's marker publish an atomic swap for readers-by-
    * manifest. `maxBatch` keeps the time-travel horizon boundable
    * across CHAINED compactions: a second-generation fold's supersedes
    * set names only earlier compaction pairs (no numeric batch ids),
    * so without the explicit carry the folded coverage would be
    * unknowable and [[filesAsOf]]/[[filesSince]] would have to refuse
    * every request. */
  private[ocsf] final case class ManifestData(entries: Seq[(String, Long)],
                                              supersedes: Set[String],
                                              maxBatch: Option[Long] = None,
                                              layout: Option[String] = None)

  /** Manifest body: a count header, an optional `#supersedes` line, an
    * optional `#maxbatch` line, an optional `#layout` line (the
    * physical clustering a data rewrite produced, e.g.
    * `zorder:time,severity` — what lets the maintenance loop no-op
    * ONLY when the requested layout is already in place), one
    * `path<TAB>length` line per staged data file, and a `#end`
    * trailer. The trailer makes the format SELF-TERMINATING: a prefix
    * cut anywhere — including inside the last entry's length digits,
    * where the count still matches and every line still parses — is
    * detectably torn, because `#end` is the final bytes written and
    * survives no truncation. */
  private def manifestBody(entries: Seq[(String, Long)],
                           supersedes: Set[String] = Set.empty,
                           maxBatch: Option[Long] = None,
                           layout: Option[String] = None): String = {
    val supersLine =
      if (supersedes.isEmpty) Nil
      else Seq(s"$SupersedesHeader${supersedes.toSeq.sorted.mkString(",")}")
    val maxLine = maxBatch.map(m => s"$MaxBatchHeader$m").toSeq
    val layoutLine = layout.map(l => s"$LayoutHeader$l").toSeq
    (s"$ManifestHeader${entries.size}" +:
      (supersLine ++ maxLine ++ layoutLine ++
        entries.map { case (rel, len) => s"$rel\t$len" }) :+
      ManifestTrailer).mkString("\n")
  }

  /** Parse a manifest; None means torn/invalid (publish crashed on a
    * non-atomic store) and the caller must discard and republish. Only
    * the self-terminating header+trailer format is valid — any other
    * content is treated as torn, so a replay restages under a fresh
    * generation rather than trusting a file of unknown provenance. */
  private[ocsf] def readManifest(fs: FileSystem, p: Path): Option[Seq[(String, Long)]] =
    readManifestFull(fs, p).map(_.entries)

  private[ocsf] def readManifestFull(fs: FileSystem, p: Path): Option[ManifestData] = {
    val lines = readLines(fs, p)
    lines.headOption match {
      case Some(h) if h.startsWith(ManifestHeader) &&
          lines.last == ManifestTrailer =>
        val expected = h.stripPrefix(ManifestHeader).toIntOption
        val (supersedes, afterSupers) = lines.tail.dropRight(1) match {
          case s +: rest if s.startsWith(SupersedesHeader) =>
            (s.stripPrefix(SupersedesHeader).split(',')
              .iterator.filter(_.nonEmpty).toSet, rest)
          case rest => (Set.empty[String], rest)
        }
        val (maxBatch, afterMax) = afterSupers match {
          case m +: rest if m.startsWith(MaxBatchHeader) =>
            (m.stripPrefix(MaxBatchHeader).toLongOption, rest)
          case rest => (None, rest)
        }
        val (layout, body) = afterMax match {
          case l +: rest if l.startsWith(LayoutHeader) =>
            (Some(l.stripPrefix(LayoutHeader)), rest)
          case rest => (None, rest)
        }
        val parsed = body.map { l =>
          l.split('\t') match {
            case Array(rel, len) => len.toLongOption.map(rel -> _)
            case _ => None
          }
        }
        if (expected.contains(parsed.size) && parsed.forall(_.isDefined))
          Some(ManifestData(parsed.flatten, supersedes, maxBatch, layout))
        else None
      case _ => None // torn, zero-byte, or unknown format: never trusted
    }
  }

  /** Publish a small control file atomically: existence implies
    * complete content (write to a dot-temp sibling, then rename). */
  private def writeAtomic(fs: FileSystem, dst: Path, content: String): Unit = {
    fs.mkdirs(dst.getParent)
    val tmp = new Path(dst.getParent, s".${dst.getName}.tmp")
    val os = fs.create(tmp, true)
    try os.write(content.getBytes(StandardCharsets.UTF_8)) finally os.close()
    if (!fs.rename(tmp, dst) && !fs.exists(dst))
      throw new IllegalStateException(s"could not publish $dst")
    ()
  }

  private def readLines(fs: FileSystem, p: Path): Seq[String] = {
    val is = fs.open(p)
    try scala.io.Source.fromInputStream(is, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally is.close()
  }
}
