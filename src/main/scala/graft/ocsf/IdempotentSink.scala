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
  *  2. MANIFEST — atomically publish the staged file list (paths carry
  *     the `g<gen>/` component) as `_committed_batches/<id>.manifest`
  *     (write-temp-then-rename). Until this exists, a replay restarts
  *     from step 1 under a fresh generation.
  *  3. PROMOTE — rename each manifest entry into the table. Replays
  *     resume: a source gone + destination present means that file
  *     already moved.
  *  4. COMMIT — atomically publish `_committed_batches/<id>.committed`
  *     and delete the batch staging dir (ALL generations). Once this
  *     exists the (route, batch) is done and every later replay
  *     returns without touching data — and sweeps any staging leftovers
  *     an earlier crash orphaned.
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
  * Rename-based, so exactly-once holds on filesystems with atomic
  * rename (HDFS, local, ABFS). On S3A, rename is copy+delete and the
  * promote step narrows but does not fully close the window — there,
  * front a committer or pair with
  * [[graft.streaming.EventStream.dedupedByEventId]] as before. The
  * attempt lock is per-JVM: concurrent drivers writing the same table
  * are out of contract (Structured Streaming's checkpoint lease already
  * forbids them).
  *
  * Readers never see staged or half-promoted state as committed data:
  * `_staging`/`_committed_batches` are underscore-prefixed, which
  * Spark's parquet reader ignores, and promoted files become visible
  * only under their final partition directories.
  */
object IdempotentSink {

  /** Thrown by a (route, batch) attempt that lost the generation race:
    * a newer replay of the same batch began after this attempt's
    * `writeBatch` call. The loser must not publish a manifest, promote
    * or commit — the winner owns the batch. */
  final class SupersededAttemptException(msg: String)
      extends RuntimeException(msg)

  /** Latest attempt generation per (qualified table dir, batchId). */
  private val generations = new ConcurrentHashMap[String, AtomicLong]()

  /** Control-step lock per (qualified table dir, batchId). */
  private val controlLocks = new ConcurrentHashMap[String, Object]()

  private def genCounter(key: String): AtomicLong =
    generations.computeIfAbsent(key, _ => new AtomicLong(0L))
  private def lockFor(key: String): Object =
    controlLocks.computeIfAbsent(key, _ => new Object)

  private def attemptKey(fs: FileSystem, tableDir: Path, batchId: Long): String =
    s"${fs.makeQualified(tableDir)}#$batchId"

  /** Idempotently land one route's slice of a micro-batch. Safe to
    * call again for the same (route, batchId) after a crash OR timeout
    * at ANY point — the replay either skips (already committed),
    * resumes the promote, or restages under a fresh generation while
    * the superseded attempt is fenced off at its next control step. */
  def writeBatch(df: DataFrame, baseDir: String, route: String,
                 region: String, accountId: String, batchId: Long,
                 filesPerDay: Int = 0): Unit = {
    val tableDir = new Path(s"$baseDir/${OcsfSink.tableName(route)}")
    val fs = tableDir.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    val gen = beginAttempt(fs, tableDir, batchId)
    runAttempt(df, fs, tableDir, route, region, accountId, batchId,
      filesPerDay, gen)
  }

  /** Registers a new attempt generation, superseding any in-flight
    * attempt for the same (table, batch). Package-private so the spec
    * can model a timed-out attempt racing its replay. */
  private[ocsf] def beginAttempt(fs: FileSystem, tableDir: Path,
                                 batchId: Long): Long =
    genCounter(attemptKey(fs, tableDir, batchId)).incrementAndGet()

  private def checkCurrent(key: String, gen: Long, route: String,
                           batchId: Long): Unit =
    if (genCounter(key).get() != gen)
      throw new SupersededAttemptException(
        s"attempt g$gen for route=$route batch=$batchId was superseded " +
          "by a newer replay of the same batch; aborting without publishing")

  /** The body of one attempt at a fixed generation. Package-private
    * for the superseded-attempt spec. */
  private[ocsf] def runAttempt(df: DataFrame, fs: FileSystem, tableDir: Path,
                               route: String, region: String,
                               accountId: String, batchId: Long,
                               filesPerDay: Int, gen: Long): Unit = {
    val key = attemptKey(fs, tableDir, batchId)
    val committed = new Path(tableDir, s"_committed_batches/$batchId.committed")
    val manifest = new Path(tableDir, s"_committed_batches/$batchId.manifest")
    val batchStaging = new Path(tableDir, s"_staging/batch_$batchId")
    if (fs.exists(committed)) {
      // already done: sweep any staging dir a pre-commit crash (or a
      // straggling superseded attempt) orphaned, then no-op
      fs.delete(batchStaging, true)
      return
    }
    if (!fs.exists(manifest)) {
      val genDir = new Path(batchStaging, s"g$gen")
      OcsfSink.partitionedFrame(df, region, accountId, filesPerDay).write
        .mode("overwrite")
        .partitionBy("region", "accountId", "eventDay")
        .parquet(genDir.toString)
      val lines = listRelative(fs, genDir).map(rel => s"g$gen/$rel")
      lockFor(key).synchronized {
        checkCurrent(key, gen, route, batchId)
        if (!fs.exists(manifest))
          writeAtomic(fs, manifest, lines.mkString("\n"))
      }
    }
    lockFor(key).synchronized {
      checkCurrent(key, gen, route, batchId)
      if (fs.exists(committed)) { fs.delete(batchStaging, true); return }
      readLines(fs, manifest).foreach { rel =>
        val src = new Path(batchStaging, rel)
        // drop the g<gen>/ attempt component: files land at the same
        // table-relative path whichever generation staged them
        val dst = new Path(tableDir, rel.split('/').drop(1).mkString("/"))
        if (fs.exists(src)) {
          fs.mkdirs(dst.getParent)
          if (!fs.rename(src, dst) && !fs.exists(dst))
            throw new IllegalStateException(
              s"promote failed for $src -> $dst (route=$route batch=$batchId)")
        } else if (!fs.exists(dst))
          throw new IllegalStateException(
            s"staged file lost before promote: $rel (route=$route batch=$batchId)")
      }
      writeAtomic(fs, committed, "")
      fs.delete(batchStaging, true)
    }
    ()
  }

  /** Data files under `root`, as `/`-relative paths, skipping Spark's
    * `_SUCCESS`/hidden bookkeeping files. */
  private def listRelative(fs: FileSystem, root: Path): Seq[String] = {
    val rootUri = fs.makeQualified(root).toUri
    val it = fs.listFiles(root, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next().getPath
      if (!f.getName.startsWith("_") && !f.getName.startsWith("."))
        out += rootUri.relativize(fs.makeQualified(f).toUri).getPath
    }
    out.result()
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
