package graft.ocsf

import java.nio.charset.StandardCharsets

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
  *     `table/_staging/batch_<id>/`, `mode("overwrite")` so a replay
  *     clobbers any partial attempt.
  *  2. MANIFEST — atomically publish the staged file list as
  *     `_committed_batches/<id>.manifest` (write-temp-then-rename).
  *     Until this exists, a replay restarts from step 1.
  *  3. PROMOTE — rename each manifest entry into the table. Replays
  *     resume: a source gone + destination present means that file
  *     already moved.
  *  4. COMMIT — atomically publish `_committed_batches/<id>.committed`
  *     and delete the staging dir. Once this exists the (route, batch)
  *     is done and every later replay returns without touching data.
  *
  * Rename-based, so exactly-once holds on filesystems with atomic
  * rename (HDFS, local, ABFS). On S3A, rename is copy+delete and the
  * promote step narrows but does not fully close the window — there,
  * front a committer or pair with
  * [[graft.streaming.EventStream.dedupedByEventId]] as before.
  *
  * Readers never see staged or half-promoted state as committed data:
  * `_staging`/`_committed_batches` are underscore-prefixed, which
  * Spark's parquet reader ignores, and promoted files become visible
  * only under their final partition directories.
  */
object IdempotentSink {

  /** Idempotently land one route's slice of a micro-batch. Safe to
    * call again for the same (route, batchId) after a crash at ANY
    * point — the replay either skips (already committed), resumes the
    * promote, or restarts the staging write. */
  def writeBatch(df: DataFrame, baseDir: String, route: String,
                 region: String, accountId: String, batchId: Long,
                 filesPerDay: Int = 0): Unit = {
    val tableDir = new Path(s"$baseDir/${OcsfSink.tableName(route)}")
    val fs = tableDir.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    val committed = new Path(tableDir, s"_committed_batches/$batchId.committed")
    if (fs.exists(committed)) return
    val manifest = new Path(tableDir, s"_committed_batches/$batchId.manifest")
    val staging = new Path(tableDir, s"_staging/batch_$batchId")
    if (!fs.exists(manifest)) {
      OcsfSink.partitionedFrame(df, region, accountId, filesPerDay).write
        .mode("overwrite")
        .partitionBy("region", "accountId", "eventDay")
        .parquet(staging.toString)
      writeAtomic(fs, manifest, listRelative(fs, staging).mkString("\n"))
    }
    readLines(fs, manifest).foreach { rel =>
      val src = new Path(staging, rel)
      val dst = new Path(tableDir, rel)
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
    fs.delete(staging, true)
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
