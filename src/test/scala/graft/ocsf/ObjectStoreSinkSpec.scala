package graft.ocsf

import java.io.IOException
import java.net.URI
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FileStatus, FileUtil, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** A local FileSystem whose rename is NON-ATOMIC — copy to the
  * destination, then delete the source — with an injectable crash
  * between (or inside) the two halves: the S3A/object-store rename
  * model the two-phase commit must survive. Armed per-test via the
  * companion; unmatched renames behave normally. */
class NonAtomicRenameFs extends RawLocalFileSystem {
  import NonAtomicRenameFs._
  override def getUri: URI = URI.create("nonatomic:///")
  // RawLocalFileSystem's lazy permission loading calls new File(uri),
  // which rejects any scheme but file: — return eager statuses instead
  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map { s =>
      new FileStatus(s.getLen, s.isDirectory, s.getReplication,
        s.getBlockSize, s.getModificationTime, s.getAccessTime,
        FsPermission.getFileDefault, "test", "test", s.getPath)
    }
  override def rename(src: Path, dst: Path): Boolean = fire(dst) match {
    case Pass => super.rename(src, dst)
    case CrashAfterCopy =>
      if (exists(dst)) return false
      FileUtil.copy(this, src, this, dst, false, getConf)
      throw new IOException(
        s"simulated store crash: $dst fully copied, source delete pending")
    case CrashMidCopy =>
      if (exists(dst)) return false
      val len = getFileStatus(src).getLen
      val in = open(src)
      val out = create(dst, true)
      try {
        val buf = new Array[Byte](math.max(1, (len / 2).toInt))
        val n = in.read(buf)
        if (n > 0) out.write(buf, 0, n)
      } finally { out.close(); in.close() }
      throw new IOException(s"simulated store crash mid-copy: $dst is partial")
  }
}

object NonAtomicRenameFs {
  sealed trait Mode
  case object Pass extends Mode
  case object CrashAfterCopy extends Mode
  case object CrashMidCopy extends Mode

  @volatile private var trigger: Path => Mode = _ => Pass
  private val budget = new AtomicInteger(0)

  /** The next `n` renames whose destination matches misbehave. */
  def arm(n: Int)(f: Path => Mode): Unit = { budget.set(n); trigger = f }
  def disarm(): Unit = { trigger = _ => Pass; budget.set(0) }
  private[ocsf] def fire(dst: Path): Mode = trigger(dst) match {
    case Pass => Pass
    case m => if (budget.getAndDecrement() > 0) m else Pass
  }
}

/** A24 object-store safety: on a store where rename = copy + delete
  * (S3A), a crash at any point inside the promote or the control-file
  * publish must never duplicate, lose, or tear a row for a reader of
  * the committed table ([[OcsfTables.load]] via the batch-commit
  * log). */
class ObjectStoreSinkSpec extends SparkSpec {

  private val region = "us-east-1"
  private val acct = "123456789012"
  private val route = "DNS Activity"

  /** Fresh nonatomic:// base dir; registers the scheme once. */
  private def mkBase(): String = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.nonatomic.impl", classOf[NonAtomicRenameFs].getName)
    hc.set("fs.nonatomic.impl.disable.cache", "true")
    "nonatomic:" + Files.createTempDirectory("objstore")
  }

  /** (uid, day) rows; two distinct days → two staged files, so the
    * crash hits one file with another still pending. */
  private def df(rows: (String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("uid", "day")
      .select(struct(col("uid")).as("metadata"),
        to_timestamp(concat(col("day"), lit(" 12:00:00"))).as("time"))
  }

  private def committedUids(base: String): Seq[String] =
    // guarded read: this suite asserts table HEALTH (no orphans /
    // strays survive the fault), so it opts into the maintenance check
    OcsfTables.load(spark, base, route, verifyAppends = true)
      .select("metadata.uid").collect().map(_.getString(0)).sorted.toSeq

  private def fsOf(base: String) = {
    val dir = new Path(s"$base/dns_activity")
    (dir.getFileSystem(spark.sparkContext.hadoopConfiguration), dir)
  }

  /** Final-layout parquet paths a plain directory scan would read —
    * everything outside the underscore-hidden control/staging dirs. */
  private def visibleParquet(base: String): Seq[Path] = {
    val (fs, dir) = fsOf(base)
    val it = fs.listFiles(dir, true)
    val out = Seq.newBuilder[Path]
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.endsWith(".parquet") && !p.toString.contains("/_staging/"))
        out += p
    }
    out.result()
  }

  private def isPromoteTarget(p: Path): Boolean =
    p.toString.contains("/eventDay=") && !p.toString.contains("/_staging/")

  test("copy-then-crash-before-delete mid-promote: replay lands every row exactly once") {
    val base = mkBase()
    val batch = df("e1" -> "2023-11-14", "e2" -> "2023-11-15")
    NonAtomicRenameFs.arm(1)(p =>
      if (isPromoteTarget(p)) NonAtomicRenameFs.CrashAfterCopy
      else NonAtomicRenameFs.Pass)
    try intercept[IOException] {
      IdempotentSink.writeBatch(batch, base, route, region, acct, batchId = 0L)
    } finally NonAtomicRenameFs.disarm()
    val (fs, tableDir) = fsOf(base)
    // the state S3A leaves: the first object fully visible at its final
    // path, its source still in staging, nothing committed — the exact
    // at-least-once window a naive append sink re-appends into
    assert(visibleParquet(base).size == 1)
    assert(fs.exists(new Path(tableDir, "_staging/batch_0")))
    assert(!IdempotentSink.hasCommitLog(fs, tableDir))
    // replay: the verified promote accepts the complete copy as already
    // promoted (no re-land), moves the second file, commits
    IdempotentSink.writeBatch(batch, base, route, region, acct, batchId = 0L)
    assert(committedUids(base) == Seq("e1", "e2"))
    assert(OcsfTables.load(spark, base, route).count() == 2)
    assert(visibleParquet(base).size == 2)
    assert(!fs.exists(new Path(tableDir, "_staging/batch_0")))
    // committed bookkeeping evicted (straggler fencing now rests on the
    // marker, not the in-process maps)
    assert(!IdempotentSink.bookkeepingKeys.exists(_.contains("objstore")),
      "commit must evict the (table, batch) generation/lock entries")
  }

  test("crash mid-copy tears the destination object: replay re-promotes it, length-verified") {
    val base = mkBase()
    val batch = df("p1" -> "2023-11-14", "p2" -> "2023-11-15")
    NonAtomicRenameFs.arm(1)(p =>
      if (isPromoteTarget(p)) NonAtomicRenameFs.CrashMidCopy
      else NonAtomicRenameFs.Pass)
    try intercept[IOException] {
      IdempotentSink.writeBatch(batch, base, route, region, acct, batchId = 0L)
    } finally NonAtomicRenameFs.disarm()
    val (fs, _) = fsOf(base)
    // a torn (half-copied) parquet object sits at a final path
    val torn = visibleParquet(base)
    assert(torn.size == 1)
    val tornLen = fs.getFileStatus(torn.head).getLen
    // replay: the length check rejects the torn object, deletes it and
    // re-promotes the intact staged source before committing
    IdempotentSink.writeBatch(batch, base, route, region, acct, batchId = 0L)
    assert(fs.getFileStatus(torn.head).getLen > tornLen,
      "torn object must be replaced by the full staged file")
    assert(committedUids(base) == Seq("p1", "p2"))
    assert(OcsfTables.load(spark, base, route).count() == 2)
  }

  test("compactDataFiles folds many small batch files into one per day, rows exact") {
    val base = mkBase()
    (0 until 3).foreach { b =>
      IdempotentSink.writeBatch(
        df(s"c$b-a" -> "2023-11-14", s"c$b-b" -> "2023-11-15"),
        base, route, region, acct, batchId = b.toLong)
    }
    val (fs, tableDir) = fsOf(base)
    assert(visibleParquet(base).size == 6) // 3 batches x 2 days
    val before = committedUids(base)
    assert(IdempotentSink.compactDataFiles(spark, tableDir) == 3)
    assert(committedUids(base) == before)
    assert(visibleParquet(base).size == 2, "one file per day partition")
    val cb = new Path(tableDir, "_committed_batches")
    val names = fs.listStatus(cb).map(_.getPath.getName).sorted.toSeq
    assert(names == Seq("compactdata-0.committed", "compactdata-0.manifest"),
      s"old control pairs must be gone: $names")
    // at the target layout: a second run is a no-op
    assert(IdempotentSink.compactDataFiles(spark, tableDir) == 0)
    assert(committedUids(base) == before)
  }

  test("z-order compaction clusters day files on BOTH layout columns, rows exact") {
    val base = mkBase()
    import spark.implicits._
    // 3 batches, one day, each batch spanning the full time x severity
    // plane — so every PRE-compaction file's min-max stats cover ~the
    // whole range of both columns and nothing could be skipped
    def batchDf(b: Int): DataFrame =
      (0 until 64).map { i =>
        (s"u$b-$i",
          f"2023-11-14 ${i % 24}%02d:${(i * 7) % 60}%02d:00",
          (i * 13 + b) % 100)
      }.toDF("uid", "tstr", "severity")
        .select(struct(col("uid")).as("metadata"),
          to_timestamp(col("tstr")).as("time"), col("severity"))
    (0 until 3).foreach(b =>
      IdempotentSink.writeBatch(batchDf(b), base, route, region, acct,
        batchId = b.toLong))
    val (_, tableDir) = fsOf(base)
    val before = committedUids(base)
    assert(IdempotentSink.compactDataFiles(spark, tableDir, filesPerDay = 4,
      zorderCols = Seq("time", "severity")) == 3)
    assert(committedUids(base) == before, "the row set must be unchanged")
    // quadrant split (top z bit of each dim): every file's stats must
    // cover at most ~half the global range on BOTH columns at once —
    // the property a parquet reader prunes on
    val files = visibleParquet(base)
    assert(files.size >= 2 && files.size <= 4, s"files: $files")
    val stats = files.map { p =>
      val r = spark.read.parquet(p.toString)
        .agg(min(col("time").cast("long")), max(col("time").cast("long")),
          min("severity"), max("severity")).first()
      (r.getLong(1) - r.getLong(0), r.getInt(3) - r.getInt(2))
    }
    val g = spark.read.parquet(files.map(_.toString): _*)
      .agg(min(col("time").cast("long")), max(col("time").cast("long")),
        min("severity"), max("severity")).first()
    val (gt, gs) = (g.getLong(1) - g.getLong(0), g.getInt(3) - g.getInt(2))
    stats.foreach { case (tw, sw) =>
      // a curve slice may straddle one quadrant corner (one dim up to
      // ~0.7 of global) but its stats BOX must stay far under the
      // global box — unclustered pre-compaction files cover ~1.0 ×
      // global on both dims at once
      assert(tw <= gt * 8 / 10, s"time width $tw not narrowed: $stats")
      assert(sw <= gs * 8 / 10, s"severity width $sw not narrowed: $stats")
      assert(tw.toDouble / gt * sw / gs <= 0.4,
        s"stats box ($tw x $sw) not clustered: $stats")
    }
    // steady state: one compactdata pair at the target count → no-op
    assert(IdempotentSink.compactDataFiles(spark, tableDir, filesPerDay = 4,
      zorderCols = Seq("time", "severity")) == 0)
    assert(committedUids(base) == before)
  }

  test("z-order request over a hash-compacted pair rewrites: layout is recorded, never inferred from file count") {
    val base = mkBase()
    import spark.implicits._
    def batchDf(b: Int): DataFrame =
      (0 until 64).map { i =>
        (s"u$b-$i", f"2023-11-14 ${i % 24}%02d:00:00", (i * 13 + b) % 100)
      }.toDF("uid", "tstr", "severity")
        .select(struct(col("uid")).as("metadata"),
          to_timestamp(col("tstr")).as("time"), col("severity"))
    (0 until 3).foreach(b =>
      IdempotentSink.writeBatch(batchDf(b), base, route, region, acct,
        batchId = b.toLong))
    val (_, tableDir) = fsOf(base)
    val before = committedUids(base)
    // plain hash-split compaction first: rows interleave across files
    assert(IdempotentSink.compactDataFiles(spark, tableDir,
      filesPerDay = 2) == 3)
    // the single surviving pair is AT the target file count, but its
    // manifest records no layout — a z-order request must still rewrite
    assert(IdempotentSink.compactDataFiles(spark, tableDir,
      filesPerDay = 2, zorderCols = Seq("time", "severity")) == 1)
    assert(committedUids(base) == before)
    // now the layout is recorded: same request no-ops
    assert(IdempotentSink.compactDataFiles(spark, tableDir,
      filesPerDay = 2, zorderCols = Seq("time", "severity")) == 0)
    // a DIFFERENT layout request rewrites again
    assert(IdempotentSink.compactDataFiles(spark, tableDir,
      filesPerDay = 2, zorderCols = Seq("severity")) == 1)
    assert(committedUids(base) == before)
  }

  test("vacuum reclaims abandoned staging and torn tmp files, keeps resumable state and rows") {
    val base = mkBase()
    IdempotentSink.writeBatch(df("e1" -> "2023-11-14"), base, route,
      region, acct, batchId = 0L)
    val (fs, tableDir) = fsOf(base)
    val before = committedUids(base)
    def mk(p: String): Unit = {
      val out = fs.create(new Path(tableDir, p), true)
      out.write("junk".getBytes); out.close()
    }
    // committed batch 0's staging leftover + a crashed never-replayed
    // attempt (no manifest) + a torn writeAtomic tmp
    mk("_staging/batch_0/g9/leftover.parquet")
    mk("_staging/batch_5/g1/orphan.parquet")
    mk("_committed_batches/.9.manifest.tmp")
    // a PUBLISHED-but-unmarked batch manifest: its staging must
    // survive (a replay may still resume the promote)
    IdempotentSink.writeBatch(df("e2" -> "2023-11-14"), base, route,
      region, acct, batchId = 7L)
    fs.delete(new Path(tableDir, "_committed_batches/7.committed"), false)
    mk("_staging/batch_7/g1/resumable.parquet")
    assert(IdempotentSink.vacuum(spark, tableDir) == (2, 1))
    assert(!fs.exists(new Path(tableDir, "_staging/batch_0")))
    assert(!fs.exists(new Path(tableDir, "_staging/batch_5")))
    assert(fs.exists(new Path(tableDir, "_staging/batch_7/g1/resumable.parquet")),
      "unmarked-manifest staging is resumable state, not residue")
    assert(!fs.exists(new Path(tableDir, "_committed_batches/.9.manifest.tmp")))
    assert(committedUids(base) == before, "vacuum must never touch rows")
    // idempotent
    assert(IdempotentSink.vacuum(spark, tableDir) == (0, 0))
    // the crashed batch 7 replays to completion afterwards
    IdempotentSink.writeBatch(df("e2" -> "2023-11-14"), base, route,
      region, acct, batchId = 7L)
    assert(committedUids(base) == (before :+ "e2").sorted)
  }

  test("crash mid data-compaction promote: readers keep the originals, re-run completes") {
    val base = mkBase()
    (0 until 2).foreach { b =>
      IdempotentSink.writeBatch(
        df(s"x$b-a" -> "2023-11-14", s"x$b-b" -> "2023-11-15"),
        base, route, region, acct, batchId = b.toLong)
    }
    val (fs, tableDir) = fsOf(base)
    val before = committedUids(base)
    NonAtomicRenameFs.arm(1)(p =>
      if (isPromoteTarget(p)) NonAtomicRenameFs.CrashAfterCopy
      else NonAtomicRenameFs.Pass)
    try intercept[IOException] {
      IdempotentSink.compactDataFiles(spark, tableDir)
    } finally NonAtomicRenameFs.disarm()
    // unmarked compactdata manifest: the read contract still names
    // exactly the original batches — no row doubled, none missing
    assert(committedUids(base) == before)
    // re-run settles the wreck (sweeps the unmarked manifest AND its
    // promoted leftovers) and completes
    assert(IdempotentSink.compactDataFiles(spark, tableDir) == 2)
    assert(committedUids(base) == before)
    assert(visibleParquet(base).size == 2)
  }

  test("crash after data-compaction commit, before cleanup: swap already atomic, settle finishes") {
    val base = mkBase()
    (0 until 2).foreach { b =>
      IdempotentSink.writeBatch(
        df(s"y$b-a" -> "2023-11-14", s"y$b-b" -> "2023-11-15"),
        base, route, region, acct, batchId = b.toLong)
    }
    val (fs, tableDir) = fsOf(base)
    val before = committedUids(base)
    NonAtomicRenameFs.arm(1)(p =>
      if (p.getName == "compactdata-0.committed") NonAtomicRenameFs.CrashAfterCopy
      else NonAtomicRenameFs.Pass)
    try intercept[IOException] {
      IdempotentSink.compactDataFiles(spark, tableDir)
    } finally NonAtomicRenameFs.disarm()
    // marker landed -> the supersedes header already swapped the read
    // contract to the new files; originals still on disk but dead
    assert(visibleParquet(base).size == 6, "originals + compacted both present")
    assert(committedUids(base) == before, "no duplicate rows during the window")
    // next run's settle pass deletes the superseded pairs and files
    assert(IdempotentSink.compactDataFiles(spark, tableDir) == 0)
    assert(committedUids(base) == before)
    assert(visibleParquet(base).size == 2)
  }

  test("in-band control merge settles a crashed data compaction's ghosts, files included") {
    val base = mkBase()
    (0 until 2).foreach { b =>
      IdempotentSink.writeBatch(
        df(s"g$b-a" -> "2023-11-14", s"g$b-b" -> "2023-11-15"),
        base, route, region, acct, batchId = b.toLong)
    }
    val (fs, tableDir) = fsOf(base)
    val before = committedUids(base)
    // crash the data compaction right after its marker lands: pairs
    // 0,1 and their old data files linger as superseded ghosts
    NonAtomicRenameFs.arm(1)(p =>
      if (p.getName == "compactdata-0.committed") NonAtomicRenameFs.CrashAfterCopy
      else NonAtomicRenameFs.Pass)
    try intercept[IOException] {
      IdempotentSink.compactDataFiles(spark, tableDir)
    } finally NonAtomicRenameFs.disarm()
    // the stream moves on: another batch lands on the wrecked table
    IdempotentSink.writeBatch(df("g2-a" -> "2023-11-14", "g2-b" -> "2023-11-15"),
      base, route, region, acct, batchId = 2L)
    // the in-band control merge (EventStream's compactEvery hook) must
    // settle the ghosts' DATA FILES too, not just their control pairs —
    // deleting only the pairs would orphan the old files and trip the
    // stray-append guard on every later load
    assert(IdempotentSink.compactCommits(fs, tableDir) == 2) // compactdata-0 + batch 2
    assert(committedUids(base) == (before ++ Seq("g2-a", "g2-b")).sorted)
    assert(visibleParquet(base).size == 4,
      "ghost batches' old files must be settled away") // 2 compacted + batch 2's 2
  }

  test("control-file merge then data compaction: single pair, many files, still compacts") {
    val base = mkBase()
    (0 until 3).foreach { b =>
      IdempotentSink.writeBatch(
        df(s"z$b-a" -> "2023-11-14", s"z$b-b" -> "2023-11-15"),
        base, route, region, acct, batchId = b.toLong)
    }
    val (fs, tableDir) = fsOf(base)
    val before = committedUids(base)
    assert(IdempotentSink.compactCommits(fs, tableDir) == 3)
    assert(committedUids(base) == before, "control merge must not move rows")
    assert(visibleParquet(base).size == 6, "control merge rewrites no data")
    // one pair, six files -> the file-count guard still fires
    assert(IdempotentSink.compactDataFiles(spark, tableDir) == 1)
    assert(committedUids(base) == before)
    assert(visibleParquet(base).size == 2)
  }

  test("compactAll sweeps every committed route table, reads identical") {
    val base = mkBase()
    val routes = Seq("DNS Activity", "Process Activity")
    routes.foreach { r =>
      (0 until 2).foreach { b =>
        IdempotentSink.writeBatch(
          df(s"$r-$b-a" -> "2023-11-14", s"$r-$b-b" -> "2023-11-15"),
          base, r, region, acct, batchId = b.toLong)
      }
    }
    def uids(r: String): Seq[String] =
      OcsfTables.load(spark, base, r)
        .select("metadata.uid").collect().map(_.getString(0)).sorted.toSeq
    val before = routes.map(r => r -> uids(r)).toMap
    val report = OcsfTables.compactAll(spark, base)
    assert(report.keySet == Set("dns_activity", "process_activity"), report)
    assert(report.values.forall(_.dataPairs == 2), report)
    routes.foreach(r => assert(uids(r) == before(r)))
    // idempotent: a second sweep has nothing to do
    assert(OcsfTables.compactAll(spark, base).values
      .forall(c => c.dataPairs == 0 && c.controlPairs == 0))
  }

  test("torn manifest publish is detected, discarded and republished") {
    val base = mkBase()
    val batch = df("m1" -> "2023-11-14", "m2" -> "2023-11-15")
    NonAtomicRenameFs.arm(1)(p =>
      if (p.getName == "0.manifest") NonAtomicRenameFs.CrashMidCopy
      else NonAtomicRenameFs.Pass)
    try intercept[IOException] {
      IdempotentSink.writeBatch(batch, base, route, region, acct, batchId = 0L)
    } finally NonAtomicRenameFs.disarm()
    val (fs, tableDir) = fsOf(base)
    // the torn manifest EXISTS but fails its count header — it must not
    // be trusted as a promote list
    assert(fs.exists(new Path(tableDir, "_committed_batches/0.manifest")))
    assert(visibleParquet(base).isEmpty, "nothing may promote off a torn manifest")
    // replay restages under a fresh generation, republishes, commits
    IdempotentSink.writeBatch(batch, base, route, region, acct, batchId = 0L)
    assert(committedUids(base) == Seq("m1", "m2"))
    assert(OcsfTables.load(spark, base, route).count() == 2)
    assert(visibleParquet(base).size == 2)
  }
}
