package graft.sources

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.nio.file.{Files, Path => JPath}
import java.util.zip.GZIPOutputStream

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** A28 — notification-fed landing source (`format("graft-landing")`):
  * discovery by announcement ([[LandingLog]]), not by listing, so the
  * per-trigger driver cost tracks the ingest delta and the checkpoint
  * offset is one (seq, idx) high-water mark per writer — the
  * reference's S3→SQS ingest shape (/root/reference/README.md:34-38)
  * instead of the file source's O(all-objects-ever) LIST + seen-map.
  *
  * Pins: log round-trip incl. hostile paths, torn-publish detection,
  * per-writer seq claiming, identity-preserving compaction, the
  * announce-only contract (unannounced objects are invisible),
  * exactly-once across restarts, delta-only second drains, offsets
  * surviving compaction, admission control batching, and loud missing
  * object failure vs opt-in skip. */
class LandingSourceSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val tmpDirs = scala.collection.mutable.Buffer.empty[JPath]

  private def tempDir(prefix: String): JPath = {
    val d = Files.createTempDirectory(prefix)
    tmpDirs.synchronized { tmpDirs += d }
    d
  }

  override def afterAll(): Unit = {
    tmpDirs.foreach { d =>
      try {
        import java.util.Comparator
        Files.walk(d).sorted(Comparator.reverseOrder[JPath]())
          .forEach(p => Files.deleteIfExists(p))
      } catch { case _: java.io.IOException => () }
    }
    super.afterAll()
  }

  private def fs: FileSystem =
    new Path("/").getFileSystem(spark.sessionState.newHadoopConf())

  private def writeGz(dir: JPath, name: String, lines: Seq[String]): String = {
    val f = dir.resolve(name)
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(f.toFile)), "UTF-8"))
    lines.foreach { l => w.write(l); w.write("\n") }
    w.close()
    f.toString
  }

  private def writePlain(dir: JPath, name: String, lines: Seq[String]): String = {
    val f = dir.resolve(name)
    Files.write(f, (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    f.toString
  }

  private def drain(landing: JPath, out: JPath, ckpt: JPath,
                    maxFiles: Int = 64, ignoreMissing: Boolean = false): Unit = {
    val df: DataFrame = spark.readStream
      .format("graft-landing")
      .option("maxFilesPerTrigger", maxFiles)
      .option("ignoreMissingFiles", ignoreMissing)
      .load(landing.toString)
    val q: StreamingQuery = df.writeStream
      .format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "drain did not finish in 120 s")
  }

  private def readBack(out: JPath): Seq[(String, String)] =
    spark.read.parquet(out.toString)
      .select("raw", "src_file").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  // ---------------------------------------------------------------- log

  test("log: announce/readRecords round-trips hostile paths and assigns per-writer seqs") {
    val landing = tempDir("landing-log")
    val dir = new Path(landing.toString)
    val hostile = Seq(
      "plain/obj-1.gz",
      """with"quote.gz""",
      """back\slash.gz""",
      "unicode-é世.gz",
      "tab	name.gz")
    val seq1 = LandingLog.announce(fs, dir, hostile, "w1")
    val seq2 = LandingLog.announce(fs, dir, Seq("later.gz"), "w1")
    val seqB = LandingLog.announce(fs, dir, Seq("other.gz"), "w2")
    assert(seq1 == 1L && seq2 == 2L, "per-writer seqs are dense from 1")
    assert(seqB == 1L, "writers do not share a counter")

    val all = LandingLog.allRecords(fs, dir)
    assert(all.map(_._1).distinct.sorted == Seq("w1", "w2"))
    val w1Paths = all.collect { case ("w1", r) if r.seq == 1L => r.path }
    assert(w1Paths == hostile, "paths round-trip byte-identical in idx order")
  }

  test("log: a pre-claimed seq is skipped, not overwritten") {
    val landing = tempDir("landing-claim")
    val dir = new Path(landing.toString)
    LandingLog.announce(fs, dir, Seq("a.gz"), "w1")
    // a rival process claims seq 2 out-of-band
    val rival = new Path(LandingLog.notifyDir(dir), f"notif-w1-${2L}%012d")
    val os = fs.create(rival, false)
    os.write("#graft-notify records=1\n2\t0\t\"rival.gz\"\n#end\n".getBytes("UTF-8"))
    os.close()
    val claimed = LandingLog.announce(fs, dir, Seq("b.gz"), "w1")
    assert(claimed == 3L, "announce detects the claimed seq and takes the next")
    val paths = LandingLog.allRecords(fs, dir).map(_._2.path)
    assert(paths.toSet == Set("a.gz", "rival.gz", "b.gz"), "rival record intact")
  }

  test("log: torn notifications throw instead of under-delivering") {
    val landing = tempDir("landing-torn")
    val dir = new Path(landing.toString)
    LandingLog.announce(fs, dir, Seq("a.gz", "b.gz"), "w1")
    val nf = LandingLog.listNotifications(fs, dir).head

    // truncate: drop the #end trailer
    val full = LandingLog.readRecords(fs, nf)
    assert(full.map(_.path) == Seq("a.gz", "b.gz"))
    val os = fs.create(nf.file, true)
    os.write("#graft-notify records=2\n1\t0\t\"a.gz\"\n".getBytes("UTF-8"))
    os.close()
    val e = intercept[IllegalStateException](LandingLog.readRecords(fs, nf))
    assert(e.getMessage.contains("torn"))

    // count-mismatch with intact trailer also throws
    val os2 = fs.create(nf.file, true)
    os2.write("#graft-notify records=2\n1\t0\t\"a.gz\"\n#end\n".getBytes("UTF-8"))
    os2.close()
    val e2 = intercept[IllegalStateException](LandingLog.readRecords(fs, nf))
    assert(e2.getMessage.contains("declared 2"))
  }

  test("log: compact folds per-writer files, preserves record identity, is re-runnable") {
    val landing = tempDir("landing-compact")
    val dir = new Path(landing.toString)
    (1 to 5).foreach(i => LandingLog.announce(fs, dir, Seq(s"w1-obj-$i.gz"), "w1"))
    (1 to 3).foreach(i => LandingLog.announce(fs, dir, Seq(s"w2-obj-$i.gz"), "w2"))
    val before = LandingLog.allRecords(fs, dir)

    val removed = LandingLog.compact(fs, dir)
    assert(removed == 8, "all plain files folded away")
    val files = LandingLog.listNotifications(fs, dir)
    assert(files.size == 2 && files.forall(_.merged), "one merged file per writer")
    assert(LandingLog.allRecords(fs, dir) == before, "identity preserved exactly")

    // a further announce + second compact folds merged + new into one again
    LandingLog.announce(fs, dir, Seq("w1-obj-6.gz"), "w1")
    LandingLog.compact(fs, dir)
    val after = LandingLog.allRecords(fs, dir)
    assert(after.map(_._2.path).toSet == before.map(_._2.path).toSet + "w1-obj-6.gz")
    assert(after.collect { case ("w1", r) => (r.seq, r.idx) }.distinct.size == 6)
  }

  test("log: announceExisting bootstraps recursively and skips hidden dirs") {
    val landing = tempDir("landing-boot")
    val sub = Files.createDirectory(landing.resolve("day=20231114"))
    writeGz(landing, "top.gz", Seq("t"))
    writeGz(sub, "nested.gz", Seq("n"))
    Files.createDirectory(landing.resolve("_notify_decoy"))
    writeGz(landing.resolve("_notify_decoy"), "hidden.gz", Seq("h"))
    writePlain(landing, ".tmp-partial", Seq("x"))

    val n = LandingLog.announceExisting(fs, new Path(landing.toString))
    assert(n == 2, "only visible data objects announced")
    val paths = LandingLog.allRecords(fs, new Path(landing.toString)).map(_._2.path)
    assert(paths.exists(_.endsWith("top.gz")) && paths.exists(_.endsWith("nested.gz")))
    assert(!paths.exists(_.contains("hidden")) && !paths.exists(_.contains(".tmp")))
  }

  // ------------------------------------------------------------- stream

  test("stream: announced gz objects land exactly-once; unannounced objects are invisible") {
    val landing = tempDir("landing-e2e")
    val out  = tempDir("landing-e2e-out")
    val ckpt = tempDir("landing-e2e-ckpt")
    val dir = new Path(landing.toString)

    val a = writeGz(landing, "obj-a.gz", Seq("a1", "a2"))
    val b = writePlain(landing, "obj-b.jsonl", Seq("b1"))
    writeGz(landing, "never-announced.gz", Seq("ghost"))
    LandingLog.announce(fs, dir, Seq(a, b), "w1")

    drain(landing, out, ckpt)
    val rows = readBack(out)
    assert(rows.map(_._1).sorted == Seq("a1", "a2", "b1"),
      "gz is decoded, plain text passes through, the unannounced object is NOT read")
    assert(rows.collect { case (r, s) if r.startsWith("a") => s }.forall(_.endsWith("obj-a.gz")),
      "src_file provenance points at the landed object")

    // restart on the same checkpoint with no new announcements: no dupes
    drain(landing, out, ckpt)
    assert(readBack(out).size == 3, "exactly-once across restart")

    // announce a delta; second drain picks up ONLY the delta
    val c = writeGz(landing, "obj-c.gz", Seq("c1"))
    LandingLog.announce(fs, dir, Seq(c), "w2")
    drain(landing, out, ckpt)
    assert(readBack(out).map(_._1).sorted == Seq("a1", "a2", "b1", "c1"))
  }

  test("stream: offsets survive notification-log compaction") {
    val landing = tempDir("landing-compat")
    val out  = tempDir("landing-compat-out")
    val ckpt = tempDir("landing-compat-ckpt")
    val dir = new Path(landing.toString)

    val a = writeGz(landing, "obj-a.gz", Seq("a1"))
    LandingLog.announce(fs, dir, Seq(a), "w1")
    drain(landing, out, ckpt)
    assert(readBack(out).map(_._1) == Seq("a1"))

    // fold the log AFTER the consumer's offset points into it, then land more
    val b = writeGz(landing, "obj-b.gz", Seq("b1"))
    LandingLog.announce(fs, dir, Seq(b), "w1")
    LandingLog.compact(fs, dir)
    assert(LandingLog.listNotifications(fs, dir).forall(_.merged))

    drain(landing, out, ckpt)
    assert(readBack(out).map(_._1).sorted == Seq("a1", "b1"),
      "consumed records are not replayed from the merged file; the delta is")
  }

  test("stream: maxFilesPerTrigger bounds each micro-batch; the drain still completes") {
    val landing = tempDir("landing-admit")
    val out  = tempDir("landing-admit-out")
    val ckpt = tempDir("landing-admit-ckpt")
    val dir = new Path(landing.toString)

    val paths = (1 to 5).map(i => writeGz(landing, s"obj-$i.gz", Seq(s"line-$i")))
    LandingLog.announce(fs, dir, paths, "w1")

    val df = spark.readStream
      .format("graft-landing")
      .option("maxFilesPerTrigger", 2)
      .load(landing.toString)
    val q = df.writeStream
      .format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    assert(readBack(out).map(_._1).sorted == (1 to 5).map(i => s"line-$i"),
      "all records land across capped batches")
    // ceil(5/2) = 3 batches were committed
    val commits = Option(new java.io.File(s"$ckpt/commits").listFiles())
      .fold(0)(_.count(f => f.getName.forall(_.isDigit)))
    assert(commits >= 3, s"expected >=3 admission-capped batches, saw $commits")
  }

  test("stream: a vanished announced object fails loudly; ignoreMissingFiles opts into skip") {
    val landing = tempDir("landing-miss")
    val dir = new Path(landing.toString)

    val a = writeGz(landing, "obj-a.gz", Seq("a1"))
    val gone = writeGz(landing, "obj-gone.gz", Seq("x"))
    LandingLog.announce(fs, dir, Seq(a, gone), "w1")
    Files.delete(landing.resolve("obj-gone.gz"))

    val out1  = tempDir("landing-miss-out1")
    val ckpt1 = tempDir("landing-miss-ckpt1")
    val q = spark.readStream.format("graft-landing").load(landing.toString)
      .writeStream.format("parquet")
      .option("path", out1.toString)
      .option("checkpointLocation", ckpt1.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000)
    }
    def rootChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).toSeq
    assert(rootChain(failed).exists(m => m != null && m.contains("integrity")),
      "failure names the notification-integrity violation")

    val out2  = tempDir("landing-miss-out2")
    val ckpt2 = tempDir("landing-miss-ckpt2")
    drain(landing, out2, ckpt2, ignoreMissing = true)
    assert(readBack(out2).map(_._1) == Seq("a1"), "opt-in skip reads what remains")
  }

  test("stream: two writers' announcements interleave into one consumer") {
    val landing = tempDir("landing-two")
    val out  = tempDir("landing-two-out")
    val ckpt = tempDir("landing-two-ckpt")
    val dir = new Path(landing.toString)

    val live = writeGz(landing, "live-1.gz", Seq("live-1"))
    val bf   = writeGz(landing, "backfill-1.gz", Seq("backfill-1"))
    LandingLog.announce(fs, dir, Seq(live), "live")
    LandingLog.announce(fs, dir, Seq(bf), "backfill")
    drain(landing, out, ckpt)
    assert(readBack(out).map(_._1).sorted == Seq("backfill-1", "live-1"),
      "both writers' objects land; neither blocks the other")
  }
}
