package graft.sources

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}

/** The landing NOTIFICATION log — the reference's S3→SQS event feed
  * re-expressed as an append-only file log (reference:
  * /root/reference/README.md:34-38 — objects land in S3, S3 event
  * notifications enqueue to SQS, the loader consumes the queue and
  * never lists the bucket).
  *
  * Why it exists: a file-source stream discovers work by LISTING the
  * landing prefix every trigger and diffing against a seen-files map
  * in the checkpoint. At 100 TB/day (~10⁶ objects/day) that is an
  * O(all-files-ever) LIST plus an ever-growing checkpoint map, paid
  * every 10 seconds — the real ingest bottleneck, and exactly what SQS
  * exists to avoid. This log inverts discovery: the LANDER announces
  * each batch of objects it publishes, and the stream reads only the
  * announcements — per-trigger cost tracks the ingest DELTA, not the
  * table's lifetime.
  *
  * Layout: `<landingDir>/_notify/notif-<writer>-<seq>` — underscore
  * dir, so file-source globs and our own listing-mode reader treat it
  * as hidden. Each notification is a self-terminating text file
  * (count header + `#end` trailer, the [[graft.ocsf.IdempotentSink]]
  * manifest convention) listing the landed object paths; a torn PUT is
  * detectable at any cut and fails loudly rather than silently
  * skipping objects. Published write-temp-then-rename.
  *
  * Multi-writer: each landing process owns a writer id (the
  * IdempotentSink writer-namespace stance) and its seqs are assigned
  * by rename-if-absent, so two landers never contend on one counter.
  * Records carry their (seq, idx) identity EXPLICITLY, which makes
  * [[compact]] reader-safe: folding N notification files into one
  * `merged-` file preserves every record's identity, so a consumer
  * whose checkpoint offset is mid-range resumes exactly where it was
  * and replays nothing (the analog of compactCommits' `#supersedes`).
  */
object LandingLog {

  /** One announced object: identity is (writer, seq, idx). */
  final case class Rec(path: String, seq: Long, idx: Int)

  /** A notification file as listed: `merged` files fold many seqs (all
    * ≤ `seq`); plain files hold exactly the records of `seq`. */
  final case class NotifFile(file: Path, writer: String, seq: Long, merged: Boolean)

  private val Header = "#graft-notify records="
  private val Trailer = "#end"
  private val NotifName = """notif-([A-Za-z0-9_.]+)-(\d{12})""".r
  private val MergedName = """merged-([A-Za-z0-9_.]+)-(\d{12})""".r

  def notifyDir(landingDir: Path): Path = new Path(landingDir, "_notify")

  /** JSON-escape a path for the one-record-per-line body. */
  private def esc(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  private def unesc(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => b.append('"'); i += 2
          case '\\' => b.append('\\'); i += 2
          case 'u' => b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => b.append(other); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Record line: `<seq>\t<idx>\t"<escaped path>"`. Tab-framed with the
    * path JSON-escaped, so any legal filesystem path round-trips. */
  private def recLine(r: Rec): String = s"""${r.seq}\t${r.idx}\t"${esc(r.path)}""""

  private def parseRecLine(line: String, file: Path): Rec = {
    val t1 = line.indexOf('\t')
    val t2 = line.indexOf('\t', t1 + 1)
    if (t1 < 0 || t2 < 0 || line.length < t2 + 3 ||
        line.charAt(t2 + 1) != '"' || line.last != '"')
      throw new IllegalStateException(s"corrupt notification record in $file: $line")
    Rec(unesc(line.substring(t2 + 2, line.length - 1)),
        line.substring(0, t1).toLong, line.substring(t1 + 1, t2).toInt)
  }

  private def writeAtomic(fs: FileSystem, dst: Path, content: String): Boolean = {
    fs.mkdirs(dst.getParent)
    val tmp = new Path(dst.getParent, s".${dst.getName}.tmp")
    val os = fs.create(tmp, true)
    try os.write(content.getBytes(StandardCharsets.UTF_8)) finally os.close()
    // rename-if-absent is the seq claim: a concurrent same-writer
    // announce loses the rename and retries at the next seq
    if (fs.exists(dst)) { fs.delete(tmp, false); false }
    else if (fs.rename(tmp, dst)) true
    else { fs.delete(tmp, false); false }
  }

  private def render(recs: Seq[Rec]): String =
    (s"$Header${recs.size}" +: recs.map(recLine) :+ Trailer).mkString("\n") + "\n"

  /** List notification files (plain + merged), tolerating the empty /
    * absent dir. Names that match neither pattern (torn tmp files,
    * stray drops) are ignored — they can never be claimed seqs. */
  def listNotifications(fs: FileSystem, landingDir: Path): Seq[NotifFile] = {
    val dir = notifyDir(landingDir)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case NotifName(w, s) => Some(NotifFile(st.getPath, w, s.toLong, merged = false))
        case MergedName(w, s) => Some(NotifFile(st.getPath, w, s.toLong, merged = true))
        case _ => None
      }
    }
  }

  /** Read one notification file's records, verifying the count header
    * and `#end` trailer — a torn publish THROWS (loud, replayable)
    * instead of silently under-delivering objects. */
  def readRecords(fs: FileSystem, nf: NotifFile): Seq[Rec] = {
    val in = fs.open(nf.file)
    val text = try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val lines = text.split("\n", -1).toSeq.filter(_.nonEmpty)
    if (lines.isEmpty || !lines.head.startsWith(Header) || lines.last != Trailer)
      throw new IllegalStateException(
        s"torn notification ${nf.file}: missing header/trailer")
    val declared = lines.head.stripPrefix(Header).toInt
    val recs = lines.slice(1, lines.size - 1).map(parseRecLine(_, nf.file))
    if (recs.size != declared)
      throw new IllegalStateException(
        s"torn notification ${nf.file}: declared $declared records, found ${recs.size}")
    recs
  }

  /** Announce landed objects: the lander calls this AFTER its objects
    * are fully published (the S3 PutObject→notification ordering).
    * Paths may be absolute or relative to `landingDir`. Returns the
    * claimed seq. One announcement per lander batch — thousands of
    * objects per notification is the intended shape. */
  def announce(fs: FileSystem, landingDir: Path, paths: Seq[String],
               writerId: String = "w0"): Long = {
    require(paths.nonEmpty, "announce of zero paths")
    require(writerId.matches("[A-Za-z0-9_.]+"), s"writer id '$writerId' (alnum/_/. only)")
    val existing = listNotifications(fs, landingDir).filter(_.writer == writerId)
    var seq = if (existing.isEmpty) 1L else existing.map(_.seq).max + 1L
    var attempts = 0
    while (attempts < 1000) {
      val recs = paths.zipWithIndex.map { case (p, i) => Rec(p, seq, i) }
      val dst = new Path(notifyDir(landingDir), f"notif-$writerId-$seq%012d")
      if (writeAtomic(fs, dst, render(recs))) return seq
      seq += 1; attempts += 1
    }
    throw new IllegalStateException(
      s"could not claim a notification seq for writer $writerId after 1000 attempts " +
        "— is another process using the same writer id?")
  }

  /** Bootstrap: announce every data object already under `landingDir`
    * (recursive; `_`/`.`-prefixed names skipped at every level — the
    * notify dir, checkpoints, tmp files). The Auto-Loader-style
    * backfill for adopting a prefix that predates the log. Returns the
    * announced count (0 announces nothing). */
  def announceExisting(fs: FileSystem, landingDir: Path,
                       writerId: String = "bootstrap"): Int = {
    def visible(p: Path): Boolean =
      !p.getName.startsWith("_") && !p.getName.startsWith(".")
    def walk(dir: Path): Seq[String] =
      fs.listStatus(dir).toSeq.filter(st => visible(st.getPath)).flatMap { st =>
        if (st.isDirectory) walk(st.getPath) else Seq(st.getPath.toString)
      }
    val found = walk(landingDir).sorted
    if (found.nonEmpty) announce(fs, landingDir, found, writerId)
    found.size
  }

  /** Fold each writer's notification files into one `merged-` file so
    * the per-trigger notification LIST stays O(writers), not
    * O(announcements-ever) — compactCommits for the notify log.
    *
    * Reader-safe at any interleaving: records keep their (seq, idx)
    * identity, the merged file publishes BEFORE the originals are
    * deleted (a concurrent reader seeing both dedups on identity), and
    * a crash mid-delete is re-foldable. Returns files removed. */
  def compact(fs: FileSystem, landingDir: Path): Int = {
    var removed = 0
    listNotifications(fs, landingDir).groupBy(_.writer).foreach { case (w, files) =>
      if (files.size > 1) {
        val recs = files.sortBy(f => (f.seq, f.merged))
          .flatMap(readRecords(fs, _))
          .groupBy(r => (r.seq, r.idx)).map(_._2.head).toSeq
          .sortBy(r => (r.seq, r.idx))
        val top = files.map(_.seq).max
        val dst = new Path(notifyDir(landingDir), f"merged-$w-$top%012d")
        // overwrite-tolerant: re-running a crashed compact re-renders
        // the identical content
        fs.delete(dst, false)
        if (!writeAtomic(fs, dst, render(recs)))
          throw new IllegalStateException(s"could not publish $dst")
        files.filterNot(_.file.getName == dst.getName).foreach { f =>
          if (fs.delete(f.file, false)) removed += 1
        }
      }
    }
    removed
  }

  /** All records across the log for `landingDir`, deduped on identity
    * — the full announced universe, in (writer, seq, idx) order. */
  def allRecords(fs: FileSystem, landingDir: Path): Seq[(String, Rec)] = {
    val byWriter = mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[(Long, Int), Rec]]
    listNotifications(fs, landingDir).sortBy(f => (f.writer, f.seq)).foreach { nf =>
      val m = byWriter.getOrElseUpdate(nf.writer, mutable.LinkedHashMap.empty)
      readRecords(fs, nf).foreach(r => m.getOrElseUpdate((r.seq, r.idx), r))
    }
    byWriter.toSeq.flatMap { case (w, m) =>
      m.values.toSeq.sortBy(r => (r.seq, r.idx)).map(w -> _)
    }
  }
}
