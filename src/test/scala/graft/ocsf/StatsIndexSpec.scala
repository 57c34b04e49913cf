package graft.ocsf

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** File-skipping contract of [[StatsIndex]] / [[OcsfTables.loadWhere]]:
  * pruning must never change results (rows equal the full-scan filter
  * under every predicate shape, indexed or not), must actually skip
  * files whose stats exclude the predicate, and must degrade to
  * keep-everything for unindexed files (new batches, post-compaction
  * rewrites) and opaque predicates. */
class StatsIndexSpec extends SparkSpec {

  private val region = "us-east-1"
  private val acct = "123456789012"
  private val route = "DNS Activity"

  private def mkBase(): String =
    "file:" + Files.createTempDirectory("statsidx")

  /** Batch `b`: 64 rows, severity in [b*100, b*100+63], host prefixed
    * `h<b>x` — per-batch-disjoint ranges on both columns so per-file
    * stats can exclude whole batches. */
  private def batchDf(b: Int): DataFrame = {
    import spark.implicits._
    (0 until 64).map { i =>
      (s"u$b-$i", s"h${b}x$i", b * 100 + i)
    }.toDF("uid", "host", "severity")
      .select(struct(col("uid")).as("metadata"),
        to_timestamp(lit("2023-11-14 12:00:00")).as("time"),
        col("host"), col("severity"))
  }

  private def fsOf(base: String) = {
    val dir = new Path(s"$base/dns_activity")
    (dir.getFileSystem(spark.sparkContext.hadoopConfiguration), dir)
  }

  private def writeBatches(base: String, n: Int): Unit =
    (0 until n).foreach(b => IdempotentSink.writeBatch(batchDf(b), base,
      route, region, acct, batchId = b.toLong, filesPerDay = 1))

  /** loadWhere must equal the full-scan filter, row for row. */
  private def assertExact(base: String, cond: String): Unit = {
    val pruned = OcsfTables.loadWhere(spark, base, route, cond)
      .select("metadata.uid").collect().map(_.getString(0)).sorted.toSeq
    val full = OcsfTables.load(spark, base, route).filter(cond)
      .select("metadata.uid").collect().map(_.getString(0)).sorted.toSeq
    assert(pruned == full, s"loadWhere($cond) diverged from full filter")
  }

  private def keptCount(base: String, cond: String): Int = {
    val (fs, tableDir) = fsOf(base)
    OcsfTables.prunedFiles(spark, fs, tableDir, cond).size
  }

  test("incremental build; range/IN/LIKE/OR predicates skip files, rows exact") {
    val base = mkBase()
    writeBatches(base, 3)
    val (fs, tableDir) = fsOf(base)
    val total = IdempotentSink.committedFiles(fs, tableDir).size
    assert(total == 3)
    assert(OcsfTables.buildStats(spark, base, route,
      Seq("severity", "host")) == 3)
    assert(OcsfTables.buildStats(spark, base, route,
      Seq("severity", "host")) == 0, "second build must be a no-op")

    // range: only batch 2's file can hold severity > 250
    assert(keptCount(base, "severity > 250") == 1)
    assertExact(base, "severity > 250")
    // closed range nested inside one batch's span
    assert(keptCount(base, "severity >= 90 AND severity < 140") == 1)
    assertExact(base, "severity >= 90 AND severity < 140")
    // IN: values land in batches 0 and 1
    assert(keptCount(base, "severity IN (5, 105)") == 2)
    assertExact(base, "severity IN (5, 105)")
    // LIKE prefix on the string column
    assert(keptCount(base, "host LIKE 'h1%'") == 1)
    assertExact(base, "host LIKE 'h1%'")
    // OR of two prunable sides
    assert(keptCount(base, "severity < 50 OR severity > 250") == 2)
    assertExact(base, "severity < 50 OR severity > 250")
    // flipped operand order parses to the mirrored comparison
    assert(keptCount(base, "250 < severity") == 1)
    assertExact(base, "250 < severity")
    // nothing matches anywhere: zero files opened, empty result with schema
    assert(keptCount(base, "severity > 9000") == 0)
    assert(OcsfTables.loadWhere(spark, base, route, "severity > 9000")
      .count() == 0)
  }

  test("opaque predicates and opaque OR sides keep everything; AND keeps its prunable side") {
    val base = mkBase()
    writeBatches(base, 3)
    assert(OcsfTables.buildStats(spark, base, route, Seq("severity")) == 3)
    // whole predicate opaque → no pruning, still correct
    assert(keptCount(base, "pmod(severity, 7) = 3") == 3)
    assertExact(base, "pmod(severity, 7) = 3")
    // OR with one opaque side cannot prune (the opaque side alone may match)
    assert(keptCount(base, "severity > 250 OR pmod(severity, 7) = 3") == 3)
    assertExact(base, "severity > 250 OR pmod(severity, 7) = 3")
    // AND with one opaque side prunes on the understood side
    assert(keptCount(base, "severity > 250 AND pmod(severity, 7) = 3") == 1)
    assertExact(base, "severity > 250 AND pmod(severity, 7) = 3")
    // unindexed column (host has no stats under this build) → opaque
    assert(keptCount(base, "host LIKE 'h1%'") == 3)
    assertExact(base, "host LIKE 'h1%'")
  }

  test("unindexed new batches are always read; compaction rewrites read as unindexed until rebuilt") {
    val base = mkBase()
    writeBatches(base, 2)
    assert(OcsfTables.buildStats(spark, base, route, Seq("severity")) == 2)
    // a batch landing AFTER the build has no stats row — must be kept
    IdempotentSink.writeBatch(batchDf(9), base, route, region, acct,
      batchId = 9L, filesPerDay = 1)
    assert(keptCount(base, "severity > 800") == 1, "only the new file matches")
    assert(keptCount(base, "severity < 50") == 2,
      "batch 0 by stats, batch 9 as unindexed")
    assertExact(base, "severity > 800")
    // incremental refresh indexes exactly the delta
    assert(OcsfTables.buildStats(spark, base, route, Seq("severity")) == 1)
    assert(keptCount(base, "severity < 50") == 1)
    // compaction replaces every file; stale stats rows must not hide
    // the rewritten (unindexed) files. Z-ordering the rewrite on
    // severity re-clusters the ranges the hash split would interleave,
    // so a rebuilt index can prune again — the layout op and the stats
    // index composing is the point of both.
    val (fs, tableDir) = fsOf(base)
    assert(IdempotentSink.compactDataFiles(spark, tableDir,
      filesPerDay = 2, zorderCols = Seq("severity")) > 0)
    val total = IdempotentSink.committedFiles(fs, tableDir).size
    assert(total > 1, "compaction must keep multiple files for this test")
    assert(keptCount(base, "severity > 800") == total,
      "rewritten files are unindexed — all kept")
    assertExact(base, "severity > 800")
    val rescanned = OcsfTables.buildStats(spark, base, route, Seq("severity"))
    assert(rescanned == total)
    assert(keptCount(base, "severity > 800") < total, "pruning works again")
    assertExact(base, "severity > 800")
  }

  test("type guard: column-coercing comparisons never prune (string stats vs numeric literal)") {
    val base = mkBase()
    import spark.implicits._
    // digit-STRING column: string-ordered stats say nothing about the
    // numeric range ("05" < "3" as strings but 5 > 3 as numbers)
    def digitBatch(b: Int, vals: Seq[String]) = vals.zipWithIndex.map {
      case (v, i) => (s"u$b-$i", v)
    }.toDF("uid", "code")
      .select(struct(col("uid")).as("metadata"),
        to_timestamp(lit("2023-11-14 12:00:00")).as("time"), col("code"))
    IdempotentSink.writeBatch(digitBatch(0, Seq("05", "3")), base, route,
      region, acct, batchId = 0L, filesPerDay = 1)
    IdempotentSink.writeBatch(digitBatch(1, Seq("7", "9")), base, route,
      region, acct, batchId = 1L, filesPerDay = 1)
    assert(OcsfTables.buildStats(spark, base, route, Seq("code")) == 2)
    // numeric literal coerces the COLUMN: pruning must opt out (keep
    // both files) and the result must still be exact — "05" matches 5
    assert(keptCount(base, "code = 5") == 2)
    assertExact(base, "code = 5")
    assert(keptCount(base, "code >= 4") == 2)
    assertExact(base, "code >= 4")
    // string literal against string stats: pruning allowed and exact
    assert(keptCount(base, "code = '7'") == 1)
    assertExact(base, "code = '7'")
    // LIKE over a NON-string column: opt out, stay exact
    val base2 = mkBase()
    writeBatches(base2, 2)
    assert(OcsfTables.buildStats(spark, base2, route, Seq("severity")) == 2)
    assert(keptCount(base2, "severity LIKE '1%'") == 2)
    assertExact(base2, "severity LIKE '1%'")
  }

  test("null stats: comparisons prune all-null chunks, IS NULL finds them") {
    val base = mkBase()
    import spark.implicits._
    val withNulls = (0 until 8).map(i => (s"n$i", s"nx$i"))
      .toDF("uid", "host")
      .select(struct(col("uid")).as("metadata"),
        to_timestamp(lit("2023-11-14 12:00:00")).as("time"),
        col("host"), lit(null).cast("int").as("severity"))
    IdempotentSink.writeBatch(withNulls, base, route, region, acct,
      batchId = 0L, filesPerDay = 1)
    IdempotentSink.writeBatch(batchDf(1), base, route, region, acct,
      batchId = 1L, filesPerDay = 1)
    assert(OcsfTables.buildStats(spark, base, route, Seq("severity")) == 2)
    // all-null file excluded from any comparison
    assert(keptCount(base, "severity >= 0") == 1)
    assertExact(base, "severity >= 0")
    // IS NULL keeps only the file that has nulls
    assert(keptCount(base, "severity IS NULL") == 1)
    assertExact(base, "severity IS NULL")
    assert(keptCount(base, "severity IS NOT NULL") == 1)
    assertExact(base, "severity IS NOT NULL")
    // changing the indexed column set forces a rebuild
    assert(OcsfTables.buildStats(spark, base, route,
      Seq("severity", "host")) == 2)
  }

  test("100k-file manifest: prune is a distributed join, driver holds only survivors") {
    // Synthetic metadata-scale case (no data files needed — prune never
    // opens one): a 100k-row stats index and a 100k-entry committed
    // list. The pruning join must complete and materialize ONLY the
    // surviving handful on the driver — the shape that holds when the
    // committed list is a month of a 100 TB feed.
    import spark.implicits._
    val n = 100000
    val base = Files.createTempDirectory("statsidx-scale").toString
    val tableDir = new Path(s"file:$base/t")
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // per-file disjoint severity ranges [i*10, i*10+9]
    spark.range(n).select(
      // canonical normalizePath form: scheme + "://" + empty authority
      concat(lit(s"file://$base/t/f"), lpad(col("id").cast("string"), 6, "0"))
        .as("file"),
      lit(64L).as("cnt"),
      (col("id") * 10).cast("int").as("min_severity"),
      (col("id") * 10 + 9).cast("int").as("max_severity"),
      lit(0L).as("nulls_severity"))
      .write.parquet(s"$base/t/_stats/index")
    val committed = (0 until n).map(i => new Path(f"file:$base/t/f$i%06d")) :+
      new Path(s"file:$base/t/unindexed-extra") // no stats row → always kept
    // predicate touches the top 3 files' ranges only
    val lo = (n - 3) * 10
    val kept = StatsIndex.prune(spark, fs, tableDir, committed,
      s"severity >= $lo")
    assert(kept.map(_.getName).toSet ==
      Set(f"f${n - 3}%06d", f"f${n - 2}%06d", f"f${n - 1}%06d",
        "unindexed-extra"),
      s"expected 3 surviving indexed files + the unindexed one, got " +
        s"${kept.size}: ${kept.take(8).mkString(", ")}")
    // and an unprunable predicate still keeps everything (no silent drop)
    assert(StatsIndex.prune(spark, fs, tableDir, committed,
      s"pmod(severity, 7) = 3").size == committed.size)
  }

  test("committedFilesDF matches the driver read contract, before and after compaction") {
    val base = mkBase()
    writeBatches(base, 3)
    val (fs, tableDir) = fsOf(base)
    def dfKeys: Set[String] = IdempotentSink.committedFilesDF(spark, tableDir)
      .select("file").collect().map(_.getString(0)).toSet
    def driverKeys: Set[String] = IdempotentSink.committedFiles(fs, tableDir)
      .map(p => IdempotentSink.normalizePath(fs, p)).toSet
    val before = dfKeys
    assert(before == driverKeys && before.size == 3)
    // lengths ride along and match the physical files
    IdempotentSink.committedFilesDF(spark, tableDir).collect().foreach { r =>
      assert(fs.getFileStatus(new Path(new java.net.URI(r.getString(0))))
        .getLen == r.getLong(1))
    }
    // fold the per-batch pairs: the superseded manifests stay on disk
    // until cleanup, so the anti-join must exclude their entries
    assert(IdempotentSink.compactCommits(fs, tableDir) > 0)
    assert(dfKeys == driverKeys, "post-compaction contract diverged")
    assert(dfKeys == before, "a metadata-only fold must not change the files")
  }

  test("load's distributed-listing path is the DEFAULT above the size threshold and matches the driver path") {
    val base = mkBase()
    writeBatches(base, 3)
    def uids(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("metadata.uid").collect().map(_.getString(0)).sorted.toSeq
    // guarded read = the driver-side maintenance path
    val driverPath = uids(OcsfTables.load(spark, base, route,
      verifyAppends = true))
    spark.conf.set("spark.graft.distributedListingBytes", "0")
    try {
      // a "big" manifest (threshold 0) must take the executor-side
      // listing with DEFAULT arguments — no opt-in flag required
      val distributed = uids(OcsfTables.load(spark, base, route))
      assert(distributed == driverPath && distributed.size == 3 * 64)
      // partition columns must survive the explicit file list
      val parts = OcsfTables.load(spark, base, route)
        .select("region", "accountId", "eventDay").distinct().collect()
      assert(parts.nonEmpty && parts.forall(_.getString(0) == region))
      // registerAll inherits the same default scale path
      val views = OcsfTables.registerAll(spark, base)
      assert(views.contains("ocsf_dns_activity"))
      assert(spark.table("ocsf_dns_activity").count() == 3 * 64)
    } finally spark.conf.unset("spark.graft.distributedListingBytes")
  }

  test("committedFilesDF raises on an unreadable committed manifest") {
    val base = mkBase()
    writeBatches(base, 2)
    val (fs, tableDir) = fsOf(base)
    val cb = new Path(tableDir, "_committed_batches")
    // torn manifest: body truncated past the header — parse yields None
    val victim = new Path(cb, "1.manifest")
    val os = fs.create(victim, true)
    try os.write("#graft-manifest files=1\n".getBytes("UTF-8"))
    finally os.close()
    val e = intercept[Exception] {
      IdempotentSink.committedFilesDF(spark, tableDir).count()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("committed manifest unreadable")),
      s"unexpected failure: ${chain(e).mkString(" | ")}")
  }

  test("distributed listing+prune: a 120k-entry commit log reads with O(survivors) driver materialization") {
    // the pre-Delta metadata bottleneck case: the file universe exists
    // ONLY in manifests (no physical data files needed for the
    // metadata path), the driver never parses a manifest body, and the
    // only O(files)-shaped thing it ever holds is prunedFiles' return
    val base = Files.createTempDirectory("dlist").toString
    val tableDir = new Path(s"file:$base/t")
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cb = new Path(tableDir, "_committed_batches")
    fs.mkdirs(cb)
    def put(p: Path, body: String): Unit = {
      val os = fs.create(p, true)
      try os.write(body.getBytes("UTF-8")) finally os.close()
    }
    val nManifests = 12
    val per = 10000
    def rel(m: Int, i: Int) =
      f"eventDay=2023-11-${m + 1}%02d/part-$m-$i%05d.parquet"
    (0 until nManifests).foreach { m =>
      val entries = (0 until per).map(i => s"g0/${rel(m, i)}\t100")
      put(new Path(cb, s"$m.manifest"),
        (s"#graft-manifest files=$per" +: entries :+ "#end").mkString("\n"))
      put(new Path(cb, s"$m.committed"), "")
    }
    // a superseded pair whose files must NOT appear, and the fold that
    // replaces it with 100 files of its own
    val oldEntries = (0 until 500).map(i => s"g0/dead/f$i.parquet\t1")
    put(new Path(cb, "50.manifest"),
      ("#graft-manifest files=500" +: oldEntries :+ "#end").mkString("\n"))
    put(new Path(cb, "50.committed"), "")
    val foldEntries = (0 until 100).map(i => s"c/fold/f$i.parquet\t1")
    put(new Path(cb, "compact-0.manifest"),
      (Seq("#graft-manifest files=100", "#supersedes 50") ++
        foldEntries :+ "#end").mkString("\n"))
    put(new Path(cb, "compact-0.committed"), "")
    val expectedN = nManifests * per + 100
    val df = IdempotentSink.committedFilesDF(spark, tableDir)
    assert(df.count() == expectedN)
    assert(df.filter(col("file").contains("/dead/")).count() == 0,
      "superseded pair's entries leaked into the contract")
    // hand-written stats index covering EVERY file: per-file disjoint
    // severity points; the fold's files sit at severity -1
    val baseKey = IdempotentSink.normalizePath(fs, tableDir)
    import spark.implicits._
    val idxMain = spark.range(nManifests.toLong * per).select(
      concat(lit(baseKey + "/"),
        expr(s"printf('eventDay=2023-11-%02d/part-%d-%05d.parquet', " +
          s"CAST(id / $per AS INT) + 1, CAST(id / $per AS INT), " +
          s"CAST(id % $per AS INT))")).as("file"),
      lit(1L).as("cnt"),
      col("id").cast("int").as("min_severity"),
      col("id").cast("int").as("max_severity"),
      lit(0L).as("nulls_severity"))
    val idxFold = spark.range(100).select(
      concat(lit(baseKey + "/fold/f"), col("id").cast("string"),
        lit(".parquet")).as("file"),
      lit(1L).as("cnt"), lit(-1).as("min_severity"),
      lit(-1).as("max_severity"), lit(0L).as("nulls_severity"))
    idxMain.union(idxFold).write.parquet(s"$base/t/_stats/index")
    val lo = nManifests * per - 2 // top 2 files only
    val survivors = OcsfTables.prunedFiles(spark, fs, tableDir,
      s"severity >= $lo")
    assert(survivors.size == 2,
      s"expected 2 survivors, got ${survivors.size}")
    assert(survivors.map(_.getName).toSet ==
      Set(f"part-${nManifests - 1}-${per - 1}%05d.parquet",
        f"part-${nManifests - 1}-${per - 2}%05d.parquet"))
  }
}
