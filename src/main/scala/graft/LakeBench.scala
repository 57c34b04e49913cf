package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.ocsf.{IdempotentSink, OcsfTables}

/** Measures what the lake's read-side maintenance actually buys: the
  * same narrow predicate over the same committed table, scanned three
  * ways — (1) full manifest read + filter, (2) stats-index pruned read
  * over the raw (unclustered) layout, (3) pruned read after a z-order
  * re-layout. Reports wall seconds and the FILE COUNTS each plan
  * opens, which is the number that survives the 1000-executor
  * scale-up: at 100 TB the full scan opens every object behind the
  * manifest, the pruned+clustered read opens only the few files whose
  * min-max boxes intersect the predicate.
  *
  * Usage: `runMain graft.LakeBench [nEvents] [days] [filesPerDay]`
  * (defaults 2M, 8, 8). Prints ONE JSON line. */
object LakeBench {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(2000000L)
    val days = args.lift(1).map(_.toInt).getOrElse(8)
    val filesPerDay = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = GraftSession.get()
    import spark.implicits._
    val route = "DNS Activity"
    val base = "file:" + java.nio.file.Files
      .createTempDirectory("lakebench").toString
    val tableDir = new Path(s"$base/dns_activity")
    val fs = tableDir.getFileSystem(spark.sessionState.newHadoopConf())

    // synthetic table: nEvents rows spread uniformly over `days` days,
    // severity cycling 0..99 decorrelated from time — so a (time x
    // severity) box predicate needs BOTH dimensions clustered to prune
    val day0 = 1700000000L // 2023-11-14T22:13:20Z
    val batches = 8
    val perBatch = nEvents / batches
    (0 until batches).foreach { b =>
      val df = spark.range(b * perBatch, (b + 1) * perBatch)
        .select(struct(concat(lit("u"), col("id")).as("uid")).as("metadata"),
          timestamp_seconds(lit(day0) +
            pmod(col("id") * 7919L, lit(days * 86400L))).as("time"),
          pmod(col("id") * 104729L, lit(100L)).cast("int").as("severity"))
      IdempotentSink.writeBatch(df, base, route, "us-east-1",
        "123456789012", batchId = b.toLong, filesPerDay = filesPerDay)
    }
    val committed0 = IdempotentSink.committedFiles(fs, tableDir).size
    // one day's one-hour window x a severity decile
    val cond = "time >= timestamp'2023-11-17 00:00:00' AND " +
      "time < timestamp'2023-11-17 01:00:00' AND " +
      "severity >= 40 AND severity < 50"

    def fullCount(): Long =
      OcsfTables.load(spark, base, route, verifyAppends = false)
        .filter(cond).count()
    def prunedCount(): Long =
      OcsfTables.loadWhere(spark, base, route, cond).count()

    val (nFull, tFull) = timed(fullCount())

    // stats over the RAW layout (each file spans all days x all
    // severities — stats exist but exclude nothing)
    OcsfTables.buildStats(spark, base, route, Seq("time", "severity"))
    val rawKept = OcsfTables.prunedFiles(spark, fs, tableDir, cond).size
    val (nRaw, tRaw) = timed(prunedCount())

    // z-order re-layout + fresh stats: min-max boxes tighten on both
    // dimensions and the same predicate now skips most files
    IdempotentSink.compactDataFiles(spark, tableDir,
      filesPerDay = filesPerDay, zorderCols = Seq("time", "severity"))
    OcsfTables.buildStats(spark, base, route, Seq("time", "severity"))
    val committed1 = IdempotentSink.committedFiles(fs, tableDir).size
    val zKept = OcsfTables.prunedFiles(spark, fs, tableDir, cond).size
    val (nZ, tZ) = timed(prunedCount())

    require(nFull == nRaw && nRaw == nZ,
      s"row counts diverged: full=$nFull raw=$nRaw zorder=$nZ")

    // the full lake MAINTENANCE CYCLE in the loop (r18): GDPR-erase a
    // row slice (A27 deleteWhere — rewrite-not-tombstone), fold the
    // accumulated commit pairs (compactCommits), rebuild the stats
    // index, and re-measure the SAME pruned read — the composition a
    // month of production (ingest + erasure requests + nightly
    // maintenance) actually runs, verified to keep the read fast and
    // exact rather than assumed to
    val inWindow = OcsfTables.loadWhere(spark, base, route, cond)
      .filter("metadata.uid like 'u19%'").count()
    val (nErased, tErase) = timed(
      IdempotentSink.deleteWhere(spark, tableDir,
        "metadata.uid like 'u19%'",
        filesPerDay = filesPerDay, zorderCols = Seq("time", "severity")))
    val (folded, tCompact) = timed(
      IdempotentSink.compactCommits(fs, tableDir))
    val (_, tStats) = timed(
      OcsfTables.buildStats(spark, base, route, Seq("time", "severity")))
    val committed2 = IdempotentSink.committedFiles(fs, tableDir).size
    val mKept = OcsfTables.prunedFiles(spark, fs, tableDir, cond).size
    val (nM, tM) = timed(prunedCount())
    require(nM == nZ - inWindow,
      s"post-erasure count wrong: $nM != $nZ - $inWindow")

    println(
      s"""{"metric":"lake_read","rows":$nFull,"events":$nEvents,"unit":"sec"""" +
      s""","full_scan_sec":${f"$tFull%.3f"},"files_total":$committed0""" +
      s""","pruned_raw_sec":${f"$tRaw%.3f"},"files_raw_kept":$rawKept""" +
      s""","pruned_zorder_sec":${f"$tZ%.3f"},"files_zorder_total":$committed1""" +
      s""","files_zorder_kept":$zKept""" +
      s""","erased_rows":$nErased,"erase_sec":${f"$tErase%.3f"}""" +
      s""","compacted_pairs":$folded,"compact_sec":${f"$tCompact%.3f"}""" +
      s""","stats_rebuild_sec":${f"$tStats%.3f"}""" +
      s""","post_maintenance_files_total":$committed2""" +
      s""","post_maintenance_files_kept":$mKept""" +
      s""","post_maintenance_pruned_sec":${f"$tM%.3f"}}""")
    spark.stop()
  }
}
