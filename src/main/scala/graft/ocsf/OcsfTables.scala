package graft.ocsf

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader side of the lake (the reference's Athena consumption surface,
  * /root/reference/README.md:48): load any OCSF class table written by
  * [[OcsfSink]] and register all of them as temp views so the full SQL
  * surface runs over them.
  *
  * Tables landed through [[IdempotentSink]] are read through their
  * batch-commit log ([[IdempotentSink.committedFiles]]): the reader
  * opens exactly the data files the committed manifests name, so it
  * sees each row exactly once on ANY store — including one whose
  * rename is a non-atomic copy+delete (S3A), where a directory scan
  * could otherwise glimpse a mid-promote batch. Partition columns and
  * pruning survive the explicit file list via `basePath`. Tables
  * written by the plain append sink fall back to the directory scan.
  * A table is one or the other — mixing plain appends and committed
  * batches under one prefix is out of contract, and [[load]] REJECTS
  * it (a stray final-path file named by no manifest raises instead of
  * being silently dropped from the read).
  *
  * Partition pruning comes free either way: `region`/`accountId`/
  * `eventDay` are directory partitions, so `WHERE eventDay = ...`
  * prunes files before any IO.
  */
object OcsfTables {

  def load(spark: SparkSession, baseDir: String, route: String): DataFrame = {
    val tableDir = new Path(s"$baseDir/${OcsfSink.tableName(route)}")
    val fs = tableDir.getFileSystem(spark.sessionState.newHadoopConf())
    if (IdempotentSink.hasCommitLog(fs, tableDir)) {
      // mixed-table guard: a data file at a final path that NO manifest
      // (committed or in-flight) names was plain-appended outside the
      // commit log — it would be silently invisible to this reader, so
      // fail loudly instead of narrowing the result. ORDER MATTERS
      // under a live writer: list data files FIRST, manifests second,
      // so a batch promoted between the two passes is covered by the
      // (earlier-published) manifest the second pass reads — the
      // reverse order would flag it as a stray. readContract feeds both
      // the guard superset and the committed file list from ONE
      // manifest parse, so the reader pays the control-file GET tax
      // once per load, not per view.
      val dataFiles = finalDataFiles(fs, tableDir)
      val (files, named) = IdempotentSink.readContract(fs, tableDir)
      require(files.nonEmpty,
        s"$tableDir has a batch-commit log but no committed data files")
      // re-check existence on candidates only (normally zero): a file a
      // concurrent cleanup deleted between the two passes is not a stray
      val strays = dataFiles.filterNot(named.contains).filter(fs.exists)
      require(strays.isEmpty,
        s"$tableDir mixes plain appends with committed batches (out of " +
          s"contract): ${strays.size} data file(s) at final paths are not " +
          s"named by any batch manifest and would be invisible to the " +
          s"manifest reader; first: ${strays.headOption.getOrElse("")}")
      spark.read.option("basePath", tableDir.toString)
        .parquet(files.map(_.toString): _*)
    } else spark.read.parquet(tableDir.toString)
  }

  /** Qualified data files at FINAL paths — everything outside the
    * underscore-hidden control/staging dirs. */
  private def finalDataFiles(fs: FileSystem, tableDir: Path): Seq[Path] = {
    val it = fs.listFiles(tableDir, true)
    val out = Seq.newBuilder[Path]
    while (it.hasNext) {
      val f = it.next().getPath
      val rel = fs.makeQualified(tableDir).toUri
        .relativize(fs.makeQualified(f).toUri).getPath
      if (!rel.split('/').exists(s => s.startsWith("_") || s.startsWith(".")))
        out += fs.makeQualified(f)
    }
    out.result()
  }

  /** Registers every sink-route table that has data under `baseDir` as
    * a temp view named like `ocsf_process_activity`. Routes with no
    * events write only a _SUCCESS marker (no schema to infer) and are
    * skipped. Returns the views registered.
    *
    * Probing goes through the Hadoop FileSystem API so the same call
    * works against `s3a://` / `hdfs://` lakes, not just the local FS. */
  def registerAll(spark: SparkSession, baseDir: String): Seq[String] = {
    val hadoopConf = spark.sessionState.newHadoopConf()
    OcsfMappings.routes.flatMap { route =>
      val name = OcsfSink.tableName(route)
      val dir = new Path(s"$baseDir/$name")
      val fs = dir.getFileSystem(hadoopConf)
      val hasData =
        if (IdempotentSink.hasCommitLog(fs, dir))
          IdempotentSink.committedFiles(fs, dir).nonEmpty
        else fs.exists(dir) && hasAnyParquet(fs, dir)
      if (hasData) {
        load(spark, baseDir, route).createOrReplaceTempView(s"ocsf_$name")
        Some(s"ocsf_$name")
      } else None
    }
  }

  /** Per-route result of [[compactAll]]: batch pairs folded by the
    * data rewrite and by the control-file merge. */
  final case class Compacted(dataPairs: Int, controlPairs: Int)

  /** Lake-wide maintenance entry point: for every route table with a
    * commit log, rewrite small per-batch data files into `filesPerDay`
    * files per day ([[IdempotentSink.compactDataFiles]]) and fold any
    * remaining control pairs ([[IdempotentSink.compactCommits]] — the
    * data pass already leaves one pair when it runs, so the control
    * pass only fires when the data was already at target layout).
    * OFFLINE, single operator — the same contract as the per-table
    * calls. Returns per-table counts for the routes that had a log. */
  def compactAll(spark: SparkSession, baseDir: String,
                 filesPerDay: Int = 1): Map[String, Compacted] = {
    val hadoopConf = spark.sessionState.newHadoopConf()
    OcsfMappings.routes.flatMap { route =>
      val dir = new Path(s"$baseDir/${OcsfSink.tableName(route)}")
      val fs = dir.getFileSystem(hadoopConf)
      if (IdempotentSink.hasCommitLog(fs, dir)) {
        val data = IdempotentSink.compactDataFiles(spark, dir, filesPerDay)
        val control = IdempotentSink.compactCommits(fs, dir)
        Some(OcsfSink.tableName(route) -> Compacted(data, control))
      } else None
    }.toMap
  }

  /** Recursive object listing — one LIST call family on S3, no
    * per-directory round trips. */
  private def hasAnyParquet(fs: FileSystem, dir: Path): Boolean = {
    val it = fs.listFiles(dir, true)
    var found = false
    while (!found && it.hasNext)
      found = it.next().getPath.getName.endsWith(".parquet")
    found
  }
}
