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

  /** `verifyAppends` arms the mixed-table stray guard (below). It is a
    * MISCONFIGURATION detector, not a runtime invariant, and it costs
    * a recursive listing of every data file in the table — fine at
    * test scale and on fresh tables, an O(10⁵–10⁶ objects) LIST tax on
    * a months-old streaming table. OFF by default (r14): the default
    * read path is the scale path — big commit logs parse their
    * manifests in executors — and the guard is the opt-in maintenance
    * check (pass true from an audit job, or after suspecting an
    * out-of-band append). */
  /** `mergeSchemas` crosses an ADDITIVE schema-evolution boundary
    * ([[SchemaEvolution]]): batches written before a column was added
    * serve null for it. It costs a footer read per file (Spark's
    * parquet schema merge), so at scale prefer an explicit
    * `spark.read.schema(evolvedSchema)` over the same file list — this
    * flag is the zero-setup path for occasional readers. */
  def load(spark: SparkSession, baseDir: String, route: String,
           verifyAppends: Boolean = false,
           mergeSchemas: Boolean = false): DataFrame = {
    val (fs, tableDir) = tableFs(spark, baseDir, route)
    if (IdempotentSink.hasCommitLog(fs, tableDir)) {
      // big commit log + no stray guard (the documented at-scale
      // setting): parse the manifests in EXECUTORS and hand the driver
      // only the final path array Spark's planner needs anyway. The
      // guard path must stay driver-side — it needs the in-flight
      // manifest superset too.
      if (!verifyAppends &&
          manifestBytes(fs, tableDir) > distributedListingBytes(spark)) {
        val files = IdempotentSink.committedFilesDF(spark, tableDir)
          .select("file").collect()
          .map(r => new Path(new java.net.URI(r.getString(0)))).toSeq
        require(files.nonEmpty,
          s"$tableDir has a batch-commit log but no committed data files")
        val reader = spark.read.option("basePath", tableDir.toString)
        (if (mergeSchemas) reader.option("mergeSchema", "true") else reader)
          .parquet(files.map(_.toString): _*)
      } else loadCommitted(spark, fs, tableDir,
        IdempotentSink.readContract(fs, tableDir), verifyAppends,
        mergeSchemas)
    } else if (mergeSchemas)
      spark.read.option("mergeSchema", "true").parquet(tableDir.toString)
    else spark.read.parquet(tableDir.toString)
  }

  /** Total control-file bytes — the cheap proxy for commit-log entry
    * count (one LIST, already paid by `hasCommitLog`'s existence
    * probe). Above [[DistributedListingBytes]] (~100k+ file entries)
    * the driver-side manifest parse is worth a Spark job to avoid. */
  private def manifestBytes(fs: FileSystem, tableDir: Path): Long = {
    val cb = new Path(tableDir, "_committed_batches")
    if (!fs.exists(cb)) 0L
    else fs.listStatus(cb).iterator
      .filter(_.getPath.getName.endsWith(".manifest")).map(_.getLen).sum
  }

  /** ~100k file entries at typical path lengths; override with
    * `spark.graft.distributedListingBytes` (0 forces the distributed
    * path — how the spec pins load-path parity). */
  private def distributedListingBytes(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.distributedListingBytes")
      .map(_.toLong).getOrElse(8L * 1024 * 1024)

  private def loadCommitted(spark: SparkSession, fs: FileSystem,
                            tableDir: Path,
                            contract: (Seq[Path], Set[Path]),
                            verifyAppends: Boolean,
                            mergeSchemas: Boolean = false): DataFrame = {
    val (files, named) = contract
    require(files.nonEmpty,
      s"$tableDir has a batch-commit log but no committed data files")
    if (verifyAppends) {
      // mixed-table guard: a data file at a final path that NO manifest
      // (committed or in-flight) names was plain-appended outside the
      // commit log — it would be silently invisible to this reader, so
      // fail loudly instead of narrowing the result. ORDER MATTERS
      // under a live writer: the data listing must happen while (or
      // before) the manifests cover it, so a batch promoted after the
      // contract snapshot is re-checked against a FRESH contract
      // rather than flagged.
      val strays0 = finalDataFiles(fs, tableDir).filterNot(named.contains)
      val strays =
        if (strays0.isEmpty) strays0
        else { // racing a live writer? re-snapshot the contract once
          val fresh = IdempotentSink.readContract(fs, tableDir)._2
          strays0.filterNot(fresh.contains).filter(fs.exists)
        }
      require(strays.isEmpty,
        s"$tableDir mixes plain appends with committed batches (out of " +
          s"contract): ${strays.size} data file(s) at final paths are not " +
          s"named by any batch manifest and would be invisible to the " +
          s"manifest reader; first: ${strays.headOption.getOrElse("")}")
    }
    val reader = spark.read.option("basePath", tableDir.toString)
    (if (mergeSchemas) reader.option("mergeSchema", "true") else reader)
      .parquet(files.map(_.toString): _*)
  }

  /** Time travel: the table AS OF `asOfBatch` — exactly the rows the
    * batches with id <= `asOfBatch` committed. Backed by the commit
    * log alone (the manifests ARE the snapshot metadata — no extra
    * bookkeeping to maintain), so it costs the same control-file
    * LIST/GET as [[load]]. History granularity is bounded by
    * compaction: [[IdempotentSink.compactCommits]] /
    * [[IdempotentSink.compactDataFiles]] fold per-batch manifests, and
    * a request below the fold horizon THROWS instead of serving a
    * wrong snapshot — the same contract as Delta time travel vs
    * VACUUM. Partition pruning survives via `basePath`. */
  def loadAsOf(spark: SparkSession, baseDir: String, route: String,
               asOfBatch: Long): DataFrame = {
    val (fs, tableDir) = tableFs(spark, baseDir, route)
    require(IdempotentSink.hasCommitLog(fs, tableDir),
      s"$tableDir has no batch-commit log — time travel reads need a " +
        "table written through IdempotentSink")
    dfFor(spark, fs, tableDir,
      IdempotentSink.filesAsOf(fs, tableDir, asOfBatch))
  }

  /** Incremental consumption: only the rows committed AFTER
    * `afterBatch` — the delta a downstream consumer checkpointed at
    * `afterBatch` still needs. The lake is append-only, so the change
    * set is pure inserts and a consumer loop is just
    * `changesSince(last)` + checkpoint-the-new-max-batch. THROWS when
    * compaction already folded an unread batch (consumer checkpoints
    * must outpace the compaction cadence; size `compactCommits`'
    * `maxBatchId` / scheduling accordingly). */
  def changesSince(spark: SparkSession, baseDir: String, route: String,
                   afterBatch: Long): DataFrame = {
    val (fs, tableDir) = tableFs(spark, baseDir, route)
    require(IdempotentSink.hasCommitLog(fs, tableDir),
      s"$tableDir has no batch-commit log — incremental reads need a " +
        "table written through IdempotentSink")
    dfFor(spark, fs, tableDir,
      IdempotentSink.filesSince(fs, tableDir, afterBatch))
  }

  /** Build or refresh the file-skipping stats index for `route` on
    * `cols` (see [[StatsIndex]]). Incremental: returns the number of
    * newly indexed files. Run after ingest/compaction, like
    * [[compactAll]]. */
  def buildStats(spark: SparkSession, baseDir: String, route: String,
                 cols: Seq[String]): Int = {
    val (_, tableDir) = tableFs(spark, baseDir, route)
    StatsIndex.build(spark, tableDir, cols)
  }

  /** [[load]] restricted to SQL predicate `cond`, opening only the
    * committed files whose stats say the predicate could match
    * ([[StatsIndex]] file skipping; files the index doesn't cover are
    * always read). The exact predicate is re-applied to the surviving
    * rows, so the result equals `load(...).filter(cond)` whether or
    * not an index exists — the index only changes how many files are
    * opened. The mixed-table stray guard is [[load]]'s
    * misconfiguration detector, not repeated here (it would relist
    * every data file and defeat the point of skipping). */
  def loadWhere(spark: SparkSession, baseDir: String, route: String,
                cond: String): DataFrame = {
    val (fs, tableDir) = tableFs(spark, baseDir, route)
    require(IdempotentSink.hasCommitLog(fs, tableDir),
      s"$tableDir has no batch-commit log — stats-pruned reads need a " +
        "table written through IdempotentSink")
    dfFor(spark, fs, tableDir, prunedFiles(spark, fs, tableDir, cond))
      .filter(cond)
  }

  /** Row-level erasure for `route`: permanently delete every row
    * matching SQL predicate `cond` (see [[IdempotentSink.deleteWhere]]
    * for the mechanism, crash contract, and erasure semantics — NULL
    * rows kept, time travel below the new horizon throws, live
    * backfill writers refuse). Returns rows deleted. */
  def deleteWhere(spark: SparkSession, baseDir: String, route: String,
                  cond: String, filesPerDay: Int = 1,
                  zorderCols: Seq[String] = Nil): Long = {
    val (_, tableDir) = tableFs(spark, baseDir, route)
    IdempotentSink.deleteWhere(spark, tableDir, cond, filesPerDay, zorderCols)
  }

  /** The file list [[loadWhere]] would open — exposed for maintenance
    * jobs and tests to observe skipping. Fully distributed end-to-end:
    * the committed universe is [[IdempotentSink.committedFilesDF]]
    * (manifests parsed in executors, O(control pairs) on the driver)
    * and the stats prune is [[StatsIndex.pruneDF]]'s join, so the ONLY
    * O(files)-shaped driver materialization is this method's return —
    * the SURVIVORS. At a million-file table with a selective predicate
    * that is the difference between a driver OOM-and-minutes listing
    * and a one-job metadata pass. */
  def prunedFiles(spark: SparkSession, fs: FileSystem, tableDir: Path,
                  cond: String): Seq[Path] = {
    val universe = IdempotentSink.committedFilesDF(spark, tableDir)
      .select("file")
    StatsIndex.pruneDF(spark, fs, tableDir, universe, cond)
      .collect().map(r => new Path(new java.net.URI(r.getString(0)))).toSeq
  }

  private def tableFs(spark: SparkSession, baseDir: String,
                      route: String): (FileSystem, Path) = {
    val tableDir = new Path(s"$baseDir/${OcsfSink.tableName(route)}")
    (tableDir.getFileSystem(spark.sessionState.newHadoopConf()), tableDir)
  }

  /** An explicit file-list read; an EMPTY selection (e.g. no changes
    * since the consumer's checkpoint) still returns the table's true
    * schema by planning the full contract with a LIMIT 0 — metadata
    * only, nothing is read. A table whose committed batches hold zero
    * data files (a stream that has only seen empty batches) has no
    * schema to serve, so that raises the same clear error as [[load]]
    * rather than Spark's opaque cannot-infer-schema failure. */
  private def dfFor(spark: SparkSession, fs: FileSystem, tableDir: Path,
                    files: Seq[Path]): DataFrame =
    if (files.nonEmpty)
      spark.read.option("basePath", tableDir.toString)
        .parquet(files.map(_.toString): _*)
    else {
      // schema-only: ONE committed file suffices (Spark infers from
      // the first footer absent mergeSchema anyway), so the empty
      // selection never pulls the O(files) universe onto the driver
      val one = IdempotentSink.committedFilesDF(spark, tableDir)
        .select("file").limit(1).collect()
      require(one.nonEmpty,
        s"$tableDir has a batch-commit log but no committed data files")
      spark.read.option("basePath", tableDir.toString)
        .parquet(one.head.getString(0)).limit(0)
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
  def registerAll(spark: SparkSession, baseDir: String,
                  verifyAppends: Boolean = false): Seq[String] = {
    val hadoopConf = spark.sessionState.newHadoopConf()
    OcsfMappings.routes.flatMap { route =>
      val name = OcsfSink.tableName(route)
      val dir = new Path(s"$baseDir/$name")
      val fs = dir.getFileSystem(hadoopConf)
      if (IdempotentSink.hasCommitLog(fs, dir)) {
        if (!verifyAppends &&
            manifestBytes(fs, dir) > distributedListingBytes(spark)) {
          // big commit log: delegate to load's executor-side manifest
          // parse; emptiness is implied (committed manifests ⇒ files)
          load(spark, baseDir, route).createOrReplaceTempView(s"ocsf_$name")
          Some(s"ocsf_$name")
        } else {
          // one contract parse per table: the probe and the load share it
          val contract = IdempotentSink.readContract(fs, dir)
          if (contract._1.nonEmpty) {
            loadCommitted(spark, fs, dir, contract, verifyAppends)
              .createOrReplaceTempView(s"ocsf_$name")
            Some(s"ocsf_$name")
          } else None
        }
      } else if (fs.exists(dir) && hasAnyParquet(fs, dir)) {
        spark.read.parquet(dir.toString).createOrReplaceTempView(s"ocsf_$name")
        Some(s"ocsf_$name")
      } else None
    }
  }

  /** Registers every sink route as a PERSISTENT catalog table —
    * `CREATE TABLE IF NOT EXISTS <database>.<table> … USING parquet
    * PARTITIONED BY (region, accountId, eventDay) LOCATION …` from the
    * frozen DDL contract ([[SchemaDump.schemas]]) — then recovers
    * partitions. This is the reference's Glue/Athena surface
    * (/root/reference/README.md:48, the
    * `query_open_pipeline_for_fdr_*_schema` Glue tables): after one
    * call, ANY SQL client on the shared metastore resolves the lake by
    * name, with directory-partition pruning on
    * region/accountId/eventDay.
    *
    * Idempotent: re-running keeps existing tables and re-recovers
    * partitions, so a scheduled re-register after each ingest day picks
    * up new `eventDay=` directories. Partition column types are
    * DECLARED (all STRING), never inferred — an accountId with a
    * leading zero round-trips exactly.
    *
    * Schema evolution: when the frozen DDL gained columns since the
    * table was registered, the additive delta becomes
    * `ALTER TABLE … ADD COLUMNS` (the catalog-side half of
    * [[SchemaEvolution]] — the reference's redeploy-the-Glue-schema
    * step); catalog readers then see nulls on pre-evolution
    * partitions. A NON-additive drift (drop/rename/retype) throws
    * instead of silently serving a schema history can't satisfy.
    *
    * Catalog readers scan the LOCATION directly and so get the weaker
    * directory-scan guarantee on commit-log tables (staged state is
    * invisible, but a mid-promote batch may be partially visible —
    * same as Athena over the reference's prefix); exactly-once readers
    * use [[load]]/[[registerAll]], which go through the manifests. */
  def registerCatalog(spark: SparkSession, baseDir: String,
                      database: String = "ocsf"): Seq[String] = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$database`")
    val ddls = SchemaDump.schemas(spark)
    val partCols = Seq("region", "accountId", "eventDay")
    val hadoopConf = spark.sessionState.newHadoopConf()
    OcsfMappings.routes.map { route =>
      val name = OcsfSink.tableName(route)
      val fq = s"`$database`.`$name`"
      // a registered location must exist (partition recovery lists it);
      // routes that have not ingested yet get an empty dir
      val loc = new Path(s"$baseDir/$name")
      loc.getFileSystem(hadoopConf).mkdirs(loc)
      spark.sql(
        s"""CREATE TABLE IF NOT EXISTS $fq (${ddls(name)},
           |  region STRING, accountId STRING, eventDay STRING)
           |USING parquet
           |PARTITIONED BY (region, accountId, eventDay)
           |LOCATION '$baseDir/$name'""".stripMargin)
      // additive evolution: append any columns the frozen DDL gained
      // since the table was registered; reject anything non-additive
      val catalogData = org.apache.spark.sql.types.StructType(
        spark.table(fq).schema.filterNot(f => partCols.contains(f.name)))
      val expected = org.apache.spark.sql.types.StructType.fromDDL(ddls(name))
      val added = SchemaEvolution.requireAdditive(catalogData, expected, fq)
      if (added.nonEmpty)
        spark.sql(s"ALTER TABLE $fq ADD COLUMNS " +
          s"(${org.apache.spark.sql.types.StructType(added).toDDL})")
      // discover partition dirs the writers added since the last call
      spark.sql(s"MSCK REPAIR TABLE $fq")
      s"$database.$name"
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
                 filesPerDay: Int = 1,
                 zorderCols: Seq[String] = Nil): Map[String, Compacted] = {
    val hadoopConf = spark.sessionState.newHadoopConf()
    OcsfMappings.routes.flatMap { route =>
      val dir = new Path(s"$baseDir/${OcsfSink.tableName(route)}")
      val fs = dir.getFileSystem(hadoopConf)
      if (IdempotentSink.hasCommitLog(fs, dir)) {
        val data = IdempotentSink.compactDataFiles(spark, dir, filesPerDay,
          zorderCols)
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
