package graft.ocsf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Security-Lake-layout parquet sink (SURVEY.md §2 A22–A23).
  *
  * The reference's Firehose converts normalized JSON to parquet and
  * dynamically partitions as `region=/accountId=/eventDay=`
  * (/root/reference/README.md:44-46,
  * src/json/qopcfdr_firehose_metadata.json). Here that is a plain
  * partitioned parquet write with the same key layout, one table per
  * OCSF sink route.
  *
  * Scale notes: `region`/`accountId` are constants per deployment and
  * `eventDay` is low-cardinality, so the write is repartitioned by the
  * partition keys first — one shuffle whose output is exactly one open
  * file per (day × class) instead of `numTasks × partitions` small
  * files. At 100 TB/day add a salt column to the repartition (not the
  * layout) to spread a single day across more writers.
  */
object OcsfSink {

  /** Table (directory) name for a sink route, e.g.
    * "Operating System Patch State" → `operating_system_patch_state`. */
  def tableName(route: String): String =
    route.toLowerCase.replace(' ', '_')

  /** Runs `body` on a DEDICATED, named, bounded pool sized to the
    * fan-out width, shut down when the body returns. The route writes
    * are blocking parquet jobs; parking them on the JVM-shared
    * fork-join pool (`ExecutionContext.global`) lets two concurrent
    * fan-outs in one JVM starve each other and everything else sharing
    * the global pool. Daemon threads; `shutdown()` is graceful, so a
    * timed-out straggler the caller abandoned finishes on its own
    * thread and the pool then dies — nothing leaks past the last task. */
  private[graft] def withFanOutPool[T](threads: Int, name: String)(
      body: scala.concurrent.ExecutionContext => T): T = {
    val seq = new java.util.concurrent.atomic.AtomicInteger(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, threads),
      (r: Runnable) => {
        val t = new Thread(r, s"$name-${seq.getAndIncrement()}")
        t.setDaemon(true)
        t
      })
    try body(scala.concurrent.ExecutionContext.fromExecutorService(pool))
    finally { pool.shutdown(); () }
  }

  /** Auto-sizing for [[write]]'s `filesPerDay`: Catalyst's size
    * estimate for the plan divided by a target in-memory chunk per
    * writer (512 MB in-memory ≈ 100-200 MB parquet after encoding),
    * clamped to [1, 4096]. Tiny inputs still get exactly one file per
    * (region, account, day) — the anti-small-files default — while a
    * 100 TB/day feed fans out across thousands of writers without the
    * caller having to remember the lever. Cheap: reads optimizer
    * stats, runs no job. */
  def autoFilesPerDay(df: DataFrame, targetChunkBytes: Long = 512L << 20): Int =
    autoFilesPerDayFromBytes(
      df.queryExecution.optimizedPlan.stats.sizeInBytes, targetChunkBytes)

  /** The same sizing from an already-known byte estimate — what the
    * streaming fan-out uses: reading `optimizedPlan.stats` off each
    * route's NORMALIZED plan runs a full optimizer pass per route per
    * micro-batch (measured ~5 s of driver time per 1M-event trigger
    * across the 13 routes), while the materialized batch cache already
    * knows its size. One stats read per batch, divided across routes. */
  def autoFilesPerDayFromBytes(est: BigInt,
                               targetChunkBytes: Long = 512L << 20): Int =
    (est / targetChunkBytes).min(BigInt(4096)).max(BigInt(1)).toInt

  /** A22 — write one normalized class DataFrame in Security Lake
    * layout. `time` must exist (all normalizers emit it).
    *
    * `filesPerDay` is the skew lever: how many writer tasks (and so
    * files) share one (region, account, day) partition; the salt only
    * affects the repartition, never the directory layout. The default
    * 0 means derive it from the input size ([[autoFilesPerDay]]). */
  def write(df: DataFrame, baseDir: String, route: String,
            region: String, accountId: String,
            filesPerDay: Int = 0): Unit =
    partitionedFrame(df, region, accountId, filesPerDay).write
      .mode("append")
      .partitionBy("region", "accountId", "eventDay")
      .parquet(s"$baseDir/${tableName(route)}")

  /** The partition-keyed, writer-salted frame behind [[write]] — also
    * the staging half of [[IdempotentSink.writeBatch]]'s two-phase
    * commit, which must produce the exact final directory layout. */
  private[ocsf] def partitionedFrame(df: DataFrame, region: String,
                                     accountId: String,
                                     filesPerDay: Int): DataFrame = {
    require(filesPerDay >= 0, "filesPerDay must be >= 0 (0 = auto)")
    val filesPerDay0 = if (filesPerDay == 0) autoFilesPerDay(df) else filesPerDay
    val partitioned = df
      .withColumn("region", lit(region))
      .withColumn("accountId", lit(accountId))
      .withColumn("eventDay", date_format(col("time"), "yyyyMMdd"))
    // time-sorted within each writer task: parquet row-group min/max
    // stats on `time` then let ANY engine (this one, Athena/Trino over
    // the same prefix) skip row groups on the time-range predicates
    // that dominate security-lake queries — free at write (the sort is
    // task-local over one day-partition's slice), paid back on every
    // read. Layout and file count are unchanged.
    (if (filesPerDay0 == 1) partitioned.repartition(
      col("region"), col("accountId"), col("eventDay"))
    else partitioned.repartition(
      col("region"), col("accountId"), col("eventDay"),
      pmod(xxhash64(col("metadata.uid"), col("time")), lit(filesPerDay0))))
      .sortWithinPartitions(col("region"), col("accountId"),
        col("eventDay"), col("time"))
  }

  /** Route-clustered layout for the fan-out cache: repartitions the
    * classified relation on (route, salt) so each cached partition —
    * and so each columnar cache batch — holds (nearly) one route.
    * Every route write then filters `route === r` against the cache,
    * and `InMemoryTableScan` prunes whole batches via its per-batch
    * min/max stats: a 13-way fan-out decompresses ~1× the data instead
    * of 13×. Measured (EtlAb, 1M events, median-of-3 interleaved
    * arms): fan-out 19.6 s plain → 10.2 s clustered, total 22.5 →
    * 13.4 s; the no-shuffle alternative (`sortWithinPartitions` +
    * small cache batches) recovered only ~2.6 s of that.
    *
    * `tasksPerRoute` salts the clustering so each route spans that
    * many partitions (scan/normalize parallelism per route while the
    * 13 route jobs run concurrently). The salt hashes the event id
    * (falling back to the extapi timestamp key); rows where both are
    * absent degrade to one partition for that route, never lost. One
    * extra shuffle of the batch, repaid ~3× by the pruned rescans —
    * at streaming cadence the batch is small and the shuffle is
    * sub-second.
    *
    * The default (0) AUTO-SIZES tasksPerRoute from the input's plan
    * stats, because what must stay bounded at scale is PARTITION SIZE,
    * not partition count: a fixed 13×2 layout means each 4× corpus
    * growth quadruples the rows per cached partition, and the
    * cache-unroll of those fat serialized blocks is exactly where a
    * 16M-event backfill blew the default heap (BASELINE.md r12 —
    * stage-52 OOM at 615k rows/partition; the same corpus passes at
    * 123k). ~8 MB of source bytes per task keeps a 1M-event batch at
    * the measured-optimal 2 tasks/route and scales a backfill linearly,
    * clamped to [2, 64] so a streaming micro-batch never shrinks below
    * today's layout and a huge backfill never explodes the task
    * count. */
  def routeClustered(classified: DataFrame, tasksPerRoute: Int = 0): DataFrame = {
    require(tasksPerRoute >= 0, "tasksPerRoute must be >= 1 (0 = auto)")
    val tpr =
      if (tasksPerRoute > 0) tasksPerRoute
      else {
        val bytes = classified.queryExecution.optimizedPlan.stats.sizeInBytes
        val perTask = BigInt(8L << 20) * OcsfMappings.routes.size
        ((bytes / perTask) + 1).min(64).max(2).toInt
      }
    val salt = pmod(xxhash64(coalesce(col("fields").getItem("id"),
      col("fields").getItem("UTCTimestamp"), lit(""))), lit(tpr))
    classified.repartition(OcsfMappings.routes.size * tpr,
      col("route"), salt)
  }

  /** Heap-proof persist for the fan-out cache: MEMORY_AND_DISK_SER,
    * never the `.cache()` default (MEMORY_AND_DISK, deserialized).
    * The 13 concurrent route writes rescan this relation while their
    * own shuffle/encode work competes for the same unified memory; a
    * batch whose deserialized columnar cache outgrows the storage pool
    * used to fall off a cliff (BASELINE.md: 163.5k ev/s at 24 g heap vs
    * 51.3k at the default 8 g on 4M events — eviction + GC thrash, 3.2×
    * over linear). Serialized batches are both smaller on heap and
    * cheap to evict to local disk, so an oversized micro-batch degrades
    * linearly (disk-read per rescan) instead of thrashing. The
    * streaming path sizes batches with `maxFilesPerTrigger`, but the
    * cache must stay safe when a backfill batch blows past the cap. */
  def cacheForFanOut(df: DataFrame): DataFrame =
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)

  /** Admission control for the fan-out (the `maxConcurrentRoutes = 0`
    * auto-size): how many route WRITE JOBS may run at once before the
    * next one queues on the bounded pool.
    *
    * Why it exists: every open parquet writer buffers up to a full row
    * group (`parquet.block.size`, default 128 MB) of UNTRACKED heap —
    * Spark's memory manager never sees it — and a fan-out runs
    * `routes × filesPerDay` writers concurrently on top of a storage
    * pool already pinned by the fan-out cache. On a small heap that is
    * exactly where an oversized batch dies (BASELINE.md, 32M events @
    * 8 g: the cache-unroll lever moved the boundary and the 13
    * concurrent `ParquetWriteSupport`s then OOM'd). Staggering route
    * jobs trades fan-out latency for a bounded write-buffer peak — the
    * degraded-LINEAR failure mode, like the serialized cache before it.
    *
    * Sizing: a route's write-buffer peak is its writer-task count
    * (`filesPerDay`) × the row-group cap — but a writer never buffers
    * more than the route's actual data, so small batches are charged
    * `~batchBytes / routes` instead of the cap (this is why a 1M-event
    * batch still runs all 13 routes wide: its per-route slice is a few
    * MB and admission control is a no-op). ×2 for encode transients
    * (dictionary pages + the in-flight flush). The budget is half the
    * heap minus what the storage pool ACTUALLY holds right now
    * (`getRDDStorageInfo` — the fan-out cache the route jobs rescan),
    * floored at heap/8 so at least one route is always admitted.
    *
    * A real cluster rarely needs this lever (each executor's writers
    * share that executor's heap only), but the same arithmetic holds
    * per-executor when `filesPerDay` is sized to the whole cluster. */
  def autoConcurrentRoutes(classified: DataFrame, filesPerDay: Int,
                           nRoutes: Int): Int = {
    val sc = classified.sparkSession.sparkContext
    admittedRoutes(
      heapBytes = Runtime.getRuntime.maxMemory,
      storageUsedBytes = sc.getRDDStorageInfo.map(_.memSize).sum,
      rowGroupBytes = sc.hadoopConfiguration
        .getLong("parquet.block.size", 128L << 20),
      batchBytes = classified.queryExecution.optimizedPlan.stats.sizeInBytes,
      filesPerDay = filesPerDay, nRoutes = nRoutes)
  }

  /** The pure admission arithmetic behind [[autoConcurrentRoutes]]
    * (separated so the sizing policy is spec-pinnable without a
    * telemetry harness). See that method's scaladoc for the model. */
  private[ocsf] def admittedRoutes(heapBytes: Long, storageUsedBytes: Long,
                                   rowGroupBytes: Long, batchBytes: BigInt,
                                   filesPerDay: Int, nRoutes: Int): Int = {
    val writers = math.max(1, filesPerDay).toLong
    val perRoute = ((batchBytes / nRoutes).min(BigInt(writers * rowGroupBytes))
      .max(BigInt(16L << 20)) * 2).toLong
    val budget = math.max(heapBytes / 8, heapBytes / 2 - storageUsedBytes)
    math.max(1L, math.min(nRoutes.toLong, budget / perRoute)).toInt
  }

  /** A23 — 13-way fan-out: normalize every route off the same
    * classified scan and write each to its own table. The 13 writes
    * are independent Spark jobs and run CONCURRENTLY — sequential
    * submission left the cluster idle between small jobs and made the
    * fan-out latency the sum instead of the max. Cache `classified`
    * first (as EtlBench/demos do) so the scan isn't re-run per route —
    * ideally [[routeClustered]] first, so each route's rescan prunes
    * to its own cache batches. */
  def fanOut(classified: DataFrame, baseDir: String,
             region: String, accountId: String): Unit = {
    fanOutTimed(classified, baseDir, region, accountId)
    ()
  }

  /** [[fanOut]] that also reports per-route wall seconds (measured
    * inside each route's future, so contention between the concurrent
    * writes is included — the number a capacity plan needs).
    *
    * `filesPerDay` (default 0 = auto-size) is the write-parallelism
    * lever fanned out to every route's [[write]]. The auto default
    * optimizes for file hygiene: a small batch gets ONE file per
    * (route, day) — which also means ONE parquet-encoding core per
    * route, 13 busy cores on a 32-core box. When fan-out LATENCY
    * matters more than file count (tight streaming triggers, bench),
    * pass ~`cores / 13` so the concurrent route jobs can use the whole
    * machine; the day's files stay `filesPerDay × routes`, bounded. */
  /** `maxConcurrentRoutes` is the write-buffer admission lever
    * (0 = auto via [[autoConcurrentRoutes]]): route jobs past the cap
    * queue on the bounded pool instead of stacking parquet buffers. */
  def fanOutTimed(classified: DataFrame, baseDir: String,
                  region: String, accountId: String,
                  filesPerDay: Int = 0,
                  maxConcurrentRoutes: Int = 0): Map[String, Double] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val routed = Normalizers.normalizeAll(classified).toSeq
    val width =
      if (maxConcurrentRoutes > 0) math.min(routed.size, maxConcurrentRoutes)
      else autoConcurrentRoutes(classified, filesPerDay, routed.size)
    withFanOutPool(width, "graft-fanout") { implicit ec =>
      val jobs = routed.map { case (route, df) =>
        Future {
          val t0 = System.nanoTime()
          write(df, baseDir, route, region, accountId, filesPerDay)
          route -> (System.nanoTime() - t0) / 1e9
        }
      }
      Await.result(Future.sequence(jobs), Duration.Inf).toMap
    }
  }

  /** [[fanOut]] with restart safety: each route lands through
    * [[IdempotentSink.writeBatch]] keyed by a caller-chosen `runId`
    * (e.g. the ingest day or the input manifest hash), so re-running a
    * batch job that died mid-fan-out skips the routes that already
    * committed instead of re-appending them. Same two-phase commit as
    * the streaming path.
    *
    * `writerId` namespaces this job's commit log so it can run BESIDE
    * a live streaming query on the same tables (the stream owns the
    * default empty namespace): a backfill passes a stable unique id —
    * e.g. `"backfill20260813"` — and its control pairs land as
    * `w-<writerId>-<runId>`, disjoint from the stream's. See
    * [[IdempotentSink]]'s concurrency contract; retire the finished
    * backfill into compacted history with
    * `compactCommits(foldWriters = Set(writerId))`. */
  def fanOutIdempotent(classified: DataFrame, baseDir: String,
                       region: String, accountId: String,
                       runId: Long, writerId: String = "",
                       maxConcurrentRoutes: Int = 0): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val routed = Normalizers.normalizeAll(classified).toSeq
    val width =
      if (maxConcurrentRoutes > 0) math.min(routed.size, maxConcurrentRoutes)
      else autoConcurrentRoutes(classified, filesPerDay = 1, routed.size)
    withFanOutPool(width, "graft-fanout-idem") { implicit ec =>
      val jobs = routed.map { case (route, df) =>
        Future(IdempotentSink.writeBatch(df, baseDir, route, region,
          accountId, runId, writerId = writerId))
      }
      Await.result(Future.sequence(jobs), Duration.Inf)
    }
    ()
  }
}
