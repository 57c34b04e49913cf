package graft.ocsf

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** A24 — the two-phase (stage → manifest → promote → commit) batch
  * write: every step must be idempotent under replay, so a crash at
  * ANY point between routes or inside one route's write never
  * duplicates rows. */
class IdempotentSinkSpec extends SparkSpec {

  private val region = "us-east-1"
  private val acct = "123456789012"

  /** (uid, day) rows; distinct days land in distinct partition dirs,
    * so multi-day batches stage MULTIPLE files — the partial-promote
    * scenario needs at least two. */
  private def df(rows: (String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("uid", "day")
      .select(struct(col("uid")).as("metadata"),
        to_timestamp(concat(col("day"), lit(" 12:00:00"))).as("time"))
  }

  private def tableUids(base: Path): Seq[String] =
    spark.read.parquet(s"$base/dns_activity")
      .select("metadata.uid").collect().map(_.getString(0)).sorted.toSeq

  test("writeBatch skips a fully committed (route, batch) on replay") {
    val base = Files.createTempDirectory("idem-skip")
    IdempotentSink.writeBatch(df("e1" -> "2023-11-14", "e2" -> "2023-11-15"), base.toString, "DNS Activity",
      region, acct, batchId = 0L)
    assert(tableUids(base) == Seq("e1", "e2"))
    // full replay of the same batch: marker short-circuits, zero dups
    IdempotentSink.writeBatch(df("e1" -> "2023-11-14", "e2" -> "2023-11-15"), base.toString, "DNS Activity",
      region, acct, batchId = 0L)
    assert(tableUids(base) == Seq("e1", "e2"))
    // the NEXT batch appends normally
    IdempotentSink.writeBatch(df("e3" -> "2023-11-14"), base.toString, "DNS Activity",
      region, acct, batchId = 1L)
    assert(tableUids(base) == Seq("e1", "e2", "e3"))
    // bookkeeping is invisible to readers but present on disk
    assert(Files.exists(base.resolve("dns_activity/_committed_batches/0.committed")))
    assert(Files.exists(base.resolve("dns_activity/_committed_batches/1.committed")))
    assert(!Files.exists(base.resolve("dns_activity/_staging/batch_0")))
  }

  test("batch fanOutIdempotent replays without duplicating any route") {
    import spark.implicits._
    val base = Files.createTempDirectory("idem-fanout")
    val classified = Seq(
      ("""{"event_simpleName":"DnsRequest","name":"DnsRequestV4","aid":"a1","cid":"c1","id":"e1","timestamp":"1700000000000","event_platform":"Lin","DomainName":"one.example.com"}""", ""),
      ("""{"event_simpleName":"ProcessRollup2","name":"ProcessRollup2V19","aid":"a2","cid":"c2","id":"e2","timestamp":"1700000000123","event_platform":"Win","ImageFileName":"C:\\x\\cmd.exe","RawProcessId":"42"}""", ""))
      .toDF("raw", "unused").select(col("raw"))
    val loaded = graft.sources.FdrSource.mappedWithClass(spark,
      graft.sources.FdrSource.withEventName(
        classified.withColumn("fields",
          from_json(col("raw"), org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))))
    OcsfSink.fanOutIdempotent(loaded, base.toString, region, acct, runId = 1L)
    val n1 = spark.read.parquet(s"$base/dns_activity").count()
    val n2 = spark.read.parquet(s"$base/process_activity").count()
    assert(n1 == 1 && n2 == 1)
    // the whole fan-out replayed under the same runId: zero new rows
    OcsfSink.fanOutIdempotent(loaded, base.toString, region, acct, runId = 1L)
    assert(spark.read.parquet(s"$base/dns_activity").count() == n1)
    assert(spark.read.parquet(s"$base/process_activity").count() == n2)
  }

  test("writeBatch resumes a half-promoted batch without restaging") {
    val base = Files.createTempDirectory("idem-resume")
    val table = base.resolve("dns_activity")
    val staging = table.resolve("_staging/batch_7")
    val genDir = staging.resolve("g1")
    // stage exactly as writeBatch does (same layout, overwrite mode,
    // per-attempt generation dir)
    OcsfSink.partitionedFrame(df("e1" -> "2023-11-14", "e2" -> "2023-11-15"), region, acct, 0).write
      .mode("overwrite")
      .partitionBy("region", "accountId", "eventDay")
      .parquet(genDir.toString)
    val staged = Files.walk(genDir).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => genDir.relativize(p).toString)
      .filterNot(p => Paths.get(p).getFileName.toString.matches("^[_.].*"))
      .toSeq.sorted
    assert(staged.nonEmpty, "staging produced no data files")
    // crash AFTER the manifest published, DURING the promote: one file
    // already moved into the table, the rest still staged
    val cb = table.resolve("_committed_batches")
    Files.createDirectories(cb)
    Files.write(cb.resolve("7.manifest"),
      staged.map(r => s"g1/$r").mkString("\n").getBytes("UTF-8"))
    val moved = genDir.resolve(staged.head)
    val dst = table.resolve(staged.head)
    Files.createDirectories(dst.getParent)
    Files.move(moved, dst)

    IdempotentSink.writeBatch(df("e1" -> "2023-11-14", "e2" -> "2023-11-15"), base.toString, "DNS Activity",
      region, acct, batchId = 7L)
    assert(tableUids(base) == Seq("e1", "e2"))
    // resumed, not restaged: the landed files are the ORIGINAL staged
    // names (a restage would have minted fresh part-file UUIDs)
    val landed = Files.walk(table).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => table.relativize(p).toString)
      .filter(_.endsWith(".parquet")).toSeq.sorted
    assert(landed == staged, s"landed=$landed staged=$staged")
    assert(Files.exists(cb.resolve("7.committed")))
    assert(!Files.exists(staging))
    // and a second replay after commit is a no-op
    IdempotentSink.writeBatch(df("e1" -> "2023-11-14", "e2" -> "2023-11-15"), base.toString, "DNS Activity",
      region, acct, batchId = 7L)
    assert(tableUids(base) == Seq("e1", "e2"))
  }

  test("commit evicts bookkeeping: the generation/lock maps do not grow across batches") {
    val base = Files.createTempDirectory("idem-evict")
    (0L until 6L).foreach { b =>
      IdempotentSink.writeBatch(df(s"e$b" -> "2023-11-14"), base.toString,
        "DNS Activity", region, acct, batchId = b)
    }
    // every batch committed → every (table, batch) entry evicted; a
    // year-long streaming query must not accumulate one entry per batch
    assert(!IdempotentSink.bookkeepingKeys.exists(_.contains("idem-evict")),
      "committed (table, batch) bookkeeping must be evicted")
    assert(tableUids(base) == (0 until 6).map("e" + _))
    // reads go through the batch-commit log for this table
    assert(OcsfTables.load(spark, base.toString, "DNS Activity").count() == 6)
  }

  test("a superseded attempt is fenced off and cannot publish or promote") {
    val base = Files.createTempDirectory("idem-fence")
    val batch = df("e1" -> "2023-11-14", "e2" -> "2023-11-15")
    val tableDir = new org.apache.hadoop.fs.Path(s"$base/dns_activity")
    val fs = tableDir.getFileSystem(spark.sessionState.newHadoopConf())
    // attempt g1 begins (the route future the streaming layer later
    // times out and abandons), then the replayed batch begins a NEWER
    // attempt — but has not committed yet
    val gen1 = IdempotentSink.beginAttempt(fs, tableDir, batchId = 3L)
    val gen2 = IdempotentSink.beginAttempt(fs, tableDir, batchId = 3L)
    // the abandoned g1 attempt gets scheduled mid-replay: it stages
    // into its own generation dir, then must abort at the manifest
    // control step — the replay owns the batch now
    intercept[IdempotentSink.SupersededAttemptException] {
      IdempotentSink.runAttempt(batch, fs, tableDir, "DNS Activity",
        region, acct, batchId = 3L, filesPerDay = 0, gen = gen1)
    }
    assert(!Files.exists(base.resolve("dns_activity/_committed_batches/3.manifest")),
      "a fenced attempt published a manifest")
    // the current attempt then lands the batch exactly once
    IdempotentSink.runAttempt(batch, fs, tableDir, "DNS Activity",
      region, acct, batchId = 3L, filesPerDay = 0, gen = gen2)
    assert(tableUids(base) == Seq("e1", "e2"))
    // a late replay of the FENCED generation is also harmless: the
    // committed marker short-circuits it
    IdempotentSink.runAttempt(batch, fs, tableDir, "DNS Activity",
      region, acct, batchId = 3L, filesPerDay = 0, gen = gen1)
    assert(tableUids(base) == Seq("e1", "e2"))
    // a straggler's staging leftovers (it wrote its gen dir before the
    // winner's cleanup... or after) are swept on the next replay
    val orphan = base.resolve(s"dns_activity/_staging/batch_3/g$gen1")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("part-straggler.parquet"), Array[Byte](1, 2, 3))
    IdempotentSink.writeBatch(batch, base.toString, "DNS Activity",
      region, acct, batchId = 3L)
    assert(tableUids(base) == Seq("e1", "e2"))
    assert(!Files.exists(base.resolve("dns_activity/_staging/batch_3")))
  }

  test("concurrent attempts for the same batch land the rows exactly once") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.DurationInt
    implicit val ec: ExecutionContext = ExecutionContext.global
    val base = Files.createTempDirectory("idem-race")
    val batch = df("e1" -> "2023-11-14", "e2" -> "2023-11-15")
    // two replays of the same (route, batch) racing in one JVM — the
    // timed-out-future-vs-replay shape. Exactly one file set must land;
    // a loser either no-ops (saw the winner's commit) or aborts fenced.
    val attempts = (1 to 2).map { _ =>
      Future(
        try { IdempotentSink.writeBatch(batch, base.toString, "DNS Activity",
          region, acct, batchId = 9L); true }
        catch { case _: IdempotentSink.SupersededAttemptException => false })
    }
    val done = Await.result(Future.sequence(attempts), 120.seconds)
    assert(done.contains(true), "no attempt committed the batch")
    assert(tableUids(base) == Seq("e1", "e2"))
    assert(!Files.exists(base.resolve("dns_activity/_staging/batch_9")))
  }
}
