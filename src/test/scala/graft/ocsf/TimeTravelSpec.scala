package graft.ocsf

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Time-travel (`loadAsOf`) and incremental (`changesSince`) reads over
  * the batch-commit log: the manifests double as snapshot metadata, so
  * an append-only lake gets Delta-style AS OF and CDC consumption for
  * free — bounded by the compaction horizon, which must REFUSE (never
  * silently mis-serve) requests below it. */
class TimeTravelSpec extends SparkSpec {

  private val region = "us-east-1"
  private val acct = "123456789012"
  private val route = "DNS Activity"

  private def mkBase(): String =
    Files.createTempDirectory("timetravel").toString

  private def df(rows: (String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("uid", "day")
      .select(struct(col("uid")).as("metadata"),
        to_timestamp(concat(col("day"), lit(" 12:00:00"))).as("time"))
  }

  private def uids(d: DataFrame): Seq[String] =
    d.select("metadata.uid").collect().map(_.getString(0)).sorted.toSeq

  private def write3(base: String): Unit = {
    IdempotentSink.writeBatch(df("a" -> "2023-11-14"), base, route, region, acct, 0L)
    IdempotentSink.writeBatch(df("b" -> "2023-11-14"), base, route, region, acct, 1L)
    IdempotentSink.writeBatch(df("c" -> "2023-11-15"), base, route, region, acct, 2L)
  }

  test("loadAsOf replays any committed prefix; changesSince any suffix") {
    val base = mkBase()
    write3(base)
    assert(uids(OcsfTables.loadAsOf(spark, base, route, 0L)) == Seq("a"))
    assert(uids(OcsfTables.loadAsOf(spark, base, route, 1L)) == Seq("a", "b"))
    assert(uids(OcsfTables.loadAsOf(spark, base, route, 2L)) == Seq("a", "b", "c"))
    assert(uids(OcsfTables.changesSince(spark, base, route, -1L)) == Seq("a", "b", "c"))
    assert(uids(OcsfTables.changesSince(spark, base, route, 0L)) == Seq("b", "c"))
    assert(uids(OcsfTables.changesSince(spark, base, route, 2L)) == Seq.empty)
  }

  test("an empty delta keeps the table schema (consumer loop needs no special case)") {
    val base = mkBase()
    write3(base)
    val delta = OcsfTables.changesSince(spark, base, route, 2L)
    assert(delta.count() == 0)
    // schema intact, partition columns included — a consumer can union
    // or transform the empty delta exactly like a non-empty one
    assert(delta.columns.contains("eventDay"))
    assert(delta.schema == OcsfTables.load(spark, base, route).schema)
  }

  test("time travel prunes partitions: an eventDay filter reads only that day") {
    val base = mkBase()
    write3(base)
    val plan = OcsfTables.loadAsOf(spark, base, route, 2L)
      .where(col("eventDay") === "20231115")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(eventDay"), plan)
  }

  test("compaction bounds history: below-horizon requests throw, at-horizon serve") {
    val base = mkBase()
    write3(base)
    val tableDir = new Path(s"$base/${OcsfSink.tableName(route)}")
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(IdempotentSink.compactCommits(fs, tableDir) == 3)
    // the folded view still serves the latest snapshot and the empty delta
    assert(uids(OcsfTables.loadAsOf(spark, base, route, 2L)) == Seq("a", "b", "c"))
    assert(OcsfTables.changesSince(spark, base, route, 2L).count() == 0)
    // but per-batch granularity below the fold is gone — REFUSE, loudly
    val e1 = intercept[IllegalArgumentException] {
      OcsfTables.loadAsOf(spark, base, route, 1L)
    }
    assert(e1.getMessage.contains("compaction horizon"))
    val e2 = intercept[IllegalArgumentException] {
      OcsfTables.changesSince(spark, base, route, 0L)
    }
    assert(e2.getMessage.contains("compaction horizon"))
  }

  test("batches landing after a compaction stay individually addressable") {
    val base = mkBase()
    write3(base)
    val tableDir = new Path(s"$base/${OcsfSink.tableName(route)}")
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    IdempotentSink.compactCommits(fs, tableDir)
    IdempotentSink.writeBatch(df("d" -> "2023-11-16"), base, route, region, acct, 3L)
    IdempotentSink.writeBatch(df("e" -> "2023-11-16"), base, route, region, acct, 4L)
    // a consumer checkpointed at the horizon (batch 2) reads only the delta
    assert(uids(OcsfTables.changesSince(spark, base, route, 2L)) == Seq("d", "e"))
    assert(uids(OcsfTables.changesSince(spark, base, route, 3L)) == Seq("e"))
    // snapshots at or above the horizon compose the folded view + suffix
    assert(uids(OcsfTables.loadAsOf(spark, base, route, 2L)) == Seq("a", "b", "c"))
    assert(uids(OcsfTables.loadAsOf(spark, base, route, 3L)) == Seq("a", "b", "c", "d"))
    // below the horizon still refuses — folding didn't blur the boundary
    intercept[IllegalArgumentException] {
      OcsfTables.changesSince(spark, base, route, 1L)
    }
    // and the live read sees everything (time travel changed nothing)
    assert(uids(OcsfTables.load(spark, base, route)) == Seq("a", "b", "c", "d", "e"))
  }

  test("chained compactions keep the horizon boundable (#maxbatch carry)") {
    val base = mkBase()
    write3(base)
    val tableDir = new Path(s"$base/${OcsfSink.tableName(route)}")
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the README's own maintenance sequence: control fold, then a data
    // rewrite whose only input is the control fold — its supersedes set
    // names no numeric batch id, so coverage must ride the #maxbatch
    // header or every later read would refuse
    assert(IdempotentSink.compactCommits(fs, tableDir) == 3)
    assert(IdempotentSink.compactDataFiles(spark, tableDir, filesPerDay = 1) == 1)
    assert(uids(OcsfTables.loadAsOf(spark, base, route, 2L)) == Seq("a", "b", "c"))
    assert(OcsfTables.changesSince(spark, base, route, 2L).count() == 0)
    intercept[IllegalArgumentException] { // below the horizon still refuses
      OcsfTables.loadAsOf(spark, base, route, 1L)
    }
    // and a batch landing after the chain is individually addressable
    IdempotentSink.writeBatch(df("d" -> "2023-11-16"), base, route, region, acct, 3L)
    assert(uids(OcsfTables.changesSince(spark, base, route, 2L)) == Seq("d"))
  }

  test("a log whose committed batches hold no data files raises the clear error") {
    val base = mkBase()
    // an empty micro-batch: commits a files=0 manifest + marker
    IdempotentSink.writeBatch(df(), base, route, region, acct, 0L)
    val tableDir = new Path(s"$base/${OcsfSink.tableName(route)}")
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(IdempotentSink.hasCommitLog(fs, tableDir))
    val e = intercept[IllegalArgumentException] {
      OcsfTables.changesSince(spark, base, route, 0L).count()
    }
    assert(e.getMessage.contains("no committed data files"), e.getMessage)
  }

  test("data compaction (file rewrite) keeps the same horizon contract") {
    val base = mkBase()
    write3(base)
    val tableDir = new Path(s"$base/${OcsfSink.tableName(route)}")
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(IdempotentSink.compactDataFiles(spark, tableDir, filesPerDay = 1) == 3)
    IdempotentSink.writeBatch(df("d" -> "2023-11-16"), base, route, region, acct, 3L)
    assert(uids(OcsfTables.changesSince(spark, base, route, 2L)) == Seq("d"))
    assert(uids(OcsfTables.loadAsOf(spark, base, route, 3L)) == Seq("a", "b", "c", "d"))
    intercept[IllegalArgumentException] {
      OcsfTables.loadAsOf(spark, base, route, 1L)
    }
  }
}
