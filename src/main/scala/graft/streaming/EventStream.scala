package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ocsf.{Normalizers, OcsfMappings, OcsfSink}
import graft.sources.FdrSource

/** Streaming ingestion (SURVEY.md §2 A24).
  *
  * The reference is a continuous pipeline: S3 event → SQS → Lambda →
  * Firehose batches (/root/reference/README.md:34-46). Structured
  * Streaming expresses the same thing natively: a file-source stream
  * over the landing prefix (new objects are discovered per
  * micro-batch, the SQS notification re-expressed), the identical
  * map-only normalize, and a partitioned parquet sink with exactly-once
  * checkpointing (the Firehose buffering re-expressed as micro-batch
  * triggers).
  *
  * All normalizers are narrow (no aggregation), so no watermark is
  * needed for the ETL path; [[windowedCounts]] shows the watermarked
  * stateful-aggregation variant used for monitoring-style queries.
  */
object EventStream {

  /** Parsed streaming relation (raw, fields, event_name) over the
    * landing prefix. */
  private def readNamed(spark: SparkSession, landingDir: String): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", 64)
      .text(landingDir)
      .toDF("raw")
      .filter(length(trim(col("raw"))) > 0)
      .withColumn("fields", from_json(col("raw"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)))
      .withColumn("event_name", FdrSource.eventName(col("fields")))

  /** Streaming equivalent of FdrSource.load: gz json-lines →
    * classified events. */
  def readClassified(spark: SparkSession, landingDir: String): DataFrame =
    FdrSource.mappedWithClass(spark,
      readNamed(spark, landingDir).filter(col("event_name").isNotNull))

  /** Streaming equivalent of FdrSource.loadWithQuarantine: classified
    * events plus the (raw, reason) quarantine stream. Run the
    * quarantine side as its own query (e.g. [[startQuarantineSink]])
    * so skipped lines are counted and replayable instead of silently
    * dropped — the reference merely logs them from the Lambda. */
  def readWithQuarantine(spark: SparkSession, landingDir: String): FdrSource.Loaded =
    FdrSource.splitQuarantine(spark, readNamed(spark, landingDir))

  /** Lands the quarantine stream as parquet with its own checkpoint. */
  def startQuarantineSink(quarantined: DataFrame, dir: String,
                          checkpointDir: String,
                          trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : StreamingQuery =
    quarantined.writeStream
      .format("parquet")
      .option("path", dir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .queryName("fdr-quarantine")
      .start()

  /** One streaming query per OCSF route, each writing its own
    * partitioned parquet table with its own checkpoint. Returns the
    * running queries; call `.awaitTermination()` or stop them. */
  def start(spark: SparkSession, landingDir: String, baseDir: String,
            checkpointDir: String, region: String, accountId: String,
            routes: Seq[String] = OcsfMappings.routes): Seq[StreamingQuery] = {
    val classified = readClassified(spark, landingDir)
    routes.map { route =>
      val normalized = Normalizers.byRoute(route)(
          classified.filter(col("route") === route))
        .withColumn("region", lit(region))
        .withColumn("accountId", lit(accountId))
        .withColumn("eventDay", date_format(col("time"), "yyyyMMdd"))
      normalized.writeStream
        .format("parquet")
        .option("path", s"$baseDir/${OcsfSink.tableName(route)}")
        .option("checkpointLocation", s"$checkpointDir/${OcsfSink.tableName(route)}")
        .partitionBy("region", "accountId", "eventDay")
        .trigger(Trigger.ProcessingTime("10 seconds"))
        .queryName(s"ocsf-${OcsfSink.tableName(route)}")
        .start()
    }
  }

  /** Exactly-once on an at-least-once landing feed: FDR can redeliver
    * objects (the reference relies on SQS redrive), so replayed lines
    * reappear with the same event id. Dedup on the id with a
    * watermark-bounded state TTL — state holds only ids younger than
    * the lateness bound, not the full history (the unbounded-state
    * trap of plain dropDuplicates on a stream). */
  def dedupedByEventId(classified: DataFrame, lateness: String = "10 minutes"): DataFrame =
    classified
      .withColumn("event_time",
        Normalizers.epochToTimestamp(col("fields").getItem("timestamp")))
      .filter(col("event_time").isNotNull && col("fields").getItem("id").isNotNull)
      .withColumn("event_id", col("fields").getItem("id"))
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked windowed aggregation over the classified stream:
    * events per (route, 1-minute window), tolerating 5 minutes of
    * lateness — the streaming-analytics counterpart of
    * q_events_timebucket. */
  def windowedCounts(classified: DataFrame): DataFrame =
    classified
      .withColumn("event_time",
        Normalizers.epochToTimestamp(col("fields").getItem("timestamp")))
      .filter(col("event_time").isNotNull)
      .withWatermark("event_time", "5 minutes")
      .groupBy(window(col("event_time"), "1 minute"), col("route"))
      .agg(count(lit(1)).as("n_events"))
}
