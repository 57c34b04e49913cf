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

  /** A22 — write one normalized class DataFrame in Security Lake
    * layout. `time` must exist (all normalizers emit it). */
  def write(df: DataFrame, baseDir: String, route: String,
            region: String, accountId: String,
            maxEventDayFiles: Int = 1): Unit = {
    val partitioned = df
      .withColumn("region", lit(region))
      .withColumn("accountId", lit(accountId))
      .withColumn("eventDay", date_format(col("time"), "yyyyMMdd"))
    partitioned
      .repartition(col("region"), col("accountId"), col("eventDay"))
      .write
      .mode("append")
      .partitionBy("region", "accountId", "eventDay")
      .parquet(s"$baseDir/${tableName(route)}")
  }

  /** A23 — 13-way fan-out in one logical pass: normalize every route
    * off the same classified scan and write each to its own table. */
  def fanOut(classified: DataFrame, baseDir: String,
             region: String, accountId: String): Unit =
    Normalizers.normalizeAll(classified).foreach { case (route, df) =>
      write(df, baseDir, route, region, accountId)
    }
}
