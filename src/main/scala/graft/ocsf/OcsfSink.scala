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
    * layout. `time` must exist (all normalizers emit it).
    *
    * `filesPerDay` is the skew lever: 1 gives exactly one file per
    * (region, account, day) partition; at 100 TB/day raise it so a
    * single hot day spreads across that many writers — the salt only
    * affects the repartition, never the directory layout. */
  def write(df: DataFrame, baseDir: String, route: String,
            region: String, accountId: String,
            filesPerDay: Int = 1): Unit = {
    require(filesPerDay >= 1, "filesPerDay must be >= 1")
    val partitioned = df
      .withColumn("region", lit(region))
      .withColumn("accountId", lit(accountId))
      .withColumn("eventDay", date_format(col("time"), "yyyyMMdd"))
    val salted =
      if (filesPerDay == 1) partitioned.repartition(
        col("region"), col("accountId"), col("eventDay"))
      else partitioned.repartition(
        col("region"), col("accountId"), col("eventDay"),
        pmod(xxhash64(col("metadata.uid"), col("time")), lit(filesPerDay)))
    salted.write
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
