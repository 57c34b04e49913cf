package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the driver-generated star-schema parquet tables.
  *
  * One parquet file per table under `sfDir` (see /root/repo/TESTDATA.md;
  * `documents`/`embeddings` also exist at every scale factor). Reads are
  * plain `spark.read.parquet` so Catalyst keeps full pushdown / pruning
  * ability; at cluster scale the same call works on a directory of
  * thousands of files.
  *
  * Parquet TIMESTAMP(NANOS) (the `events.ts` column) is not a legal
  * Spark 4 parquet type, so it is read as nanos-since-epoch Long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and converted to a
  * microsecond timestamp — the same truncation DuckDB's epoch_us does.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    if (table == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Registers every table as a temp view so `spark.sql` can be used with
    * the same statements the DuckDB oracle runs. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
