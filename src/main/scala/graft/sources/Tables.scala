package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated star-schema parquet tables.
  *
  * One parquet file per table under `sfDir` (see /root/repo/TESTDATA.md).
  * Reads are plain `spark.read.parquet` so Catalyst keeps full pushdown /
  * pruning ability; at cluster scale the same call works on a directory of
  * thousands of files.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  /** Registers every table as a temp view so `spark.sql` can be used with
    * the same statements the DuckDB oracle runs. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
