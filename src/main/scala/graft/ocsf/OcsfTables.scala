package graft.ocsf

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader side of the lake (the reference's Athena consumption surface,
  * /root/reference/README.md:48): load any OCSF class table written by
  * [[OcsfSink]] and register all of them as temp views so the full SQL
  * surface runs over them.
  *
  * Partition pruning comes free: `region`/`accountId`/`eventDay` are
  * directory partitions, so `WHERE eventDay = ...` prunes files before
  * any IO.
  */
object OcsfTables {

  def load(spark: SparkSession, baseDir: String, route: String): DataFrame =
    spark.read.parquet(s"$baseDir/${OcsfSink.tableName(route)}")

  /** Registers every sink-route table that has data under `baseDir` as
    * a temp view named like `ocsf_process_activity`. Routes with no
    * events write only a _SUCCESS marker (no schema to infer) and are
    * skipped. Returns the views registered. */
  def registerAll(spark: SparkSession, baseDir: String): Seq[String] =
    OcsfMappings.routes.flatMap { route =>
      val name = OcsfSink.tableName(route)
      val dir = new java.io.File(s"$baseDir/$name")
      val hasParquet = dir.isDirectory && {
        def walk(f: java.io.File): Boolean =
          f.listFiles() != null && f.listFiles().exists(c =>
            (c.isFile && c.getName.endsWith(".parquet")) || (c.isDirectory && walk(c)))
        walk(dir)
      }
      if (hasParquet) {
        load(spark, baseDir, route).createOrReplaceTempView(s"ocsf_$name")
        Some(s"ocsf_$name")
      } else None
    }
}
