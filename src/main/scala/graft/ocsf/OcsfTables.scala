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
    * skipped. Returns the views registered.
    *
    * Probing goes through the Hadoop FileSystem API so the same call
    * works against `s3a://` / `hdfs://` lakes, not just the local FS. */
  def registerAll(spark: SparkSession, baseDir: String): Seq[String] = {
    import org.apache.hadoop.fs.{FileSystem, Path, RemoteIterator}
    val hadoopConf = spark.sessionState.newHadoopConf()
    OcsfMappings.routes.flatMap { route =>
      val name = OcsfSink.tableName(route)
      val dir = new Path(s"$baseDir/$name")
      val fs = dir.getFileSystem(hadoopConf)
      val hasParquet = fs.exists(dir) && {
        // recursive object listing — one LIST call family on S3, no
        // per-directory round trips
        val it: RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] =
          fs.listFiles(dir, true)
        var found = false
        while (!found && it.hasNext)
          found = it.next().getPath.getName.endsWith(".parquet")
        found
      }
      if (hasParquet) {
        load(spark, baseDir, route).createOrReplaceTempView(s"ocsf_$name")
        Some(s"ocsf_$name")
      } else None
    }
  }
}
