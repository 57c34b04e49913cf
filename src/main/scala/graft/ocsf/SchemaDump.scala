package graft.ocsf

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Writes each route's output schema as DDL to `<outDir>/<table>.ddl`.
  *
  * The reference ships an explicit Glue schema per class (the
  * `query_open_pipeline_for_fdr_*_schema` tables that
  * create_qopcfdr_firehoses.py wires into Firehose's record
  * conversion) — the schema is a frozen CONTRACT, not whatever the
  * loader happens to emit. OcsfSchemaSpec pins the normalizers to the
  * checked-in copies under src/test/resources/schemas/; regenerate
  * with this main only for an intentional schema change.
  *
  * Usage: runMain graft.ocsf.SchemaDump [outDir]
  */
object SchemaDump {

  /** Route → output DDL, derived from an empty classified relation
    * (schemas do not depend on data). */
  def schemas(spark: SparkSession): Map[String, String] = {
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      classifiedSchema(spark))
    Normalizers.normalizeAll(empty).map { case (route, df) =>
      OcsfSink.tableName(route) -> df.schema.toDDL
    }
  }

  /** Schema of FdrSource.load output (raw, fields, event_name + the
    * mapping dimension columns). */
  private def classifiedSchema(spark: SparkSession): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("raw", StringType),
      StructField("fields", MapType(StringType, StringType)),
      StructField("event_name", StringType)) ++
      OcsfMappings.dimension(spark).drop("eventName").schema.fields)
  }

  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "src/test/resources/schemas"
    val spark = graft.GraftSession.get()
    Files.createDirectories(Paths.get(outDir))
    schemas(spark).foreach { case (table, ddl) =>
      Files.write(Paths.get(outDir, s"$table.ddl"),
        (ddl + "\n").getBytes(StandardCharsets.UTF_8))
    }
    println(s"[schemas] wrote 13 DDL files to $outDir")
    spark.stop()
  }
}
