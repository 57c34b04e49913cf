package graft.ocsf

import java.nio.file.{Files, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Glue-catalog parity: the registered route schemas
  * ([[SchemaDump.schemas]], i.e. what [[OcsfTables.registerCatalog]]
  * serves) are diffed column-by-column — recursively through structs,
  * arrays and maps — against the reference's OWN Glue column
  * inventory, parsed from the 13 `AWS::Glue::Table` TableInput blocks
  * in /root/reference/src/cfn_yaml/QOPCFDR_SchemaTransformation_CFN
  * .yaml (the schemas create_qopcfdr_firehoses.py wires into
  * Firehose record conversion). Any drift vs the reference surface is
  * pinned here, not assumed: every divergence must appear in the
  * [[declared]] allow-list with a reason, or the spec fails.
  *
  * Comparison is by TYPE CLASS, not exact width: the reference's
  * crawler-derived inventory types every id as `bigint` while the
  * frozen contract sizes ids to their OCSF domain (`INT` for enum
  * ids, `BIGINT` for pids/ports) — an integral-vs-integral match.
  * Field ORDER is not compared (columnar parquet + name-based
  * resolution make order irrelevant to every consumer).
  *
  * Skips (rather than fails) when the reference checkout is absent.
  */
class GlueParitySpec extends SparkSpec {

  /** Hive type-class equivalence: widths within a class are a
    * contract choice, classes crossing is drift. */
  private def typeClass(dt: DataType): String = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => "integral"
    case _: FloatType | _: DoubleType | _: DecimalType => "fractional"
    case _: StringType => "string"
    case _: TimestampType | _: TimestampNTZType => "timestamp"
    case other => other.typeName
  }

  private def diff(path: String, ref: DataType, ours: DataType,
                   out: mutable.Buffer[String]): Unit = (ref, ours) match {
    case (r: StructType, o: StructType) =>
      val om = o.fields.map(f => f.name -> f.dataType).toMap
      r.fields.foreach { rf =>
        om.get(rf.name) match {
          case Some(odt) => diff(s"$path.${rf.name}", rf.dataType, odt, out)
          case None => out += s"$path.${rf.name}: MISSING (ref ${rf.dataType.simpleString})"
        }
      }
      val rn = r.fieldNames.toSet
      o.fields.filterNot(f => rn(f.name))
        .foreach(f => out += s"$path.${f.name}: EXTRA (${f.dataType.simpleString})")
    case (r: ArrayType, o: ArrayType) =>
      diff(s"$path[]", r.elementType, o.elementType, out)
    case (r: MapType, o: MapType) =>
      diff(s"$path<key>", r.keyType, o.keyType, out)
      diff(s"$path<value>", r.valueType, o.valueType, out)
    case (r, o) =>
      if (typeClass(r) != typeClass(o))
        out += s"$path: TYPE ${o.simpleString} vs ref ${r.simpleString}"
  }

  /** Parses the CFN template's Glue TableInput blocks into
    * glue-table-name -> columns. The template lays each column as a
    * `- Type: <hive type>` line followed by `Name: <col>` at fixed
    * indent; hive type strings parse with Spark's own DDL parser. */
  private def glueInventory(cfn: java.nio.file.Path): Map[String, Seq[(String, DataType)]] = {
    // The template's detection_finding `evidences` type is malformed
    // AT SOURCE (a missing comma after the hashes array and a `strut<`
    // typo) — Athena would reject the column as written. Repair just
    // those two verbatim defects so the INTENDED inventory parses;
    // keep the repair pinned so an upstream fix is noticed here.
    val brokenEvidences = "hashes:array<struct<algorithm:string," +
      "algorithm_id:bigint,value:string>>>parent_process"
    val raw = Files.readAllLines(cfn).asScala.toVector
    assert(raw.exists(l => l.contains(brokenEvidences) && l.contains("strut<")),
      "reference template's evidences typo is gone — drop the repair below")
    val lines = raw.map(_
      .replace(brokenEvidences,
        brokenEvidences.replace(">>>parent_process", ">>>,parent_process"))
      .replace("strut<", "struct<"))
    val tableName = """^        Name: (query_open_pipeline_for_fdr_\w+_schema)$""".r
    val colType = """^            - Type: (.+?)\s*$""".r
    val colName = """^              Name: (\w+)\s*$""".r
    val tables = mutable.LinkedHashMap.empty[String, mutable.Buffer[(String, DataType)]]
    var cur: Option[String] = None
    var i = 0
    while (i < lines.length) {
      lines(i) match {
        case tableName(t) =>
          cur = Some(t); tables(t) = mutable.Buffer.empty
        case colType(t) if cur.isDefined =>
          lines(i + 1) match {
            case colName(n) =>
              tables(cur.get) += n -> DataType.fromDDL(t)
              i += 1
            case _ => // a Type: line that isn't a column (IAM etc.)
          }
        case _ =>
      }
      i += 1
    }
    tables.view.mapValues(_.toSeq).toMap
  }

  /** Glue table short name -> our route table name (identical except
    * the reference's external_api, which routes to extapi). */
  private def routeTable(glueShort: String): String =
    if (glueShort == "external_api") "extapi" else glueShort

  /** Divergences that ARE the contract, each with its reason. Path
    * syntax matches [[diff]] output prefixes. */
  private val declared: Map[String, String] = Map(
    "extapi.http_request.length: TYPE int vs ref string" ->
      ("the reference's own loader emits a NUMBER here (int(...), " +
        "qopcfdr_stream_loader.py:312); the Glue inventory's `string` " +
        "is stale vs its own producer — our int matches the producer"))

  test("13 registered route schemas match the reference Glue column inventory") {
    val cfn = Paths.get(
      "/root/reference/src/cfn_yaml/QOPCFDR_SchemaTransformation_CFN.yaml")
    assume(Files.exists(cfn), "reference checkout not present")

    val glue = glueInventory(cfn)
    assert(glue.size == 13, s"expected 13 Glue schema tables, parsed ${glue.keys}")

    val ours = SchemaDump.schemas(spark)
      .map { case (t, ddl) => t -> StructType.fromDDL(ddl) }

    val undeclared = mutable.Buffer.empty[String]
    val usedDecls = mutable.Set.empty[String]
    glue.foreach { case (glueTable, refCols) =>
      val short = glueTable
        .stripPrefix("query_open_pipeline_for_fdr_").stripSuffix("_schema")
      val table = routeTable(short)
      assert(ours.contains(table), s"no registered route table for $glueTable")
      // partition_0 is the crawler's directory-partition pseudo-column;
      // our catalog partitions the same directories by eventDay
      // (CatalogSpec pins the pruning behavior), so it is matched
      // structurally here rather than by name.
      val refStruct = StructType(refCols.filterNot(_._1 == "partition_0")
        .map { case (n, dt) => StructField(n, dt) })
      assert(refCols.exists(_._1 == "partition_0"),
        s"$glueTable: reference inventory lost its partition column — template drift, re-derive this spec")
      val out = mutable.Buffer.empty[String]
      diff(table, refStruct, ours(table), out)
      out.foreach { d =>
        declared.keys.find(k => d.startsWith(k)) match {
          case Some(k) => usedDecls += k
          case None => undeclared += d
        }
      }
    }
    assert(undeclared.isEmpty,
      "UNDECLARED schema drift vs the reference Glue inventory " +
        "(fix the normalizer, or declare with a reason):\n  " +
        undeclared.mkString("\n  "))
    val stale = declared.keys.toSet -- usedDecls
    assert(stale.isEmpty, s"stale declared divergences (no longer occur): $stale")
  }
}
