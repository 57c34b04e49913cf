package graft.ocsf

import java.nio.file.{Files, Paths}
import graft.SparkSpec

/** Per-route schema contract: every normalizer's output StructType is
  * pinned to a checked-in DDL (src/test/resources/schemas/), mirroring
  * the reference's explicit Glue schema per class — Firehose record
  * conversion there would fail loudly on drift, and so does this spec.
  * Intentional changes: regenerate via `runMain graft.ocsf.SchemaDump`
  * and review the diff. */
class OcsfSchemaSpec extends SparkSpec {

  test("all 13 route schemas match their frozen DDL") {
    val dir = Paths.get("src/test/resources/schemas")
    assume(Files.exists(dir), "schema resources missing")
    val actual = SchemaDump.schemas(spark)
    assert(actual.size == 13)
    val drifted = actual.flatMap { case (table, ddl) =>
      val pinned = new String(
        Files.readAllBytes(dir.resolve(s"$table.ddl")), "UTF-8").trim
      if (pinned == ddl.trim) None
      else Some(s"$table:\n  pinned: $pinned\n  actual: $ddl")
    }
    assert(drifted.isEmpty,
      "schema drift (regenerate with SchemaDump if intentional):\n" +
        drifted.mkString("\n"))
  }
}
