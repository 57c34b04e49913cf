package graft

import graft.queries.OcsfLake

/** Build (or reuse) the deterministic nested-OCSF verification lake at
  * [[OcsfLake.Root]] and print per-table row counts — the dev loop for
  * the `q_ocsf_lake_*` queries and their DuckDB oracles.
  * Usage: {{{ runMain graft.OcsfLakeBuild }}} */
object OcsfLakeBuild {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val root = OcsfLake.ensure(spark)
    graft.ocsf.OcsfMappings.routes.foreach { route =>
      val n = OcsfLake.table(spark, route).count()
      println(f"[lake] ${graft.ocsf.OcsfSink.tableName(route)}%-40s $n%8d rows")
    }
    println(s"[lake] at $root")
    spark.stop()
  }
}
