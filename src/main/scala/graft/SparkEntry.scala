package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{DocQueries, OcsfLakeQueries, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented SURVEY §2 capability to a
  * DataFrame program; `oracleSql` carries the DuckDB-equivalent ANSI
  * SQL with identical column aliases (the driver sorts columns by name
  * and hashes values, so aliases must match exactly).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. The
    * OCSF-style classification join + aggregation — the reference's
    * core event→class semantics as one Catalyst plan. */
  def entry(spark: SparkSession): DataFrame =
    Relational.qOcsfClassify(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ DocQueries.queries ++ OcsfLakeQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ DocQueries.oracleSql ++ OcsfLakeQueries.oracleSql
}
