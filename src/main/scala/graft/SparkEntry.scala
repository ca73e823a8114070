package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2
  * (names carry the §2 operator ids); `oracleSql` holds the DuckDB
  * equivalent with IDENTICAL output column names (the driver sorts
  * columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    InferDbQueries.defs("x29_inferdb_probe")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++ InferDbQueries.defs ++ TextQueries.defs ++ LearnedQueries.defs ++ ExtraQueries.defs ++ IvfQueries.defs ++ StorageQueries.defs ++ AnalyticsQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ InferDbQueries.oracle ++ TextQueries.oracle ++ LearnedQueries.oracle ++ ExtraQueries.oracle ++ IvfQueries.oracle ++ StorageQueries.oracle ++ AnalyticsQueries.oracle
}
