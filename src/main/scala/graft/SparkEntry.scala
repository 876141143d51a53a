package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The declared query surface lives in [[graft.queries.Catalog]]; this
  * object just adapts it to the driver's expected shape.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Catalog.queries("q02_group_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose hash functions
    * (xxhash64) or sketches (HLL) are not reproducible in DuckDB SQL —
    * driver records a weaker rows-only check for those. */
  def oracleSql: Map[String, String] = Catalog.oracleSql
}
