package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Extensions, ExtensionOracles, Relational, RelationalOracles}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` is the complete registered operator surface; each key either
  * has a DuckDB oracle in `oracleSql` (hash-compared at sf0.01) or is
  * rows-only checked.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The flagship capability of the reference is the TTL-evicted keyed
    * stateful map (SURVEY §0 item 1); its batch-queryable form is the
    * gap-sessionized running sum. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q14MapWithStateTtl(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data-pipeline extensions (§7.4). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all ++ Extensions.all

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalOracles.all ++ ExtensionOracles.all
}
