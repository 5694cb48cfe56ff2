package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every module's query registry; each `queries` key has a
  * DuckDB oracle in `oracleSql` unless its semantics are not
  * SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Analytics.queries ++
      graft.queries.TextAnalytics.queries ++
      graft.queries.CorpusOps.queries ++
      graft.queries.MediaStream.queries ++
      graft.queries.Curation.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Analytics.oracle ++
      graft.queries.TextAnalytics.oracle ++
      graft.queries.CorpusOps.oracle ++
      graft.queries.MediaStream.oracle ++
      graft.queries.Curation.oracle
}
