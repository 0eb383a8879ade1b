package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` aggregates every implemented operator's judge-visible query;
  * `oracleSql` holds the DuckDB-equivalent SQL (column names aligned).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q1 (pricing summary) rather than q5: the ASIA-filtered join returns a
    * single row at sf0.001, too thin a signal for a smoke check. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.IcebergQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.IcebergQueries.oracle ++
      graft.queries.PipelineQueries.oracle ++
      graft.queries.StreamingQueries.oracle
}
