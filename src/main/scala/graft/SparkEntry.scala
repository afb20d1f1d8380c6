package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's query + DuckDB oracle from
  * the per-area query modules under `graft.queries`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.CoreQueries.qAggBasic(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.ApproxQueries.queries ++
      graft.queries.PqlQueries.queries ++
      graft.queries.CorpusQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.ApproxQueries.oracles ++
      graft.queries.PqlQueries.oracles ++
      graft.queries.CorpusQueries.oracles
}
