package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface is assembled from the per-module maps; every entry
  * with SQL-expressible semantics has a DuckDB oracle in `oracleSql`
  * (column names/types matched exactly for the driver's hash compare).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Analytics.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Analytics.all ++ graft.queries.PipelineQueries.all ++
      graft.queries.WarehouseQueries.all ++ graft.queries.InsightQueries.all ++
      graft.queries.TpchQueries.all ++
      graft.queries.Dashboards.all ++ graft.queries.ExtendedQueries.all ++
      graft.queries.TrainingQueries.all ++ graft.queries.SearchAggQueries.all ++
      graft.queries.CorpusQueries.all ++ graft.queries.LiveQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Analytics.oracle ++ graft.queries.PipelineQueries.oracle ++
      graft.queries.WarehouseQueries.oracle ++ graft.queries.InsightQueries.oracle ++
      graft.queries.TpchQueries.oracle ++
      graft.queries.ExtendedQueries.oracle ++ graft.queries.TrainingQueries.oracle ++
      graft.queries.Dashboards.oracle ++ graft.queries.SearchAggQueries.oracle ++
      graft.queries.CorpusQueries.oracle ++ graft.queries.LiveQueries.oracle
}
