package graft

import graft.queries.{IndicatorQueries, LlmQueries, PipelineQueries, StarQueries, StreamQueries, TradingQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the config-driven engine spine: events → ticks → candles across
    * every configured timeframe (F2 fan-out, P12 parameters). */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.Flows.candleFlow(
      graft.queries.TradingQueries.ticks(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TradingQueries.queries ++ IndicatorQueries.queries ++ PipelineQueries.queries ++
      StarQueries.queries ++ LlmQueries.queries ++ StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    TradingQueries.oracleSql ++ IndicatorQueries.oracleSql ++ PipelineQueries.oracleSql ++
      StarQueries.oracleSql ++ LlmQueries.oracleSql ++ StreamQueries.oracleSql
}
