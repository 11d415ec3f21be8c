package graft.queries

import graft.operators.{Backtest, Incremental, Indicators, Relay, Signals}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable queries for the incremental/sink/relay layer
  * (S5, S6, S8, A3, W2, U4, F6). */
object PipelineQueries {

  import TradingQueries.{c1mCte, candles1m, dedupCte, ticks, ticksCte}

  private val prelude = s"WITH $ticksCte, $dedupCte, $c1mCte"
  private val Cutoff = "2024-01-15 00:00:00"
  private val Cursor = "2024-01-20 00:00:00"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a3_watermarks" -> ((s, d) =>
      Incremental.watermarks(candles1m(s, d))
        .select(col("pair"), col("timeframe"),
          unix_timestamp(col("watermark")).as("watermark_s"))),

    "w2_boundary" -> ((s, d) => {
      val c = candles1m(s, d)
      Incremental.warmupBoundaries(c, Incremental.watermarks(c), lookbackRows = 28)
        .select(col("pair"), col("timeframe"),
          unix_timestamp(col("boundary")).as("boundary_s"))
    }),

    "s8_idempotent_sma" -> ((s, d) => {
      // previous run wrote the prefix; incremental run recomputes everything;
      // first-write-wins merge must equal the one-shot full computation.
      val c = candles1m(s, d)
      val existing = Indicators.sma(c.filter(col("time") < lit(Cutoff)), 14)
      val merged = Incremental.appendNew(existing, Indicators.sma(c, 14),
        Seq("pair", "timeframe", "time", "period", "calc_version"))
      merged.select(col("pair"), col("timeframe"), unix_timestamp(col("time")).as("time_s"),
        col("period"), round(col("value"), 6).as("value"))
    }),

    "s6_latest_tick" -> ((s, d) =>
      Relay.latestPerPair(ticks(s, d))
        .select(col("pair"), unix_timestamp(col("time")).as("time_s"),
          col("bid"), col("ask"))),

    "s5_cursor_scan" -> ((s, d) =>
      Relay.afterCursor(ticks(s, d), java.sql.Timestamp.valueOf(Cursor))
        .select(col("pair"), unix_timestamp(col("time")).as("time_s"),
          col("bid"), col("ask"))),

    "u4_messages" -> ((s, d) =>
      Relay.toMessages(ticks(s, d).limit(100))),

    "f6_backtest" -> ((s, d) => {
      val sma = Indicators.indicatorFacts(candles1m(s, d), Seq("SMA"), Seq(14, 28))
      Backtest.run(Signals.strategy(sma, 14, 28)).toDF()
        .select(col("pair"), col("trades"), round(col("total_pnl"), 6).as("total_pnl"),
          col("open_position"))
    }))

  val oracleSql: Map[String, String] = Map(
    "a3_watermarks" ->
      s"""$prelude
         |SELECT pair, '1m' AS timeframe, epoch(max(time))::BIGINT AS watermark_s
         |FROM c1m GROUP BY 1, 2""".stripMargin,

    "w2_boundary" ->
      s"""$prelude,
         |wm AS (SELECT pair, max(time) AS watermark FROM c1m GROUP BY 1),
         |r AS (
         |  SELECT c.pair, c.time,
         |         row_number() OVER (PARTITION BY c.pair ORDER BY c.time DESC) AS rn
         |  FROM c1m c JOIN wm USING (pair) WHERE c.time <= wm.watermark)
         |SELECT pair, '1m' AS timeframe, epoch(time)::BIGINT AS boundary_s
         |FROM r WHERE rn = 29""".stripMargin,

    // first-write-wins merge of a prefix run + full recompute == one-shot run
    "s8_idempotent_sma" ->
      s"""$prelude
         |SELECT pair, '1m' AS timeframe, epoch(time)::BIGINT AS time_s, 14 AS period,
         |       CASE WHEN row_number() OVER (PARTITION BY pair ORDER BY time) >= 14
         |            THEN round(avg(close) OVER (PARTITION BY pair ORDER BY time
         |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW), 6)
         |       END AS value
         |FROM c1m""".stripMargin,

    "s6_latest_tick" ->
      s"""$prelude
         |SELECT pair, epoch(max(time))::BIGINT AS time_s,
         |       max_by(bid, time) AS bid, max_by(ask, time) AS ask
         |FROM dedup GROUP BY pair""".stripMargin,

    "s5_cursor_scan" ->
      s"""$prelude
         |SELECT pair, epoch(time)::BIGINT AS time_s, bid, ask
         |FROM dedup WHERE time > TIMESTAMP '$Cursor'""".stripMargin)
}
