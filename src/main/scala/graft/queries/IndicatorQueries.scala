package graft.queries

import graft.operators.{Indicators, Signals}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable queries for indicators (U1-U3) and SMA-cross signals
  * (J1+W1) over the canonical event-derived 1m candles.
  *
  * SMA is oracle-checked (expressible as a DuckDB frame aggregate); values
  * are rounded to 6 decimals on both sides because the two engines sum the
  * window in different orders (Spark sequential, DuckDB segment tree) and can
  * differ in the last ulp. EMA/RSI are recursive (TA-Lib semantics) with no
  * clean SQL form — registered without oracle → driver's rows-only check.
  */
object IndicatorQueries {

  import TradingQueries.{c1mCte, candles1m, dedupCte, ticksCte}

  private val prelude = s"WITH $ticksCte, $dedupCte, $c1mCte"

  private def smaSelect(p: Int): String =
    s"""SELECT pair, '1m' AS timeframe, epoch(time)::BIGINT AS time_s, $p AS period,
       |       CASE WHEN row_number() OVER (PARTITION BY pair ORDER BY time) >= $p
       |            THEN round(avg(close) OVER (PARTITION BY pair ORDER BY time
       |                 ROWS BETWEEN ${p - 1} PRECEDING AND CURRENT ROW), 6)
       |       END AS value
       |FROM c1m""".stripMargin

  private def indOut(df: DataFrame): DataFrame =
    df.select(col("pair"), col("timeframe"), unix_timestamp(col("time")).as("time_s"),
      col("period"), round(col("value"), 6).as("value"))

  private def signalOut(df: DataFrame): DataFrame =
    df.select(col("pair"), unix_timestamp(col("event_datetime")).as("time_s"),
      col("event_type"), round(col("price"), 6).as("price"),
      col("trigger_indicator_period").as("period"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "u1_sma_14_1m" -> ((s, d) => indOut(Indicators.sma(candles1m(s, d), 14))),
    "u1_sma_multi" -> ((s, d) => {
      val c = candles1m(s, d)
      indOut(Indicators.sma(c, 14).unionByName(Indicators.sma(c, 28)))
    }),
    "u2_ema_14_1m" -> ((s, d) => indOut(Indicators.ema(candles1m(s, d), 14).toDF())),
    "u3_rsi_14_1m" -> ((s, d) => indOut(Indicators.rsi(candles1m(s, d), 14).toDF())),
    "w1_golden_cross" -> ((s, d) =>
      signalOut(Signals.goldenCross(Indicators.indicatorFacts(candles1m(s, d), Seq("SMA"), Seq(14, 28)), 14, 28))),
    "w1_dead_cross" -> ((s, d) =>
      signalOut(Signals.deadCross(Indicators.indicatorFacts(candles1m(s, d), Seq("SMA"), Seq(14, 28)), 14, 28))))

  private def crossSql(op1: String, op2: String, eventType: String): String =
    s"""$prelude,
       |sma AS (
       |  SELECT pair, time,
       |         CASE WHEN row_number() OVER (PARTITION BY pair ORDER BY time) >= 14
       |              THEN avg(close) OVER (PARTITION BY pair ORDER BY time
       |                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) END AS s14,
       |         CASE WHEN row_number() OVER (PARTITION BY pair ORDER BY time) >= 28
       |              THEN avg(close) OVER (PARTITION BY pair ORDER BY time
       |                   ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) END AS s28
       |  FROM c1m
       |),
       |x AS (
       |  SELECT pair, time, s14, s28,
       |         lag(s14) OVER (PARTITION BY pair ORDER BY time) AS ps,
       |         lag(s28) OVER (PARTITION BY pair ORDER BY time) AS pl
       |  FROM sma
       |)
       |SELECT pair, epoch(time)::BIGINT AS time_s, '$eventType' AS event_type,
       |       round(s14, 6) AS price, 14 AS period
       |FROM x WHERE ps $op1 pl AND s14 $op2 s28""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "u1_sma_14_1m" -> s"$prelude\n${smaSelect(14)}",
    "u1_sma_multi" -> s"$prelude\n${smaSelect(14)}\nUNION ALL\n${smaSelect(28)}",
    "w1_golden_cross" -> crossSql("<=", ">", "BUY"),
    "w1_dead_cross" -> crossSql(">=", "<", "SELL"))
}
