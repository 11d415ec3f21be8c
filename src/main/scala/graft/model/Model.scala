package graft.model

import java.sql.Timestamp

/** Core entities of the engine (SURVEY.md §1.4).
  *
  * The reference stores these as dynamically-created Postgres table families
  * (one table per pair / per pair×timeframe —
  * reference: src/etl/flows/transform_services.py:19-50). Here the family key
  * (`pair`, `timeframe`) is lifted into columns so one Dataset holds all keys
  * and Spark partitions by them at scale.
  */
final case class Tick(pair: String, time: Timestamp, bid: Double, ask: Double)

/** OHLC candle — reference: ohlc.<pair>_<tf>(time PK, open, high, low, close)
  * (src/etl/flows/transform_services.py:41-50). Prices derive from `bid` only
  * (src/etl/flows/transform_services.py:70-87). */
final case class Candle(pair: String, timeframe: String, time: Timestamp,
                        open: Double, high: Double, low: Double, close: Double)

/** Indicator fact — reference: fact_rsi/fact_sma/fact_ema
  * (alembic/versions/e2444ebd2a06_baseline_current_schema.py:81-120).
  * `value` is None during the indicator warm-up window (reference stores NaN;
  * we standardize on NULL — SURVEY.md §7.4). */
final case class IndicatorValue(indicator: String, pair: String, timeframe: String,
                                time: Timestamp, period: Int, calc_version: String,
                                value: Option[Double])

/** Buy/sell signal — reference: fact_buysell_events
  * (alembic/versions/e2444ebd2a06_baseline_current_schema.py:64-78).
  * `trigger_indicator_timeframe` is typed as the timeframe code string; the
  * reference's VARCHAR-column-holding-an-int inconsistency is deliberately not
  * replicated (docs/evaluations.md:23-24, SURVEY.md §1.1). */
final case class SignalEvent(event_datetime: Timestamp, pair: String,
                             event_type: String, price: Double, quantity: Int,
                             trigger_indicator_name: String,
                             trigger_indicator_value: Double,
                             trigger_indicator_timeframe: String,
                             trigger_indicator_period: Int)

/** Timeframe dimension — reference: dim_timeframe seeds
  * (alembic/versions/e2444ebd2a06_baseline_current_schema.py:135-141,
  * alembic/versions/0a3601d18004_add_timeframe.py:23-27). */
final case class Timeframe(code: String, durationSeconds: Int)

object Timeframe {
  val Base: Timeframe = Timeframe("1m", 60)
  val All: Seq[Timeframe] = Seq(
    Timeframe("1m", 60), Timeframe("5m", 300), Timeframe("15m", 900),
    Timeframe("30m", 1800), Timeframe("1h", 3600), Timeframe("4h", 14400))
  val byCode: Map[String, Timeframe] = All.map(t => t.code -> t).toMap
}

/** Currency-pair dimension — reference: dim_currency seeds
  * (alembic/versions/e2444ebd2a06_baseline_current_schema.py:126-133). */
final case class CurrencyPair(id: Int, baseCurrency: String, quoteCurrency: String,
                              code: String, symbol: String)

object CurrencyPair {
  val Seed: Seq[CurrencyPair] = Seq(
    CurrencyPair(1, "USD", "JPY", "USD/JPY", "USD_JPY"),
    CurrencyPair(2, "EUR", "JPY", "EUR/JPY", "EUR_JPY"),
    CurrencyPair(3, "GBP", "JPY", "GBP/JPY", "GBP_JPY"),
    CurrencyPair(4, "AUD", "JPY", "AUD/JPY", "AUD_JPY"),
    CurrencyPair(5, "CAD", "JPY", "CAD/JPY", "CAD_JPY"),
    CurrencyPair(6, "CHF", "JPY", "CHF/JPY", "CHF_JPY"))
}
