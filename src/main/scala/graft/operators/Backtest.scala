package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}

/** Event row for the backtest fold (top-level for Catalyst codegen access). */
final case class SignalRow(pair: String, time: Timestamp, event_type: String, price: Double)

/** Per-pair backtest result. */
final case class BacktestResult(pair: String, trades: Int, total_pnl: Double,
                                open_position: Boolean)

/** One round-trip trade (exit fields None while the position is still open). */
final case class TradeRow(pair: String, trade_no: Int,
                          entry_time: Timestamp, entry_price: Double,
                          exit_time: Option[Timestamp], exit_price: Option[Double],
                          pnl: Option[Double])

/** One round-trip trade under notional position sizing and per-side fees:
  * `qty = notional / entry`, `gross = qty·(exit − entry)`,
  * `fee = feeRate·qty·(entry + exit)` (both sides' traded value),
  * `net = gross − fee`. Money fields None while the position is open. */
final case class SizedTradeRow(pair: String, trade_no: Int,
                               entry_time: Timestamp, entry_price: Double,
                               qty: Double,
                               exit_time: Option[Timestamp], exit_price: Option[Double],
                               gross: Option[Double], fee: Option[Double],
                               net: Option[Double])

/** F6: event-driven backtest over buy/sell signal events.
  *
  * The reference ships this as a stub that reads `fact_buysell_events` in
  * time order and simulates PnL (src/core/backtest_engine.py:5-44,
  * docs/requirements.md:11-19). Concrete semantics here: long-only
  * alternating state machine — a BUY opens a 1-unit position at its price
  * (ignored if already long), a SELL closes it (ignored if flat);
  * PnL = Σ(sell - buy). Same per-key ordered-fold pattern as EMA/RSI:
  * one shuffle on pair, secondary sort by time, sequential fold.
  */
object Backtest {

  def run(signals: DataFrame): Dataset[BacktestResult] = {
    val spark = signals.sparkSession
    import spark.implicits._
    signals.select($"pair", $"event_datetime".as("time"), $"event_type", $"price")
      .as[SignalRow]
      .groupByKey(_.pair)
      .flatMapSortedGroups($"time", $"event_type") { (pair, rows) =>
        var entry = 0.0
        var long = false
        var trades = 0
        var pnl = 0.0
        rows.foreach { r =>
          r.event_type match {
            case "BUY" if !long => entry = r.price; long = true
            case "SELL" if long => pnl += r.price - entry; trades += 1; long = false
            case _ => // already long on BUY / flat on SELL: ignore
          }
        }
        Iterator.single(BacktestResult(pair, trades, pnl, long))
      }
  }

  /** Per-trade ledger — the reference's user story asks for the individual
    * entry/exit rows behind the per-pair totals (docs/requirements.md:11-19,
    * src/core/backtest_engine.py:5-44). Same long-only alternating state
    * machine as [[run]], emitting one row per round trip; a position still
    * open at end-of-data becomes a final row with NULL exit fields.
    * Σpnl and row counts reconcile exactly with [[run]]. */
  def trades(signals: DataFrame): Dataset[TradeRow] = {
    val spark = signals.sparkSession
    import spark.implicits._
    signals.select($"pair", $"event_datetime".as("time"), $"event_type", $"price")
      .as[SignalRow]
      .groupByKey(_.pair)
      .flatMapSortedGroups($"time", $"event_type") { (pair, rows) =>
        val out = Vector.newBuilder[TradeRow]
        var entryTime: Timestamp = null
        var entry = 0.0
        var long = false
        var n = 0
        rows.foreach { r =>
          r.event_type match {
            case "BUY" if !long =>
              entryTime = r.time; entry = r.price; long = true
            case "SELL" if long =>
              n += 1
              out += TradeRow(pair, n, entryTime, entry,
                Some(r.time), Some(r.price), Some(r.price - entry))
              long = false
            case _ => // already long on BUY / flat on SELL: ignore
          }
        }
        if (long) out += TradeRow(pair, n + 1, entryTime, entry, None, None, None)
        out.result().iterator
      }
  }

  /** The [[trades]] ledger under position sizing and transaction costs —
    * the depth the reference's backtest engine declares as intent
    * (src/core/backtest_engine.py:5-44, docs/requirements.md:11-19): each
    * BUY deploys a fixed `notional`, so `qty = notional / entry_price`
    * (constant-notional sizing — the standard FX backtest convention), and
    * each side pays `feeRate` of its traded value:
    * `fee = feeRate · qty · (entry + exit)`; `net = gross − fee`. Same
    * long-only alternating fold as [[trades]]; every money field is plain
    * double algebra in a fixed order, so an oracle spelling the identical
    * expressions over the same trade pairing is bit-exact. */
  def tradesSized(signals: DataFrame, notional: Double,
                  feeRate: Double): Dataset[SizedTradeRow] = {
    require(notional > 0, s"notional must be positive, got $notional")
    require(feeRate >= 0, s"feeRate must be non-negative, got $feeRate")
    val spark = signals.sparkSession
    import spark.implicits._
    signals.select($"pair", $"event_datetime".as("time"), $"event_type", $"price")
      .as[SignalRow]
      .groupByKey(_.pair)
      .flatMapSortedGroups($"time", $"event_type") { (pair, rows) =>
        val out = Vector.newBuilder[SizedTradeRow]
        var entryTime: Timestamp = null
        var entry = 0.0
        var long = false
        var n = 0
        rows.foreach { r =>
          r.event_type match {
            case "BUY" if !long =>
              entryTime = r.time; entry = r.price; long = true
            case "SELL" if long =>
              n += 1
              val qty = notional / entry
              val gross = qty * (r.price - entry)
              val fee = feeRate * qty * (entry + r.price)
              out += SizedTradeRow(pair, n, entryTime, entry, qty,
                Some(r.time), Some(r.price), Some(gross), Some(fee),
                Some(gross - fee))
              long = false
            case _ => // already long on BUY / flat on SELL: ignore
          }
        }
        if (long)
          out += SizedTradeRow(pair, n + 1, entryTime, entry, notional / entry,
            None, None, None, None, None)
        out.result().iterator
      }
  }
}
