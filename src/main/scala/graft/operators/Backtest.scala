package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

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

/** One merged backtest input row: `kind` 0 = candle close, 1 = BUY signal,
  * 2 = SELL signal — the kind is the deterministic same-timestamp
  * tie-break (the candle at `t` is processed BEFORE the signals derived
  * from it, so an entry bar can never stop itself out). */
final case class MergedRow(pair: String, time: Timestamp, kind: Int, px: Double)

/** One round-trip trade under stop-loss/take-profit exits: `reason` is
  * 'SL' (close breached `entry·(1−sl)`), 'TP' (close reached
  * `entry·(1+tp)`) or 'SIG' (the strategy's own SELL cross). Exit fields
  * None while the position is open. */
final case class StopTradeRow(pair: String, trade_no: Int,
                              entry_time: Timestamp, entry_price: Double,
                              exit_time: Option[Timestamp], exit_price: Option[Double],
                              reason: Option[String], pnl: Option[Double])

/** Event row of the LIVE stop-managed fold: `kind` -1 = the key's resumed
  * state (sorts first), 0 = candle close, 1 = BUY, 2 = SELL — the same
  * candle-before-signals same-bar tie-break as [[MergedRow]]. */
final case class LiveStopEvent(pair: String, timeframe: String, kind: Int,
                               time: Timestamp, px: Double,
                               entry_time: Timestamp, entry_price: Double,
                               n_closed: Long, open: Boolean)

/** Tagged output of [[Backtest.tradesStoppedIncremental]]: `is_state` =
  * false → one CLOSED stop-managed round trip (`reason` SL/TP/SIG); true →
  * the key's advanced fold state. */
final case class LiveStopFold(pair: String, timeframe: String,
                              is_state: Boolean, trade_no: Long,
                              entry_time: Timestamp, entry_price: Double,
                              exit_time: Option[Timestamp],
                              exit_price: Option[Double],
                              reason: Option[String], pnl: Option[Double],
                              open: Boolean, n_closed: Long, last_time: Timestamp)

/** Event row of the LIVE trade fold: `kind` 0 = the key's resumed state
  * (sorts before every strictly-later signal), 1 = a new signal. */
final case class LiveTradeEvent(pair: String, timeframe: String, kind: Int,
                                time: Timestamp, event_type: String, price: Double,
                                entry_time: Timestamp, entry_price: Double,
                                n_closed: Long, open: Boolean)

/** Tagged output of [[Backtest.tradesIncremental]]: `is_state` = false →
  * one CLOSED round-trip trade; true → the key's advanced fold state
  * (open-position fields + closed-trade count + folded frontier). */
final case class LiveTradeFold(pair: String, timeframe: String,
                               is_state: Boolean, trade_no: Long,
                               entry_time: Timestamp, entry_price: Double,
                               exit_time: Option[Timestamp],
                               exit_price: Option[Double], pnl: Option[Double],
                               open: Boolean, n_closed: Long, last_time: Timestamp)

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

  /** F6 risk layer: per-pair per-trade risk metrics off the [[trades]]
    * ledger — mean PnL, population volatility, downside deviation (vs a
    * zero target, the Sortino convention), and the per-trade Sharpe- and
    * Sortino-style ratios (no annualization — the trade grain is
    * irregular; scale outside if a calendar basis is wanted).
    *
    * ENGINE-PORTABLE NUMERICS: per-trade PnL is rounded to the 6-dp grid
    * and every Σp, Σp², Σmin(p,0)² accumulates as EXACT DECIMAL —
    * order-free — so the only float work is one identical
    * mean/variance/sqrt/ratio chain at the end (the [[Indicators.bollinger]]
    * discipline). Ratios are NULL when their denominator is zero (a
    * constant or all-winning PnL series). One aggregation shuffle on the
    * pair key; open (NULL-pnl) trades are excluded identically on any
    * engine. */
  /** F6 risk-managed ledger: the long-only state machine of [[trades]] with
    * intra-trade STOP-LOSS and TAKE-PROFIT exits driven by the candle
    * stream — the risk layer every real backtest engine carries (the
    * reference's engine declares PnL simulation as intent,
    * src/core/backtest_engine.py:5-44; exits-by-price-path is its natural
    * depth). The signal stream and the candle stream merge into ONE
    * per-pair time-ordered fold (kind tie-break: candle before signals at
    * the same bar, so the entry bar cannot stop itself out); while long,
    * each candle close is tested `close ≤ entry·(1−sl)` (exit 'SL') else
    * `close ≥ entry·(1+tp)` (exit 'TP'); a strategy SELL still closes at
    * its own price ('SIG'); after any exit the next BUY re-enters.
    * Multipliers are computed ONCE as `1.0 − sl` / `1.0 + tp` in double —
    * the oracle spells `CAST(1.0 AS DOUBLE) − CAST(sl AS DOUBLE)` so both
    * engines compare against the identical double (the llm_lm_interp
    * pattern). Same single-shuffle sorted-group fold as every recurrence
    * here; state per pair: one bool + three scalars. */
  def tradesStopped(signals: DataFrame, candles: DataFrame,
                    slPct: Double, tpPct: Double): Dataset[StopTradeRow] = {
    require(slPct > 0 && tpPct > 0, s"sl/tp must be positive, got $slPct/$tpPct")
    val spark = signals.sparkSession
    import spark.implicits._
    val slMult = 1.0 - slPct
    val tpMult = 1.0 + tpPct
    val ev = signals.select($"pair", $"event_datetime".as("time"),
      when($"event_type" === "BUY", 1).otherwise(2).as("kind"),
      $"price".as("px"))
    val cd = candles.select($"pair", $"time", lit(0).as("kind"), $"close".as("px"))
    cd.unionByName(ev).as[MergedRow]
      .groupByKey(_.pair)
      .flatMapSortedGroups($"time", $"kind") { (pair, rows) =>
        val out = Vector.newBuilder[StopTradeRow]
        var entryTime: Timestamp = null
        var entry = 0.0
        var long = false
        var n = 0
        rows.foreach { r =>
          if (!long) {
            if (r.kind == 1) { entryTime = r.time; entry = r.px; long = true }
          } else {
            val reason =
              if (r.kind == 0) {
                if (r.px <= entry * slMult) "SL"
                else if (r.px >= entry * tpMult) "TP"
                else null
              } else if (r.kind == 2) "SIG"
              else null
            if (reason != null) {
              n += 1
              out += StopTradeRow(pair, n, entryTime, entry,
                Some(r.time), Some(r.px), Some(reason), Some(r.px - entry))
              long = false
            }
          }
        }
        if (long)
          out += StopTradeRow(pair, n + 1, entryTime, entry, None, None, None, None)
        out.result().iterator
      }
  }

  def riskMetrics(trades: Dataset[TradeRow]): DataFrame = {
    val closed = trades.toDF().filter(col("pnl").isNotNull)
      .select(col("pair"), round(col("pnl"), 6).cast("decimal(18,6)").as("p"))
    val zero = lit(0).cast("decimal(38,12)")
    closed.groupBy(col("pair"))
      .agg(count(lit(1)).as("n_trades"),
        sum(col("p")).as("s"),
        sum((col("p") * col("p")).cast("decimal(38,12)")).as("sq"),
        sum(when(col("p") < 0, (col("p") * col("p")).cast("decimal(38,12)"))
          .otherwise(zero)).as("dsq"))
      .withColumn("mean", col("s").cast("double") / col("n_trades"))
      .withColumn("vol", sqrt(greatest(
        col("sq").cast("double") / col("n_trades") - col("mean") * col("mean"),
        lit(0.0))))
      .withColumn("ddev", sqrt(col("dsq").cast("double") / col("n_trades")))
      .select(col("pair"), col("n_trades"),
        round(col("mean"), 6).as("mean_pnl"),
        round(col("vol"), 6).as("vol"),
        when(col("vol") > 0, round(col("mean") / col("vol"), 6)).as("sharpe"),
        round(col("ddev"), 6).as("downside_dev"),
        when(col("ddev") > 0, round(col("mean") / col("ddev"), 6)).as("sortino"))
  }

  /** F6 live: resume the alternating trade machine from per-key state and
    * fold ONLY the new signals — the [[trades]] semantics as an
    * incremental per-poll pass (the deployment's trade-ledger tail).
    *
    * Inputs: `state` = the previous [[LiveTradeFold]] state rows (empty
    * on first fold); `signals` in the live signal-store shape, every row
    * STRICTLY past its key's folded frontier (the caller bounds the
    * read; a signal at or before the frontier here means the ordering
    * contract broke and the fold FAILS LOUDLY rather than silently
    * re-pairing history). Output: one tagged frame — closed trades plus
    * every key's advanced state (state-only keys re-emit unchanged, so a
    * snapshot overwrite carries all keys forward).
    *
    * Scale shape: one shuffle on (pair, timeframe), secondary-sorted
    * fold (the EMA/RSI pattern); state is O(keys), per-group memory one
    * key's new signals. */
  def tradesIncremental(state: DataFrame, signals: DataFrame): Dataset[LiveTradeFold] = {
    val spark = signals.sparkSession
    import spark.implicits._
    val sigEv = signals.select($"pair",
      $"trigger_indicator_timeframe".as("timeframe"), lit(1).as("kind"),
      $"event_datetime".as("time"), $"event_type", $"price",
      lit(null).cast("timestamp").as("entry_time"),
      lit(0.0).as("entry_price"), lit(0L).as("n_closed"), lit(false).as("open"))
    val stEv = state.select($"pair", $"timeframe", lit(0).as("kind"),
      $"last_time".as("time"), lit(null).cast("string").as("event_type"),
      lit(0.0).as("price"), $"entry_time", $"entry_price", $"n_closed", $"open")
    sigEv.unionByName(stEv).as[LiveTradeEvent]
      .groupByKey(e => (e.pair, e.timeframe))
      .flatMapSortedGroups($"time", $"kind", $"event_type") { case ((pair, tf), rows) =>
        val out = Vector.newBuilder[LiveTradeFold]
        var open = false
        var entryT: Timestamp = null
        var entryP = 0.0
        var n = 0L
        var last: Timestamp = null
        var frontier: Timestamp = null
        var sigSeen = false
        rows.foreach { e =>
          if (e.kind == 0) {
            // a signal sorting BEFORE the state row is strictly earlier
            // than the frontier — caught here via sigSeen
            require(!sigSeen,
              s"signal at or before the folded frontier for $pair/$tf — " +
                "the live ordering contract broke; refusing to re-pair history")
            open = e.open; entryT = e.entry_time; entryP = e.entry_price
            n = e.n_closed; last = e.time; frontier = e.time
          } else {
            sigSeen = true
            // a signal AT the frontier sorts after the kind-0 state row
            // (same time, kind 1 > 0) — catch the equality case here so
            // "at or before" fails loudly as documented, not just "before"
            require(frontier == null || e.time.after(frontier),
              s"signal at or before the folded frontier for $pair/$tf — " +
                "the live ordering contract broke; refusing to re-pair history")
            e.event_type match {
              case "BUY" if !open =>
                open = true; entryT = e.time; entryP = e.price
              case "SELL" if open =>
                n += 1
                out += LiveTradeFold(pair, tf, is_state = false, n,
                  entryT, entryP, Some(e.time), Some(e.price),
                  Some(e.price - entryP), open = false, n, e.time)
                open = false; entryT = null; entryP = 0.0
              case _ => // already long on BUY / flat on SELL: ignore
            }
            last = e.time
          }
        }
        out += LiveTradeFold(pair, tf, is_state = true, 0L,
          entryT, entryP, None, None, None, open, n, last)
        out.result().iterator
      }
  }

  /** F6 risk live: the [[tradesStopped]] semantics as an incremental
    * per-poll fold — candle closes INTERLEAVED with signals per
    * (pair, timeframe), resumed from per-key state (the
    * [[tradesIncremental]] contract: every new event strictly past its
    * key's folded frontier, violations fail loudly; deterministic
    * same-instant order state < candle < BUY < SELL, so an entry bar can
    * never stop itself out and the chunked fold replays the one-shot
    * [[tradesStopped]] machine exactly). Candles of a timeframe drive the
    * stops of that timeframe's ledger. Multipliers computed once as
    * `1.0 − sl` / `1.0 + tp` in double (the oracle-parity discipline of
    * [[tradesStopped]]).
    *
    * Scale shape: one shuffle on (pair, timeframe), secondary-sorted
    * fold; state O(keys); per-group memory one key's new events. */
  def tradesStoppedIncremental(state: DataFrame, signals: DataFrame,
                               candles: DataFrame, slPct: Double,
                               tpPct: Double): Dataset[LiveStopFold] = {
    require(slPct > 0 && tpPct > 0, s"sl/tp must be positive, got $slPct/$tpPct")
    val spark = signals.sparkSession
    import spark.implicits._
    val slMult = 1.0 - slPct
    val tpMult = 1.0 + tpPct
    def pad(kind: Column, time: Column, px: Column)(df: DataFrame,
        pairC: Column, tfC: Column) =
      df.select(pairC.as("pair"), tfC.as("timeframe"), kind.as("kind"),
        time.as("time"), px.as("px"),
        lit(null).cast("timestamp").as("entry_time"),
        lit(0.0).as("entry_price"), lit(0L).as("n_closed"), lit(false).as("open"))
    val sigEv = pad(when(col("event_type") === "BUY", 1).otherwise(2),
      col("event_datetime"), col("price"))(
      signals, col("pair"), col("trigger_indicator_timeframe"))
    val cdEv = pad(lit(0), col("time"), col("close"))(
      candles, col("pair"), col("timeframe"))
    val stEv = state.select(col("pair"), col("timeframe"),
      lit(-1).as("kind"), col("last_time").as("time"), lit(0.0).as("px"),
      col("entry_time"), col("entry_price"), col("n_closed"), col("open"))
    sigEv.unionByName(cdEv).unionByName(stEv).as[LiveStopEvent]
      .groupByKey(e => (e.pair, e.timeframe))
      .flatMapSortedGroups($"time", $"kind") { case ((pair, tf), rows) =>
        val out = Vector.newBuilder[LiveStopFold]
        var open = false
        var entryT: Timestamp = null
        var entryP = 0.0
        var n = 0L
        var last: Timestamp = null
        var frontier: Timestamp = null
        var evSeen = false
        rows.foreach { e =>
          if (e.kind == -1) {
            require(!evSeen,
              s"event at or before the folded frontier for $pair/$tf — " +
                "the live ordering contract broke; refusing to re-fold history")
            open = e.open; entryT = e.entry_time; entryP = e.entry_price
            n = e.n_closed; last = e.time; frontier = e.time
          } else {
            evSeen = true
            require(frontier == null || e.time.after(frontier),
              s"event at or before the folded frontier for $pair/$tf — " +
                "the live ordering contract broke; refusing to re-fold history")
            if (!open) {
              if (e.kind == 1) { open = true; entryT = e.time; entryP = e.px }
            } else {
              val reason =
                if (e.kind == 0) {
                  if (e.px <= entryP * slMult) "SL"
                  else if (e.px >= entryP * tpMult) "TP"
                  else null
                } else if (e.kind == 2) "SIG"
                else null
              if (reason != null) {
                n += 1
                out += LiveStopFold(pair, tf, is_state = false, n,
                  entryT, entryP, Some(e.time), Some(e.px), Some(reason),
                  Some(e.px - entryP), open = false, n, e.time)
                open = false; entryT = null; entryP = 0.0
              }
            }
            last = e.time
          }
        }
        out += LiveStopFold(pair, tf, is_state = true, 0L,
          entryT, entryP, None, None, None, None, open, n, last)
        out.result().iterator
      }
  }
}
