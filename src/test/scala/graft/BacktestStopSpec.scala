package graft

import graft.operators.Backtest

/** Hand-traced stop-loss/take-profit ledger ([[Backtest.tradesStopped]]):
  * each exit reason fires once, the entry bar cannot stop itself out, and
  * an end-of-data open position emits a NULL-exit row. */
class BacktestStopSpec extends SparkSpec {
  import spark.implicits._

  private def t(i: Int) = ts(f"2024-01-01 00:$i%02d:00")

  test("SL, TP and SIG exits, re-entry, entry-bar immunity, open tail") {
    // candle closes per minute; sl=5%, tp=10% on entry 100:
    //   SL at <=95, TP at >=110
    val candles = Seq(
      ("A", t(0), 100.0), ("A", t(1), 94.0), // trade 1: SL at 94
      ("A", t(2), 100.0), ("A", t(3), 111.0), // trade 2: TP at 111
      ("A", t(4), 100.0), ("A", t(5), 105.0), // trade 3: SIG exit at signal px
      ("A", t(6), 100.0) // trade 4: stays open
    ).toDF("pair", "time", "close")
    val signals = Seq(
      ("A", t(0), "BUY", 100.0), // entry bar close=100 (candle first: no self-stop)
      ("A", t(2), "BUY", 100.0),
      ("A", t(4), "BUY", 100.0),
      ("A", t(5), "SELL", 105.5),
      ("A", t(6), "BUY", 100.0)
    ).toDF("pair", "event_datetime", "event_type", "price")
    val out = Backtest.tradesStopped(signals, candles, slPct = 0.05, tpPct = 0.10)
      .orderBy("trade_no").collect()
    assert(out.length === 4)
    assert(out(0).reason === Some("SL") && out(0).exit_price === Some(94.0)
      && out(0).pnl === Some(-6.0))
    assert(out(1).reason === Some("TP") && out(1).exit_price === Some(111.0))
    // t(5): candle close 105 is inside the band, so the SELL signal exits
    assert(out(2).reason === Some("SIG") && out(2).exit_price === Some(105.5))
    assert(out(3).reason === None && out(3).exit_time === None
      && out(3).entry_time === t(6))
  }

  test("candle at the same bar as the SELL wins when it breaches first") {
    val candles = Seq(("A", t(0), 100.0), ("A", t(1), 90.0)).toDF("pair", "time", "close")
    val signals = Seq(("A", t(0), "BUY", 100.0), ("A", t(1), "SELL", 91.0))
      .toDF("pair", "event_datetime", "event_type", "price")
    val out = Backtest.tradesStopped(signals, candles, 0.05, 0.10).collect()
    // kind tie-break: candle (0) before SELL (2) → SL at the close 90, not 91
    assert(out.length === 1 && out(0).reason === Some("SL")
      && out(0).exit_price === Some(90.0))
  }

  private def liveSignals(rows: (String, String, java.sql.Timestamp, String, Double)*) =
    rows.toDF("pair", "trigger_indicator_timeframe", "event_datetime",
      "event_type", "price")

  private def liveState(rows: (String, String, java.sql.Timestamp, java.sql.Timestamp,
      Double, Long, Boolean)*) =
    rows.toDF("pair", "timeframe", "last_time", "entry_time", "entry_price",
      "n_closed", "open")

  test("tradesIncremental fails loudly on a signal AT the folded frontier (not just before)") {
    // state frontier = t(5); a signal at exactly t(5) sorts AFTER the
    // kind-0 state row (kind 1 > 0) — the scaladoc promises "at or
    // before" fails loudly, so equality must trip the guard too
    val st = liveState(("A", "1min", t(5), t(3), 100.0, 2L, true))
    val atFrontier = liveSignals(("A", "1min", t(5), "SELL", 105.0))
    val ex = intercept[org.apache.spark.SparkException] {
      Backtest.tradesIncremental(st, atFrontier).collect()
    }
    assert(ex.getMessage.contains("folded frontier")
      || Option(ex.getCause).exists(_.getMessage.contains("folded frontier")))
    // strictly-before still fails via the sigSeen path
    val before = liveSignals(("A", "1min", t(4), "SELL", 105.0))
    intercept[org.apache.spark.SparkException] {
      Backtest.tradesIncremental(st, before).collect()
    }
    // strictly-after folds cleanly
    val after = liveSignals(("A", "1min", t(6), "SELL", 105.0))
    val ok = Backtest.tradesIncremental(st, after).collect()
    assert(ok.count(!_.is_state) === 1 && ok.filter(!_.is_state).head.pnl === Some(5.0))
  }

  test("tradesIncremental same-timestamp signals fold in (time, kind, event_type) order" +
      " — the batch trades tie-break") {
    // two signals at the same instant: BUY sorts before SELL
    // (event_type asc), matching Backtest.trades' (time, event_type)
    // sort, so the pair closes deterministically as one round trip
    val sigs = liveSignals(
      ("A", "1min", t(1), "SELL", 110.0),
      ("A", "1min", t(1), "BUY", 100.0))
    val out = Backtest.tradesIncremental(liveState(), sigs).collect()
    val closed = out.filter(!_.is_state)
    assert(closed.length === 1 && closed.head.pnl === Some(10.0))
    val st = out.filter(_.is_state).head
    assert(!st.open && st.n_closed === 1L)
  }
}
