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

  test("tradesStoppedIncremental folded in chunks == one-shot tradesStopped per timeframe") {
    // oscillating closes force SL, TP and SIG exits plus re-entries; two
    // pairs x two timeframes; chunk boundaries land mid-trade
    val rnd = new scala.util.Random(5)
    def priceAt(i: Int) = 100.0 + 6.0 * math.sin(i * 1.3) + rnd.nextInt(3)
    val pairs = Seq("A", "B")
    val tfs = Seq("1m", "5m")
    val candleRows = for (p <- pairs; tf <- tfs; i <- 0 to 24)
      yield (p, tf, t(i), priceAt(i + p.hashCode % 5))
    val signalRows = for (p <- pairs; tf <- tfs; i <- Seq(1, 4, 9, 13, 19, 22))
      yield (p, tf, t(i), if (i % 8 < 4) "BUY" else "SELL", priceAt(i) + 0.5)
    val (sl, tp) = (0.08, 0.1)

    // one-shot reference, per timeframe via the batch fold
    val oneShot = tfs.flatMap { tf =>
      val c = candleRows.filter(_._2 == tf).map(r => (r._1, r._3, r._4))
        .toDF("pair", "time", "close")
      val sg = signalRows.filter(_._2 == tf).map(r => (r._1, r._3, r._4, r._5))
        .toDF("pair", "event_datetime", "event_type", "price")
      Backtest.tradesStopped(sg, c, sl, tp).collect()
        .map(r => (r.pair, tf, r.trade_no.toLong, r.entry_time, r.entry_price,
          r.exit_time, r.exit_price, r.reason, r.pnl))
    }.sortBy(x => (x._1, x._2, x._3))

    // incremental: three chunks by time, state carried across folds
    val cuts = Seq(0 to 7, 8 to 15, 16 to 24)
    var state = Seq.empty[(String, String, Boolean, java.sql.Timestamp,
      Double, Long, java.sql.Timestamp)]
      .toDF("pair", "timeframe", "open", "entry_time", "entry_price",
        "n_closed", "last_time")
    val closed = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long, java.sql.Timestamp, Double,
        Option[java.sql.Timestamp], Option[Double], Option[String], Option[Double])]
    for (w <- cuts) {
      val c = candleRows.filter(r => w.contains((r._3.getTime / 60000L % 60).toInt))
        .toDF("pair", "timeframe", "time", "close")
      val sg = signalRows.filter(r => w.contains((r._3.getTime / 60000L % 60).toInt))
        .toDF("pair", "trigger_indicator_timeframe", "event_datetime",
          "event_type", "price")
      val folded = Backtest.tradesStoppedIncremental(state, sg, c, sl, tp).collect()
      closed ++= folded.filter(!_.is_state).map(f => (f.pair, f.timeframe,
        f.trade_no, f.entry_time, f.entry_price, f.exit_time, f.exit_price,
        f.reason, f.pnl))
      state = folded.filter(_.is_state).map(f => (f.pair, f.timeframe, f.open,
          f.entry_time, f.entry_price, f.n_closed, f.last_time)).toSeq
        .toDF("pair", "timeframe", "open", "entry_time", "entry_price",
          "n_closed", "last_time")
    }
    val finalState = state.collect().map(r => (r.getString(0), r.getString(1),
      r.getBoolean(2), r.getTimestamp(3), r.getDouble(4), r.getLong(5)))
    val openTail = finalState.filter(_._3).map(s =>
      (s._1, s._2, s._6 + 1, s._4, s._5,
        None: Option[java.sql.Timestamp], None: Option[Double],
        None: Option[String], None: Option[Double]))
    val got = (closed ++ openTail).sortBy(x => (x._1, x._2, x._3))
    assert(oneShot.nonEmpty && oneShot.exists(_._8.contains("SL"))
      && oneShot.exists(_._8.contains("TP")) && oneShot.exists(_._8.contains("SIG")),
      s"fixture must exercise all three exit reasons: $oneShot")
    assert(got.map(x => (x._1, x._2, x._3, x._4, x._5, x._6, x._7, x._8, x._9))
      === oneShot.map(x => (x._1, x._2, x._3, x._4, x._5, x._6, x._7, x._8, x._9)))
  }

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
