package graft

import graft.operators.{Backtest, Relay, Signals}
import org.apache.spark.sql.functions._

class RelaySpec extends SparkSpec {
  import spark.implicits._

  private lazy val ticks = Seq(
    ("USD/JPY", ts("2024-01-01 00:00:01"), 151.245, 151.249),
    ("USD/JPY", ts("2024-01-01 00:00:02"), 151.250, 151.254),
    ("EUR/JPY", ts("2024-01-01 00:00:01"), 161.000, 161.004))
    .toDF("pair", "time", "bid", "ask")

  test("latestPerPair returns the newest row per pair") {
    val latest = Relay.latestPerPair(ticks).orderBy("pair").collect()
    assert(latest.length === 2)
    assert(latest(1).getAs[Double]("bid") === 151.250)
    assert(latest(0).getAs[java.sql.Timestamp]("time") === ts("2024-01-01 00:00:01"))
  }

  test("afterCursor returns strictly-later rows") {
    val out = Relay.afterCursor(ticks, ts("2024-01-01 00:00:01"))
    assert(out.count() === 1)
    assert(out.first().getAs[Double]("bid") === 151.250)
  }

  test("toMessages emits the ws ticker wire format (spec §28-51)") {
    val msg = Relay.toMessages(ticks.limit(1)).first().getAs[String]("message")
    assert(msg === """{"type":"ticker","symbol":"USD/JPY","bid":151.245,"ask":151.249,"mid":151.247,"timestamp":"2024-01-01T00:00:01.000Z"}""")
  }

  test("backtest folds BUY/SELL alternation into PnL") {
    val signals = Seq(
      ("X", ts("2024-01-01 10:00:00"), "BUY", 100.0),
      ("X", ts("2024-01-01 11:00:00"), "BUY", 105.0), // ignored: already long
      ("X", ts("2024-01-01 12:00:00"), "SELL", 110.0), // +10
      ("X", ts("2024-01-01 13:00:00"), "SELL", 120.0), // ignored: flat
      ("X", ts("2024-01-01 14:00:00"), "BUY", 115.0), // left open
      ("Y", ts("2024-01-01 10:00:00"), "SELL", 50.0)) // flat: ignored
      .toDF("pair", "event_datetime", "event_type", "price")
    val res = Backtest.run(signals).collect().map(r => r.pair -> r).toMap
    assert(res("X").trades === 1)
    assert(res("X").total_pnl === 10.0)
    assert(res("X").open_position === true)
    assert(res("Y").trades === 0)
    assert(res("Y").open_position === false)
  }

  test("trade ledger: per-trade rows reconcile with the per-pair totals") {
    val signals = Seq(
      ("X", ts("2024-01-01 10:00:00"), "BUY", 100.0),
      ("X", ts("2024-01-01 11:00:00"), "BUY", 105.0), // ignored: already long
      ("X", ts("2024-01-01 12:00:00"), "SELL", 110.0), // trade 1: +10
      ("X", ts("2024-01-01 13:00:00"), "SELL", 120.0), // ignored: flat
      ("X", ts("2024-01-01 14:00:00"), "BUY", 115.0), // trade 2: open
      ("Y", ts("2024-01-01 10:00:00"), "SELL", 50.0)) // flat: ignored
      .toDF("pair", "event_datetime", "event_type", "price")
    val ledger = Backtest.trades(signals).collect().sortBy(t => (t.pair, t.trade_no))
    assert(ledger.map(t => (t.pair, t.trade_no, t.entry_price, t.exit_price, t.pnl)).toSeq
      === Seq(
        ("X", 1, 100.0, Some(110.0), Some(10.0)),
        ("X", 2, 115.0, None, None)))
    assert(ledger(0).entry_time === ts("2024-01-01 10:00:00"))
    assert(ledger(0).exit_time === Some(ts("2024-01-01 12:00:00")))
    // reconciliation with run(): closed count, Σpnl, open flag
    val totals = Backtest.run(signals).collect().map(r => r.pair -> r).toMap
    val closed = ledger.filter(_.pnl.isDefined)
    assert(closed.length === totals("X").trades)
    assert(closed.flatMap(_.pnl).sum === totals("X").total_pnl)
    assert(ledger.exists(_.exit_time.isEmpty) === totals("X").open_position)
  }
}
