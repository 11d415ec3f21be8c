package graft

import graft.operators.Signals

/** Port of the reference's golden-cross SQL fixture
  * (src/database/sql/test/test_insert_sma_golden_cross.sql:4-28 — see
  * /root/repo/FIXTURES.md §6). */
class SignalsSpec extends SparkSpec {
  import spark.implicits._

  private def smaRow(t: String, period: Int, value: Double) =
    ("USD/JPY", "1m", ts(t), period, "test_v1", value)

  private lazy val sma = Seq(
    smaRow("2024-01-01 10:00:00", 14, 100.0), smaRow("2024-01-01 10:00:00", 28, 105.0),
    smaRow("2024-01-01 11:00:00", 14, 110.0), smaRow("2024-01-01 11:00:00", 28, 106.0),
    smaRow("2024-01-02 10:00:00", 14, 110.0), smaRow("2024-01-02 10:00:00", 28, 100.0),
    smaRow("2024-01-02 11:00:00", 14, 95.0), smaRow("2024-01-02 11:00:00", 28, 101.0))
    .toDF("pair", "timeframe", "time", "period", "calc_version", "value")

  test("golden cross fires exactly once, at the crossing bar") {
    val buys = Signals.goldenCross(sma, 14, 28).collect()
    assert(buys.length === 1)
    val b = buys.head
    assert(b.getAs[java.sql.Timestamp]("event_datetime") === ts("2024-01-01 11:00:00"))
    assert(b.getAs[String]("event_type") === "BUY")
    assert(b.getAs[Double]("price") === 110.0)
    assert(b.getAs[String]("trigger_indicator_name") === "SMA")
    assert(b.getAs[Int]("trigger_indicator_period") === 14)
    assert(b.getAs[String]("trigger_indicator_timeframe") === "1m")
  }

  test("dead cross fires exactly once, no BUY at the dead cross") {
    val sells = Signals.deadCross(sma, 14, 28).collect()
    assert(sells.length === 1)
    assert(sells.head.getAs[java.sql.Timestamp]("event_datetime") === ts("2024-01-02 11:00:00"))
    assert(sells.head.getAs[String]("event_type") === "SELL")
  }

  test("short staying above long yields no signal") {
    val flatAbove = Seq(
      smaRow("2024-01-01 10:00:00", 14, 110.0), smaRow("2024-01-01 10:00:00", 28, 100.0),
      smaRow("2024-01-01 11:00:00", 14, 112.0), smaRow("2024-01-01 11:00:00", 28, 101.0))
      .toDF("pair", "timeframe", "time", "period", "calc_version", "value")
    assert(Signals.strategy(flatAbove, 14, 28).count() === 0)
  }

  test("warm-up NULL values never fire a signal") {
    val withNulls = Seq(
      ("USD/JPY", "1m", ts("2024-01-01 10:00:00"), 14, "v", Some(100.0)),
      ("USD/JPY", "1m", ts("2024-01-01 10:00:00"), 28, "v", None),
      ("USD/JPY", "1m", ts("2024-01-01 11:00:00"), 14, "v", Some(110.0)),
      ("USD/JPY", "1m", ts("2024-01-01 11:00:00"), 28, "v", Some(106.0)))
      .toDF("pair", "timeframe", "time", "period", "calc_version", "value")
    assert(Signals.strategy(withNulls, 14, 28).count() === 0)
  }
}
