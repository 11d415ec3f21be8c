package graft

class ConfigSpec extends SparkSpec {

  test("defaults when env unset (reference: tests/config/test_config.py:21-41)") {
    val c = new Config(Map.empty)
    assert(c.period === 14)
    assert(c.currencyPairCode === "USD/JPY")
    assert(c.timeframeCode === "1m")
    assert(c.periods === Seq(14, 28, 56))
    assert(c.timeframes === Seq("1m", "5m", "30m", "1h", "4h"))
    assert(c.shortPeriod === 14 && c.longPeriod === 28)
  }

  test("env overrides (reference: test_config.py:44-62)") {
    val c = new Config(Map(
      "DEFAULT_PERIOD" -> "21",
      "DEFAULT_CURRENCY_PAIR_CODE" -> "EUR/JPY",
      "DEFAULT_TIMEFRAME_CODE" -> "5m",
      "DEFAULT_PERIODS" -> "7,21,42",
      "DEFAULT_TIMEFRAMES" -> "5m,15m,1h"))
    assert(c.period === 21)
    assert(c.currencyPairCode === "EUR/JPY")
    assert(c.periods === Seq(7, 21, 42))
    assert(c.timeframes === Seq("5m", "15m", "1h"))
  }

  test("invalid values fail fast (reference: test_config.py:65-75)") {
    val e1 = intercept[IllegalArgumentException](new Config(Map("DEFAULT_PERIOD" -> "abc")))
    assert(e1.getMessage.contains("DEFAULT_PERIOD must be an integer"))
    val e2 = intercept[IllegalArgumentException](new Config(Map("DEFAULT_PERIODS" -> "14,,56")))
    assert(e2.getMessage.contains("comma-separated list of integers"))
    val e3 = intercept[IllegalArgumentException](
      new Config(Map("DEFAULT_CURRENCY_PAIR_CODE" -> "  ")))
    assert(e3.getMessage.contains("must not be empty"))
    val e4 = intercept[IllegalArgumentException](
      new Config(Map("DEFAULT_SHORT_PERIOD" -> "28", "DEFAULT_LONG_PERIOD" -> "14")))
    assert(e4.getMessage.contains("must be <"))
  }
}
