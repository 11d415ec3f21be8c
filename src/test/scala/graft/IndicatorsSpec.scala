package graft

import graft.operators.Indicators

class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  // closes [10,11,12,11,13,14,13,15,16,15], period 4 — golden vectors computed
  // independently from the TA-Lib formulas (SMA seed EMA, Wilder RSI).
  private val closes = Seq(10.0, 11.0, 12.0, 11.0, 13.0, 14.0, 13.0, 15.0, 16.0, 15.0)
  private val expSma = Seq(None, None, None, Some(11.0), Some(11.75), Some(12.5),
    Some(12.75), Some(13.75), Some(14.5), Some(14.75))
  private val expEma = Seq(None, None, None, Some(11.0), Some(11.8), Some(12.68),
    Some(12.808), Some(13.6848), Some(14.61088), Some(14.766528))
  private val expRsi = Seq(None, None, None, None, Some(80.0), Some(84.21052631578948),
    Some(65.75342465753425), Some(78.38616714697406), Some(82.65227447956823),
    Some(65.4323499491353))

  // two pairs with identical series — verifies per-group isolation of the fold
  private lazy val candles = {
    val rows = for {
      pair <- Seq("A", "B")
      (c, i) <- closes.zipWithIndex
    } yield (pair, "1m", ts(f"2024-01-01 00:$i%02d:00"), c, c, c, c)
    rows.toDF("pair", "timeframe", "time", "open", "high", "low", "close")
  }

  private def values(df: org.apache.spark.sql.DataFrame, pair: String): Seq[Option[Double]] =
    df.filter($"pair" === pair).orderBy("time")
      .select("value").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq

  private def assertSeries(got: Seq[Option[Double]], exp: Seq[Option[Double]]): Unit = {
    assert(got.length === exp.length)
    got.zip(exp).zipWithIndex.foreach {
      case ((Some(g), Some(e)), i) => assert(math.abs(g - e) < 1e-9, s"idx $i: $g vs $e")
      case ((g, e), i) => assert(g === e, s"idx $i: $g vs $e")
    }
  }

  test("SMA matches golden vector, null warm-up, both groups") {
    val out = Indicators.sma(candles, 4)
    assertSeries(values(out, "A"), expSma)
    assertSeries(values(out, "B"), expSma)
  }

  test("EMA matches TA-Lib golden vector (SMA seed)") {
    val out = Indicators.ema(candles, 4).toDF()
    assertSeries(values(out, "A"), expEma)
    assertSeries(values(out, "B"), expEma)
  }

  test("RSI matches Wilder golden vector") {
    val out = Indicators.rsi(candles, 4).toDF()
    assertSeries(values(out, "A"), expRsi)
    assertSeries(values(out, "B"), expRsi)
  }

  test("RSI of a constant series is 0 after warm-up (0/0 guard)") {
    val flat = (0 until 8).map(i => ("A", "1m", ts(f"2024-01-01 00:0$i:00"), 5.0, 5.0, 5.0, 5.0))
      .toDF("pair", "timeframe", "time", "open", "high", "low", "close")
    val out = values(Indicators.rsi(flat, 3).toDF(), "A")
    assert(out.take(3).forall(_.isEmpty))
    assert(out.drop(3).forall(_.contains(0.0)))
  }

  test("indicatorFacts unions indicators x periods") {
    val out = Indicators.indicatorFacts(candles, Seq("SMA", "EMA", "RSI"), Seq(4, 6))
    assert(out.count() === 2L * 3 * 2 * closes.length)
    assert(out.select("indicator").distinct().count() === 3)
  }
}
