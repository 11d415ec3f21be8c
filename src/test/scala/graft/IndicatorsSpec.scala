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

  test("MACD: ema(fast)-ema(slow), signal seeds over first sig defined values") {
    // fast=2, slow=3, sig=2 over the 10-row series: independently replay
    // the three recurrences here and compare every row
    val out = Indicators.macd(candles, fast = 2, slow = 3, sig = 2).toDF()
      .filter($"pair" === "A").orderBy("time")
      .select("macd", "signal", "hist").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2))))
    var sF = 0.0; var eF = 0.0; var sS = 0.0; var eS = 0.0
    var n = 0; var g = 0.0; var sg = 0.0
    val exp = closes.zipWithIndex.map { case (c, i) =>
      if (i < 1) sF += c else if (i == 1) eF = (sF + c) / 2
      else eF = (c - eF) * (2.0 / 3) + eF
      if (i < 2) sS += c else if (i == 2) eS = (sS + c) / 3
      else eS = (c - eS) * (2.0 / 4) + eS
      val m = if (i >= 2) Some(eF - eS) else None
      val s = m.flatMap { mv =>
        n += 1
        if (n < 2) { g += mv; None }
        else if (n == 2) { sg = (g + mv) / 2; Some(sg) }
        else { sg = (mv - sg) * (2.0 / 3) + sg; Some(sg) }
      }
      (m, s, s.map(m.get - _))
    }
    out.zip(exp).foreach { case ((am, as, ah), (em, es, eh)) =>
      assert(am.map(_.asInstanceOf[Double]) === em)
      assert(as.map(_.asInstanceOf[Double]) === es)
      assert(ah.map(_.asInstanceOf[Double]) === eh)
    }
  }

  test("Bollinger: mid is the SMA, band width is 2 population stddevs") {
    val out = Indicators.bollinger(candles, period = 4).filter($"pair" === "A")
      .orderBy("time").select("mid", "upper", "lower").collect()
    // warm-up rows are null
    assert((0 until 3).forall(i => out(i).isNullAt(0)))
    closes.indices.drop(3).foreach { i =>
      val w = closes.slice(i - 3, i + 1)
      val mean = w.sum / 4
      val sd = math.sqrt(w.map(x => x * x).sum / 4 - mean * mean)
      assert(math.abs(out(i).getDouble(0) - mean) < 1e-9)
      assert(math.abs(out(i).getDouble(1) - (mean + 2 * sd)) < 1e-9)
      assert(math.abs(out(i).getDouble(2) - (mean - 2 * sd)) < 1e-9)
    }
  }
}
