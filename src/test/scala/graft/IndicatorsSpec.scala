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

  // six candles with a real high/low range (the SMA/EMA fixture is flat,
  // which would make every %R / Donchian window degenerate)
  private lazy val hlcCandles = {
    val rows = Seq(
      (12.0, 8.0, 10.0, 2L), (13.0, 9.0, 11.0, 3L), (12.0, 8.0, 10.0, 1L),
      (14.0, 10.0, 12.0, 2L), (14.0, 10.0, 12.0, 5L), (13.0, 9.0, 11.0, 2L)
    ).zipWithIndex.map { case ((h, l, c, v), i) =>
      ("A", "1m", ts(f"2024-01-01 00:0$i:00"), c, h, l, c, v)
    }
    rows.toDF("pair", "timeframe", "time", "open", "high", "low", "close", "vol")
  }

  test("Williams %R: -100..0 reflection of stochastic %K, null warm-up") {
    val out = values(Indicators.williamsR(hlcCandles, 3), "A")
    val exp = Seq(None, None, Some(-60.0), Some((14.0 - 12.0) * -100.0 / 6.0),
      Some((14.0 - 12.0) * -100.0 / 6.0), Some(-60.0))
    assertSeries(out, exp)
  }

  test("Donchian channel: trailing max/min/mid, null warm-up") {
    val out = Indicators.donchian(hlcCandles, 3).filter($"pair" === "A")
      .orderBy("time").select("upper", "mid", "lower").collect()
    assert((0 until 2).forall(i => out(i).isNullAt(0) && out(i).isNullAt(1) && out(i).isNullAt(2)))
    val exp = Seq((13.0, 10.5, 8.0), (14.0, 11.0, 8.0), (14.0, 11.0, 8.0), (14.0, 11.5, 9.0))
    exp.zipWithIndex.foreach { case ((u, m, l), i) =>
      assert(out(i + 2).getDouble(0) === u)
      assert(out(i + 2).getDouble(1) === m)
      assert(out(i + 2).getDouble(2) === l)
    }
  }

  test("CCI: deviation against the current window mean, division-free form") {
    // tp = (10, 11, 10, 12, 12, 11); hand-computed with p=3 via
    // p*(p*tp - sum) / (0.015 * sum|p*tp_i - sum|)
    val out = values(Indicators.cci(hlcCandles, 3), "A")
    assertSeries(out, Seq(None, None, Some(-50.0), Some(100.0),
      Some(50.0), Some(-100.0)))
  }

  test("Keltner: EMA midline, bands at 2x ATR, null until BOTH folds warm") {
    val out = Indicators.keltner(hlcCandles, emaPeriod = 3, atrPeriod = 2)
      .filter($"pair" === "A").orderBy("time")
      .select("mid", "upper", "lower").collect()
    assert((0 until 2).forall(i => out(i).isNullAt(0) && out(i).isNullAt(1)))
    // rows 3-4: tr is constant 4 => atr = 4, so the band is mid ± 8
    val mid3 = 31.0 / 3.0
    assert(math.abs(out(2).getDouble(0) - mid3) < 1e-12)
    assert(math.abs(out(2).getDouble(1) - (mid3 + 8.0)) < 1e-12)
    assert(math.abs(out(2).getDouble(2) - (mid3 - 8.0)) < 1e-12)
    val mid4 = (12.0 - mid3) * 0.5 + mid3
    assert(math.abs(out(3).getDouble(1) - (mid4 + 8.0)) < 1e-12)
  }

  test("Parabolic SAR: ratchet, two-bar clamp, and a hand-traced trend flip") {
    val rows = Seq(
      (10.0, 9.0, 9.5), (11.0, 10.0, 10.5), (12.0, 10.5, 11.5),
      (9.2, 8.8, 9.0), (9.0, 8.5, 8.7)
    ).zipWithIndex.map { case ((h, l, c), i) =>
      ("A", "1m", ts(f"2024-01-01 00:0$i:00"), c, h, l, c)
    }.toDF("pair", "timeframe", "time", "open", "high", "low", "close")
    val out = Indicators.sar(rows).orderBy("time")
      .select("value").collect().map(_.getDouble(0))
    // bar2: initial sar = bar1 low 9.0; bar3: 9 + 0.02*(11-9) = 9.04 but
    // the up-clamp holds the stop at min(9.04, low1=9, low2=10) = 9.0
    // (ep ratchets to 12, af to 0.04); bar4: stop 9 + 0.04*(12-9) = 9.12,
    // low 8.8 crosses it -> FLIP, sar = prior EP 12; bar5:
    // 12 + 0.02*(8.8-12) = 11.936 clamps back UP to prior high 12
    assert(out.length === 4)
    assert(out(0) === 9.0)
    assert(out(1) === 9.0)
    assert(out(2) === 12.0)
    assert(out(3) === 12.0)
  }

  test("SuperTrend: band ratchets and flips, hand-traced both directions") {
    val rows = Seq(
      (10.5, 9.5, 10.0), (11.5, 10.5, 11.0), (12.5, 11.5, 12.0),
      (13.5, 12.5, 13.0), (14.5, 13.5, 14.0), (6.0, 4.0, 5.0)
    ).zipWithIndex.map { case ((h, l, c), i) =>
      ("A", "1m", ts(f"2024-01-01 00:0$i:00"), c, h, l, c)
    }.toDF("pair", "timeframe", "time", "open", "high", "low", "close")
    val out = Indicators.supertrend(rows, period = 2, mult = 1.0)
      .orderBy("time").select("value", "dir_up").collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0)) // warm-up
    // init bar: close 12 <= ub 13.5 -> down, line = fub; flb ratchets up
    // under the rally until close 14 breaks fub 13.5 -> UP, line = flb
    // 12.5; the crash bar drops fub to 10.75 and close 5 < flb -> DOWN
    val exp = Seq((13.5, false), (13.5, false), (12.5, true), (10.75, false))
    exp.zipWithIndex.foreach { case ((v, dir), i) =>
      assert(out(i + 2).getDouble(0) === v, s"bar ${i + 3} line")
      assert(out(i + 2).getBoolean(1) === dir, s"bar ${i + 3} dir")
    }
  }

  test("Heikin-Ashi: haOpen recurrence, extremes span raw and HA values") {
    val rows = Seq((10.0, 12.0, 9.0, 11.0), (11.0, 13.0, 10.0, 12.0))
      .zipWithIndex.map { case ((o, h, l, c), i) =>
        ("A", "1m", ts(f"2024-01-01 00:0$i:00"), o, h, l, c)
      }.toDF("pair", "timeframe", "time", "open", "high", "low", "close")
    val out = Indicators.heikinAshi(rows).orderBy("time")
      .select("ha_open", "ha_high", "ha_low", "ha_close").collect()
    assert(out(0).getDouble(0) === 10.5 && out(0).getDouble(3) === 10.5)
    assert(out(0).getDouble(1) === 12.0 && out(0).getDouble(2) === 9.0)
    // bar2: haOpen = (10.5 + 10.5)/2; haClose = (11+13+10+12)/4
    assert(out(1).getDouble(0) === 10.5 && out(1).getDouble(3) === 11.5)
    assert(out(1).getDouble(1) === 13.0 && out(1).getDouble(2) === 10.0)
  }

  test("candle patterns: doji, hammer, and a bullish engulfing sequence") {
    val rows = Seq(
      (10.0, 11.0, 9.0, 10.05),    // doji: body .05 <= 10% of range 2
      (10.5, 10.65, 9.5, 10.6),    // hammer: long lower shadow, tiny upper
      (11.0, 11.1, 10.4, 10.5),    // bearish bar setting up the engulfing
      (10.4, 11.3, 10.3, 11.2)     // bullish body swallowing the prior one
    ).zipWithIndex.map { case ((o, h, l, c), i) =>
      ("A", "1m", ts(f"2024-01-01 00:0$i:00"), o, h, l, c)
    }.toDF("pair", "timeframe", "time", "open", "high", "low", "close")
    val out = Indicators.candlePatterns(rows).orderBy("time").collect()
    val byTime = out.map(r => r.getTimestamp(2).toString.substring(14, 16) ->
      (r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))).toMap
    assert(byTime("00")._1, "bar1 must flag doji")
    assert(byTime("01")._2, "bar2 must flag hammer")
    assert(byTime("03")._3, "bar4 must flag bull_engulf")
    assert(!byTime.contains("02") || !byTime("02")._3)
  }

  test("ROC: 100*(close/lag - 1), null until the lag exists") {
    val out = values(Indicators.roc(hlcCandles, 2), "A")
    val exp = Seq(None, None, Some(0.0), Some((12.0 / 11.0 - 1.0) * 100.0),
      Some(20.0), Some((11.0 / 12.0 - 1.0) * 100.0))
    assertSeries(out, exp)
  }

  test("MFI: volume-weighted flow ratio; equal typical price feeds neither side") {
    val out = values(Indicators.mfi(hlcCandles, 3), "A")
    // tp3: 30,33,30,36,36,33; flows: +99,-30,+72,(equal->none),-66
    val exp = Seq(None, None, None, Some(100.0 * 171.0 / 201.0),
      Some(100.0 * 72.0 / 102.0), Some(100.0 * 72.0 / 138.0))
    assertSeries(out, exp)
  }

  test("MFI of a monotone series has no negative flow: value is 100") {
    val up = (0 until 6).map(i => ("A", "1m", ts(f"2024-01-01 00:0$i:00"),
      10.0 + i, 12.0 + i, 8.0 + i, 10.0 + i, 1L))
      .toDF("pair", "timeframe", "time", "open", "high", "low", "close", "vol")
    val out = values(Indicators.mfi(up, 3), "A")
    assert(out.take(3).forall(_.isEmpty))
    assert(out.drop(3).forall(_.contains(100.0)))
  }

  test("ADX: Wilder-smoothed directional movement, double-seeded warm-up") {
    // period=2 over the 6-row hlc fixture: DI defined from row 3 (rn p+1),
    // ADX from row 4 (rn 2p). Replay the fold independently row by row.
    val highs = Seq(12.0, 13.0, 12.0, 14.0, 14.0, 13.0)
    val lows = Seq(8.0, 9.0, 8.0, 10.0, 10.0, 9.0)
    val closes6 = Seq(10.0, 11.0, 10.0, 12.0, 12.0, 11.0)
    val p = 2
    var ph = 0.0; var pl = 0.0; var pc = 0.0
    var trS = 0.0; var pdmS = 0.0; var ndmS = 0.0
    var sTr = 0.0; var sPdm = 0.0; var sNdm = 0.0
    var dxS = 0.0; var adxV = 0.0
    val exp = highs.indices.map { i =>
      val out = if (i == 0) (None, None, None)
      else {
        val tr = math.max(highs(i) - lows(i),
          math.max(math.abs(highs(i) - pc), math.abs(lows(i) - pc)))
        val up = highs(i) - ph; val dn = pl - lows(i)
        val pdm = if (up > dn && up > 0) up else 0.0
        val ndm = if (dn > up && dn > 0) dn else 0.0
        if (i < p) { trS += tr; pdmS += pdm; ndmS += ndm }
        else if (i == p) { sTr = (trS + tr) / p; sPdm = (pdmS + pdm) / p; sNdm = (ndmS + ndm) / p }
        else { sTr = (sTr * (p - 1) + tr) / p; sPdm = (sPdm * (p - 1) + pdm) / p; sNdm = (sNdm * (p - 1) + ndm) / p }
        if (i < p) (None, None, None)
        else {
          val pdi = if (sTr == 0) 0.0 else 100.0 * sPdm / sTr
          val ndi = if (sTr == 0) 0.0 else 100.0 * sNdm / sTr
          val dx = if (pdi + ndi == 0) 0.0 else 100.0 * math.abs(pdi - ndi) / (pdi + ndi)
          val a = if (i < 2 * p - 1) { dxS += dx; None }
          else if (i == 2 * p - 1) { adxV = (dxS + dx) / p; Some(adxV) }
          else { adxV = (adxV * (p - 1) + dx) / p; Some(adxV) }
          (Some(pdi), Some(ndi), a)
        }
      }
      ph = highs(i); pl = lows(i); pc = closes6(i)
      out
    }
    val got = Indicators.adx(hlcCandles, p).toDF().filter($"pair" === "A")
      .orderBy("time").select("pdi", "ndi", "adx").collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Double]),
        Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    got.zip(exp).zipWithIndex.foreach { case (((gp, gn, ga), (ep, en, ea)), i) =>
      assert(gp === ep, s"pdi idx $i"); assert(gn === en, s"ndi idx $i")
      assert(ga === ea, s"adx idx $i")
    }
    // sanity: the fixture trends up then down — +DI exceeded -DI at the peak
    assert(got(3)._1.get > got(3)._2.get)
  }

  test("Ichimoku: range midpoints with forward/backward displacement") {
    val out = Indicators.ichimoku(hlcCandles, tenkanP = 2, kijunP = 3, senkouP = 4)
      .filter($"pair" === "A").orderBy("time")
      .select("tenkan", "kijun", "senkou_a", "senkou_b", "chikou").collect()
    def d(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    // tenkan (p=2): mid of trailing-2 range
    assert(d(out(0), 0) === None)
    assert(d(out(1), 0) === Some((13.0 + 8.0) / 2))
    assert(d(out(5), 0) === Some((14.0 + 9.0) / 2))
    // kijun (p=3) from row 3
    assert(d(out(1), 1) === None)
    assert(d(out(2), 1) === Some((13.0 + 8.0) / 2))
    // senkou_a = lag((tenkan+kijun)/2, 3): first defined at row 6 (source row 3)
    assert(d(out(4), 2) === None)
    assert(d(out(5), 2) === Some(((13.0 + 8.0) / 2 + (13.0 + 8.0) / 2) / 2))
    // senkou_b = lag(mid4, 3): source row 4 lands on... row 7 (beyond fixture)
    assert(out.forall(_.isNullAt(3)))
    // chikou = lead(close, 3)
    assert(d(out(0), 4) === Some(12.0))
    assert(d(out(2), 4) === Some(11.0))
    assert(d(out(3), 4) === None)
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

  // degenerate candles (high = low = close) with the given close series
  private def flatCandles(cs: Seq[Double]): org.apache.spark.sql.DataFrame =
    cs.zipWithIndex.map { case (c, i) =>
      ("A", "1m", ts(f"2024-01-01 00:$i%02d:00"), c, c, c, c)
    }.toDF("pair", "timeframe", "time", "open", "high", "low", "close")

  test("TRIX: warm-up ends at 3p-2 for e3, 3p-1 for TRIX; constant series is 0") {
    val out = values(Indicators.trix(flatCandles(Seq.fill(10)(5.0)), 3).toDF(), "A")
    // p=3: e1@3, e2@5, e3@7, trix@8 (1-indexed) — so indices 0..6 are null
    assert(out.take(7).forall(_.isEmpty), s"warm-up violated: $out")
    assert(out.drop(7).forall(v => v.isDefined && math.abs(v.get) < 1e-12),
      s"flat series TRIX nonzero: $out")
  }

  test("TRIX sign tracks the triple-EMA trend direction") {
    val up = values(Indicators.trix(flatCandles((1 to 12).map(_.toDouble)), 3).toDF(), "A")
    assert(up.flatten.nonEmpty && up.flatten.forall(_ > 0), s"ramp TRIX not positive: $up")
  }

  test("KAMA: flat series pins to the close; ramp stays between prev KAMA and close") {
    val flat = values(Indicators.kama(flatCandles(Seq.fill(8)(5.0)), 3).toDF(), "A")
    assert(flat.take(3).forall(_.isEmpty))
    assert(flat.drop(3).forall(v => v.contains(5.0)), s"flat KAMA drifted: $flat")

    val cs = (10 to 18).map(_.toDouble)
    val ramp = values(Indicators.kama(flatCandles(cs), 3).toDF(), "A")
    assert(ramp.take(3).forall(_.isEmpty))
    // er = 1 on a monotone ramp → sc ≈ (2/3)²; seeded at the prior close
    var prev = cs(2) // close[p-1]
    ramp.zipWithIndex.drop(3).foreach { case (v, i) =>
      assert(v.isDefined && v.get > prev && v.get < cs(i),
        s"idx $i: ${v} not in (prev=$prev, close=${cs(i)})")
      prev = v.get
    }
  }

  test("Vortex: constructed ±1 ranges give exactly VI+ = 1.5, VI− = 0.5") {
    val rows = (0 until 8).map { i =>
      val c = 10.0 + i
      ("A", "1m", ts(f"2024-01-01 00:$i%02d:00"), c, c + 1, c - 1, c)
    }.toDF("pair", "timeframe", "time", "open", "high", "low", "close")
    val out = Indicators.vortex(rows, period = 3).filter($"pair" === "A")
      .orderBy("time").select("vi_plus", "vi_minus").collect()
    // defined from rn = p+1 = 4
    assert((0 until 3).forall(i => out(i).isNullAt(0)))
    (3 until 8).foreach { i =>
      assert(out(i).getDouble(0) === 1.5, s"row $i vi+: ${out(i)}")
      assert(out(i).getDouble(1) === 0.5, s"row $i vi-: ${out(i)}")
    }
  }

  test("DEMA/TEMA: flat series pins to the close from rows 2p-1 / 3p-2") {
    val flat = flatCandles(Seq.fill(10)(5.0))
    val dema = values(Indicators.dema(flat, 3).toDF(), "A")
    assert(dema.take(4).forall(_.isEmpty) && dema.drop(4).forall(_.contains(5.0)),
      s"DEMA: $dema") // defined from row 2p-1 = 5 (index 4)
    val tema = values(Indicators.tema(flat, 3).toDF(), "A")
    assert(tema.take(6).forall(_.isEmpty) && tema.drop(6).forall(_.contains(5.0)),
      s"TEMA: $tema") // defined from row 3p-2 = 7 (index 6)
  }

  test("linreg: an exact line recovers slope and next-point forecast exactly") {
    // close_i = 2 + 3i — integer-valued sums, so slope/forecast are exact
    val cs = (1 to 8).map(i => 2.0 + 3.0 * i)
    val out = Indicators.linreg(flatCandles(cs), period = 4)
      .filter($"pair" === "A").orderBy("time")
      .select("slope", "forecast").collect()
    assert((0 until 3).forall(i => out(i).isNullAt(0)))
    (3 until 8).foreach { i =>
      assert(out(i).getDouble(0) === 3.0, s"row $i slope: ${out(i)}")
      // forecast = the line's value at the NEXT row (x = i+2 in 1-based i+1)
      assert(out(i).getDouble(1) === 2.0 + 3.0 * (i + 2), s"row $i forecast: ${out(i)}")
    }
  }

  test("Renko: hand-traced bricks — burst up, dead zone, reversal, burst up") {
    val closes = Seq(10.0, 26.0, 24.0, 9.9, 41.0)
    val out = Indicators.renko(flatCandles(closes), brick = 5.0)
      .filter($"pair" === "A").orderBy("brick_no")
      .collect().map(b => (b.brick_no, b.dir, b.open, b.close)).toSeq
    val expected = Seq(
      (1L, "up", 10.0, 15.0), (2L, "up", 15.0, 20.0), (3L, "up", 20.0, 25.0),
      // 24.0 is inside the band: nothing
      (4L, "down", 25.0, 20.0), (5L, "down", 20.0, 15.0), (6L, "down", 15.0, 10.0),
      (7L, "up", 10.0, 15.0), (8L, "up", 15.0, 20.0), (9L, "up", 20.0, 25.0),
      (10L, "up", 25.0, 30.0), (11L, "up", 30.0, 35.0), (12L, "up", 35.0, 40.0))
    assert(out === expected, s"got: $out")
  }

  test("Ultimate Oscillator: degenerate +1 ramp gives exactly 100; flat is null") {
    val up = values(
      Indicators.ultimateOscillator(flatCandles((1 to 32).map(_.toDouble)),
        p1 = 3, p2 = 5, p3 = 7).withColumnRenamed("value", "value"), "A")
    // defined from rn = p3+1 = 8; bp = tr = 1 every bar → all ratios 1
    assert(up.take(7).forall(_.isEmpty))
    assert(up.drop(7).forall(_.contains(100.0)), s"ramp UO != 100: $up")

    val flat = values(
      Indicators.ultimateOscillator(flatCandles(Seq.fill(10)(5.0)), 3, 5, 7), "A")
    assert(flat.forall(_.isEmpty), s"flat UO should be null (0/0 guard): $flat")
  }

  private def hlcCandles(rows: Seq[(Double, Double, Double)]): org.apache.spark.sql.DataFrame =
    rows.zipWithIndex.map { case ((h, l, c), i) =>
      ("A", "1m", ts(f"2024-01-01 00:$i%02d:00"), c, h, l, c)
    }.toDF("pair", "timeframe", "time", "open", "high", "low", "close")

  private def volCandles(rows: Seq[(Double, Double, Double, Long)]): org.apache.spark.sql.DataFrame =
    rows.zipWithIndex.map { case ((h, l, c, v), i) =>
      ("A", "1m", ts(f"2024-01-01 00:$i%02d:00"), c, h, l, c, v)
    }.toDF("pair", "timeframe", "time", "open", "high", "low", "close", "vol")

  test("Awesome Oscillator: warm-up ends at slow; values match naive means") {
    val cs = (1 to 12).map(_.toDouble)
    val out = values(Indicators.awesome(flatCandles(cs), fast = 2, slow = 5), "A")
    assert(out.take(4).forall(_.isEmpty))
    (4 until 12).foreach { i =>
      val mp = cs // high=low=close → midpoint = close
      val exp = mp.slice(i - 1, i + 1).sum / 2 - mp.slice(i - 4, i + 1).sum / 5
      assert(math.abs(out(i).get - exp) < 1e-9, s"idx $i: ${out(i)} vs $exp")
    }
  }

  test("CMF: all-range-top closes with equal volume give 1.0; flat bar contributes 0") {
    // close at the high → mfm = +1 per bar, so CMF = Σvol/Σvol = 1
    val top = Seq.fill(6)((10.0, 8.0, 10.0, 3L))
    val out = values(Indicators.cmf(volCandles(top), period = 4), "A")
    assert(out.take(3).forall(_.isEmpty))
    assert(out.drop(3).forall(_.contains(1.0)), s"CMF at range top: $out")

    // a flat bar (high == low) adds 0 to the numerator but its vol counts
    val mixed = Seq((10.0, 8.0, 10.0, 3L), (5.0, 5.0, 5.0, 3L),
      (10.0, 8.0, 10.0, 3L), (10.0, 8.0, 10.0, 3L))
    val m = values(Indicators.cmf(volCandles(mixed), period = 4), "A")
    assert(math.abs(m(3).get - 0.75) < 1e-9, s"flat-bar dilution: $m")
  }

  test("A/D line: running sum of mfm·vol, exact") {
    // mfm = ((c−l)−(h−c))/(h−l): bar1 +1·2=2, bar2 −1·3=−3, bar3 0 (flat), bar4 +1·5=5
    val rows = Seq((10.0, 8.0, 10.0, 2L), (10.0, 8.0, 8.0, 3L),
      (5.0, 5.0, 5.0, 7L), (10.0, 8.0, 10.0, 5L))
    val out = Indicators.adLine(volCandles(rows))
      .filter($"pair" === "A").orderBy("time").select("ad").collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(2.0, -1.0, -1.0, 4.0), s"got ${out.toSeq}")
  }

  test("Force index: EMA(p) of (Δclose·vol), defined from row p+1") {
    val rows = Seq((0.0, 0.0, 10.0, 1L), (0.0, 0.0, 12.0, 2L), // fi=4
      (0.0, 0.0, 11.0, 3L), // fi=-3
      (0.0, 0.0, 14.0, 1L), // fi=3; seed at p=3 → (4-3+3)/3
      (0.0, 0.0, 15.0, 2L)) // fi=2 → rec
    val out = values(Indicators.forceIndex(volCandles(rows), period = 3).toDF(), "A")
    assert(out.take(3).forall(_.isEmpty))
    val seed = (4.0 - 3.0 + 3.0) / 3
    assert(math.abs(out(3).get - seed) < 1e-12)
    assert(math.abs(out(4).get - ((2.0 - seed) * 0.5 + seed)) < 1e-12, s"got $out")
  }

  test("Chaikin oscillator: warm-up ends at slow; flat-volume range-top series is 0") {
    // flat bars → mfm 0 → ad constant 0 → both EMAs 0 → chaikin 0 after
    // the slow warm-up
    val flat = (0 until 12).map(i => (5.0, 5.0, 5.0, 2L))
    val out = values(Indicators.chaikin(volCandles(flat), fast = 3, slow = 5).toDF(), "A")
    assert(out.take(4).forall(_.isEmpty), s"warm-up: $out")
    assert(out.drop(4).forall(_.contains(0.0)), s"flat chaikin: $out")
  }

  test("Hull MA: matches the brute-force nested WMA on a random walk") {
    def wma(xs: Seq[Double], p: Int): Seq[Option[Double]] =
      xs.indices.map { i =>
        if (i < p - 1) None
        else Some(xs.slice(i - p + 1, i + 1).zipWithIndex
          .map { case (x, j) => (j + 1) * x }.sum / (p * (p + 1) / 2))
      }
    val rnd = new scala.util.Random(7)
    val cs = Seq.iterate(100.0, 20)(c => c + (rnd.nextInt(200) - 100) / 100.0)
    val p = 9; val half = 4; val sq = 3
    val y = wma(cs, half).zip(wma(cs, p)).map {
      case (Some(a), Some(b)) => Some(2 * a - b); case _ => None
    }
    // brute-force outer WMA over the defined ys
    val defined = y.flatten
    val hma = wma(defined, sq)
    val out = values(Indicators.hullMa(flatCandles(cs), p), "A")
    assert(out.take(p + sq - 2).forall(_.isEmpty))
    out.drop(p + sq - 2).zip(hma.drop(sq - 1)).zipWithIndex.foreach {
      case ((Some(g), Some(e)), i) => assert(math.abs(g - e) < 1e-6, s"idx $i: $g vs $e")
      case (pair, i) => fail(s"idx $i: $pair")
    }
  }

  test("Coppock: constant series → ROC 0 → value 0 after warm-up") {
    val out = values(Indicators.coppock(flatCandles(Seq.fill(30)(7.0)),
      longP = 5, shortP = 3, wmaP = 4), "A")
    assert(out.take(8).forall(_.isEmpty), s"warm-up: $out") // long+wma−1 = 8
    assert(out.drop(8).forall(_.contains(0.0)), s"flat coppock: $out")
  }

  test("Fractals: strict local extremes with full wings only; ties never qualify") {
    val rows = Seq(
      (5.0, 1.0), (6.0, 2.0), (9.0, 0.5), (6.0, 2.0), (5.0, 1.0), // up@2, down@2
      (7.0, 3.0), (7.0, 3.0), (8.0, 1.5), (7.0, 2.0))
    val df = hlcCandles(rows.map { case (h, l) => (h, l, (h + l) / 2) })
    val out = Indicators.fractals(df, wing = 2)
      .filter($"pair" === "A").orderBy("time")
      .select("time", "up_fractal", "down_fractal").collect()
    // bar 2 (9.0 high, 0.5 low) is both an up and a down fractal;
    // bar 7's 8.0 high has a 9.0? no — neighbors 7,7 left and 7 right, but
    // only one right wing bar exists at index 7? it has leads 8th only → edge
    assert(out.length === 1, s"got ${out.toSeq}")
    assert(out(0).getBoolean(1) && out(0).getBoolean(2))
  }
}
