package graft

import graft.operators.Indicators
import org.apache.spark.sql.functions._

/** U42 TSI / U43 KST — closed-form series where the indicator value is
  * known independently of the implementation:
  *
  *  - an ARITHMETIC ramp has constant momentum m, so both TSI chains see
  *    constant inputs (mom and |mom| identical for m > 0) and every EMA
  *    equals its input → TSI ≡ 100 from its first defined row (−100 on a
  *    falling ramp);
  *  - a GEOMETRIC series close = c·rⁿ has constant ROC(n) = 100·(rⁿ−1),
  *    so every smoothed ROC is that constant and KST is the weighted sum.
  */
class MomentumIndicatorsSpec extends SparkSpec {
  import spark.implicits._

  private def candles(closes: Seq[Double], pair: String = "A") =
    closes.zipWithIndex.map { case (c, i) =>
      (pair, "1m", ts(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"), c, c, c, c)
    }.toDF("pair", "timeframe", "time", "open", "high", "low", "close")

  test("TSI is exactly +100 on a rising ramp, -100 on a falling one, from rn=slow+fast") {
    val up = (1 to 12).map(i => 10.0 + i * 0.5)
    val r = Indicators.tsi(candles(up), slow = 3, fast = 2).toDF()
      .orderBy("time").select("value").as[Option[Double]].collect()
    assert(r.take(4).forall(_.isEmpty))            // rn 1..4 warm
    assert(r.drop(4).forall(_.contains(100.0)))    // defined from rn = 3+2
    val down = (1 to 12).map(i => 20.0 - i * 0.5)
    val d = Indicators.tsi(candles(down), slow = 3, fast = 2).toDF()
      .orderBy("time").select("value").as[Option[Double]].collect()
    assert(d.drop(4).forall(_.contains(-100.0)))
  }

  test("TSI on a flat series stays null (|mom| chain is 0: the guard keeps it total)") {
    val r = Indicators.tsi(candles(Seq.fill(10)(7.0)), slow = 3, fast = 2).toDF()
      .select("value").as[Option[Double]].collect()
    assert(r.forall(_.isEmpty))
  }

  test("TSI folds are isolated per series key") {
    val two = candles((1 to 12).map(i => 10.0 + i * 0.5), "A")
      .unionByName(candles((1 to 12).map(i => 20.0 - i * 0.5), "B"))
    val r = Indicators.tsi(two, slow = 3, fast = 2).toDF()
      .groupBy("pair").agg(max(abs(col("value"))).as("m"), min(col("value")).as("lo"))
      .orderBy("pair").collect()
    assert(r(0).getDouble(1) === 100.0 && r(1).getDouble(2) === -100.0)
  }

  test("KST equals the weighted constant-ROC sum on a geometric series") {
    // close = 100 · 1.01^i → ROC(n) = 100·(1.01^n − 1), constant per n
    val closes = (0 until 60).map(i => 100.0 * math.pow(1.01, i))
    val rocs = Seq(10, 15, 20, 30); val smas = Seq(10, 10, 10, 15)
    val r = Indicators.kst(candles(closes), rocs, smas)
      .orderBy("time").select("value").as[Option[Double]].collect()
    assert(r.take(44).forall(_.isEmpty))           // defined from rn = 30+15
    // independent expectation: each ROC snaps to the 6-dp grid, the SMA of
    // a constant is that constant (HALF_UP mean of d equal micro values is
    // exact), and the weighted sum is integer micro arithmetic
    val micro = rocs.map(n => math.round(100.0 * (math.pow(1.01, n) - 1) * 1e6))
    val expect = micro.zipWithIndex.map { case (m, i) => (i + 1) * m }.sum / 1e6
    r.drop(44).foreach(v => assert(math.abs(v.get - expect) < 2e-6,
      s"got ${v.get}, want ~$expect"))
  }

  test("StochRSI: 100 at a window-max RSI, 0 at a window-min, null on a flat window") {
    // rising ramp → RSI ≡ 100 → flat stoch window → null everywhere
    val ramp = (1 to 20).map(i => 10.0 + i)
    val flat = Indicators.stochRsi(candles(ramp), period = 3, stoch = 3)
      .select("value").as[Option[Double]].collect()
    assert(flat.forall(_.isEmpty))
    // up-up-down sawtooth: RSI alternates; the extremes hit 100/0 exactly
    val saw = Seq(10.0, 11.0, 12.0, 11.0, 13.0, 12.0, 14.0, 13.0, 15.0, 14.0)
    val r = Indicators.stochRsi(candles(saw), period = 3, stoch = 3)
      .orderBy("time").select("value").as[Option[Double]].collect()
    val defined = r.flatten
    assert(defined.nonEmpty && defined.forall(v => v >= 0.0 && v <= 100.0))
    assert(defined.contains(100.0) || defined.contains(0.0))
  }

  test("PPO is exactly 0 on a constant series from rn=slow") {
    val r = Indicators.ppo(candles(Seq.fill(12)(5.0)), fast = 3, slow = 5).toDF()
      .orderBy("time").select("value").as[Option[Double]].collect()
    assert(r.take(4).forall(_.isEmpty) && r.drop(4).forall(_.contains(0.0)))
  }

  test("VHF on a monotone ramp is (n-1)/n: range covers n-1 of the frame's n unit steps") {
    val ramp = (1 to 12).map(i => 10.0 + i * 0.5)
    val r = Indicators.vhf(candles(ramp), period = 4)
      .orderBy("time").select("value").as[Option[Double]].collect()
    assert(r.take(4).forall(_.isEmpty)) // defined from rn = period+1
    r.drop(4).foreach(v => assert(v.contains(0.75), s"got $v"))
    // flat series: denominator 0 → null (total, no 0/0)
    val f = Indicators.vhf(candles(Seq.fill(8)(3.0)), period = 4)
      .select("value").as[Option[Double]].collect()
    assert(f.forall(_.isEmpty))
  }

  test("Klinger: zero-range bars give KVO exactly 0; the cm reset follows trend flips") {
    def hlcv(rows: Seq[(Double, Double, Double, Long)]) =
      rows.zipWithIndex.map { case ((h, l, c, v), i) =>
        ("A", "1m", ts(f"2024-01-01 00:${i}%02d:00"), h, l, c, v)
      }.toDF("pair", "timeframe", "time", "high", "low", "close", "vol")
    // flat-range rising bars: dm = 0 → cm = 0 → vf = 0 → KVO ≡ 0 from slow+1
    val flat = hlcv((1 to 10).map(i => (10.0 + i, 10.0 + i, 10.0 + i, 5L)))
    val r = Indicators.klinger(flat, fast = 2, slow = 3).toDF()
      .orderBy("time").select("value").as[Option[Double]].collect()
    assert(r.take(3).forall(_.isEmpty) && r.drop(3).forall(_.contains(0.0)))
    // hand-trace one flip: hlc 30→33 (up), 33→27 (down) — cm resets to
    // prev_dm + dm on the flip rather than accumulating
    val flip = hlcv(Seq((11.0, 9.0, 10.0, 1L), (12.0, 10.0, 11.0, 1L),
      (10.0, 8.0, 9.0, 1L), (11.0, 9.0, 10.0, 1L)))
    // bar2: trend +1 (0→+1 counts as flip from anchor 0): cm = 2+2 = 4,
    //   vf = 1·|2·2/4 − 1|·1·100 = 0
    // bar3: trend −1 (flip): cm = 2+2 = 4, vf = 1·|2·2/4−1|·(−1)·100 = −0.0
    // bar4: trend +1 (flip): cm = 2+2 = 4, vf = 0 again
    // → every vf is ±0 → both EMAs 0 → KVO 0 at rn=4 (slow=3 seeds at 4)
    val f2 = Indicators.klinger(flip, fast = 2, slow = 3).toDF()
      .orderBy("time").select("value").as[Option[Double]].collect()
    assert(f2.last.contains(0.0))
    // non-degenerate check: a widening-range rising series has nonzero KVO
    val wide = hlcv((1 to 10).map(i => (10.0 + i + i * 0.1, 10.0 + i - i * 0.1,
      10.0 + i, 5L)))
    val w = Indicators.klinger(wide, fast = 2, slow = 3).toDF()
      .orderBy("time").select("value").as[Option[Double]].collect()
    assert(w.drop(3).exists(v => v.exists(_ != 0.0)))
  }

  test("STC: exactly 0 on a flat series; converges to 100 on a ramp; bounded in [0,100]") {
    val flat = Indicators.stc(candles(Seq.fill(12)(7.0)), fast = 3, slow = 5, cycle = 3)
      .toDF().orderBy("time").select("value").as[Option[Double]].collect()
    assert(flat.take(4).forall(_.isEmpty))          // defined from rn = slow
    assert(flat.drop(4).forall(_.contains(0.0)))    // macd ≡ 0 → every layer 0
    // LINEAR ramp: an SMA-seeded EMA sits at its steady-state lag b·(p−1)/2
    // from the seed onward, so macd = b·(slow−fast)/2 is CONSTANT — every
    // stochastic window is flat and the carry rule pins STC ≡ 0
    val ramp = (1 to 30).map(i => 10.0 + i * 0.5)
    val lin = Indicators.stc(candles(ramp), fast = 3, slow = 5, cycle = 3)
      .toDF().orderBy("time").select("value").as[Option[Double]].collect().flatten
    assert(lin.forall(_ == 0.0), s"linear ramp should pin STC to 0, got ${lin.toSeq}")
    // ACCELERATING series: macd strictly increases, each bar is its ring's
    // max → k1 = 100 every bar → both smoothers saturate toward 100
    val geo = (1 to 30).map(i => 10.0 * math.pow(1.05, i))
    val r = Indicators.stc(candles(geo), fast = 3, slow = 5, cycle = 3)
      .toDF().orderBy("time").select("value").as[Option[Double]].collect().flatten
    assert(r.forall(v => v >= 0.0 && v <= 100.0))
    assert(r.last > 99.0, s"accelerating STC should saturate toward 100, got ${r.last}")
  }

  test("KST warm-up gate: value null while any ROC window is part-filled") {
    val closes = (0 until 10).map(i => 10.0 + i)
    val r = Indicators.kst(candles(closes), Seq(2, 3), Seq(2, 2))
      .orderBy("time").select("value").as[Option[Double]].collect()
    assert(r.take(4).forall(_.isEmpty) && r.drop(4).forall(_.isDefined)) // defFrom = 3+2
  }
}
