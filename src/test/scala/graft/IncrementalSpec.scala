package graft

import graft.operators.{Incremental, Indicators, Ohlc, Ticks}
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val candles = {
    val rnd = new scala.util.Random(11)
    val base = ts("2024-01-01 00:00:00").getTime
    val raw = (1 to 4000).map { i =>
      (if (i % 2 == 0) "A" else "B",
        new java.sql.Timestamp(base + rnd.nextInt(36000) * 1000L),
        50 + rnd.nextDouble * 10)
    }
    Ohlc.ohlcBase(Ticks.dedupSecond(spark.createDataFrame(raw).toDF("pair", "time", "bid")
      .withColumn("ask", $"bid" + 0.01).withColumn("seq", monotonically_increasing_id())))
      .cache()
  }

  private val dedupKeys = Seq("pair", "timeframe", "time", "period", "calc_version")

  test("appendNew is idempotent: run-twice == run-once") {
    val fact = Indicators.sma(candles, 14)
    val once = Incremental.appendNew(fact, fact, dedupKeys)
    assert(once.count() === fact.count())
    val twice = Incremental.appendNew(once, fact, dedupKeys)
    assert(twice.count() === fact.count())
  }

  test("appendNew is first-write-wins: existing rows never corrected") {
    val fact = Indicators.sma(candles, 14)
    val corrupted = fact.withColumn("value", lit(-1.0)) // a "late corrected" rewrite
    val merged = Incremental.appendNew(fact, corrupted, dedupKeys)
    assert(merged.filter($"value" === -1.0).count() === 0)
  }

  test("incremental SMA == full recompute (watermark + period*2 lookback)") {
    val cutoff = ts("2024-01-01 05:00:00")
    val existing = Indicators.sma(candles.filter($"time" <= lit(cutoff)), 14)
    val merged = Incremental.incrementalIndicator(candles, existing, 14,
      Indicators.sma(_, 14))
    val full = Indicators.sma(candles, 14)
    assert(merged.exceptAll(full).count() === 0)
    assert(full.exceptAll(merged).count() === 0)
  }

  test("incremental EMA: prefix untouched, tail seeded from the truncated window") {
    // single pair, closes 1..10 at minute spacing, period 2, cutoff after
    // row 6 → watermark=t6, boundary = 2*p=4 rows before → t2; truncated
    // series = t2..t10 with EMA re-seeded at t3; appended rows are t7..t10.
    val base = ts("2024-01-01 00:00:00").getTime
    val c = (1 to 10).map(i =>
        ("A", "1m", new java.sql.Timestamp(base + i * 60000L), i.toDouble))
      .toDF("pair", "timeframe", "time", "close")
    val cutoff = new java.sql.Timestamp(base + 6 * 60000L + 1)
    val existing = Indicators.ema(c.filter($"time" < lit(cutoff)), 2).toDF()
    val merged = Incremental.incrementalIndicator(c, existing, 2,
      cc => Indicators.ema(cc, 2).toDF())
    def emaSeq(closes: Seq[Double], p: Int): Seq[Option[Double]] = {
      val k = 2.0 / (p + 1); var seed = 0.0; var prev = 0.0
      closes.zipWithIndex.map { case (v, i) =>
        if (i < p - 1) { seed += v; None }
        else if (i == p - 1) { prev = (seed + v) / p; Some(prev) }
        else { prev = (v - prev) * k + prev; Some(prev) }
      }
    }
    // expected: full-prefix EMA for t1..t6, truncated-series EMA for t7..t10
    val pre = emaSeq((1 to 6).map(_.toDouble), 2)
    val tail = emaSeq((2 to 10).map(_.toDouble), 2).drop(5) // t2..t10, keep t7+
    val expected = (pre ++ tail).zipWithIndex.map { case (v, i) => (i + 1) -> v }.toMap
    val got = merged.orderBy("time").collect().map(r =>
      ((r.getAs[java.sql.Timestamp]("time").getTime - base) / 60000L).toInt ->
        Option(r.getAs[java.lang.Double]("value")).map(_.doubleValue)).toMap
    assert(got === expected)
  }

  test("keys with no watermark are recomputed fully") {
    val cutoff = ts("2024-01-01 05:00:00")
    // previous run only ever saw pair A
    val existing = Indicators.sma(
      candles.filter($"pair" === "A" && $"time" <= lit(cutoff)), 14)
    val merged = Incremental.incrementalIndicator(candles, existing, 14,
      Indicators.sma(_, 14))
    val full = Indicators.sma(candles, 14)
    assert(merged.exceptAll(full).count() === 0)
    assert(full.exceptAll(merged).count() === 0)
  }
}
