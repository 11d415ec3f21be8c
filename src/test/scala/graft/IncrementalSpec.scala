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
