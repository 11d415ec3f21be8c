package graft

import graft.model.Timeframe
import graft.operators.{Ohlc, Ticks}
import org.apache.spark.sql.functions._

class OhlcSpec extends SparkSpec {
  import spark.implicits._

  private def mkTicks(rows: Seq[(String, String, Double)]) =
    rows.map { case (p, t, b) => (p, ts(t), b, b + 0.01) }
      .toDF("pair", "time", "bid", "ask")

  test("ohlcBase picks first/last by time, min/max within the minute") {
    val candles = Ohlc.ohlcBase(mkTicks(Seq(
      ("X", "2024-01-01 00:00:05", 10.0),
      ("X", "2024-01-01 00:00:30", 12.0),
      ("X", "2024-01-01 00:00:50", 8.0),
      ("X", "2024-01-01 00:01:10", 9.0),
      ("Y", "2024-01-01 00:00:59", 5.0))))
      .orderBy("pair", "time").collect()
    assert(candles.length === 3)
    val first = candles(0)
    assert(first.getAs[String]("pair") === "X")
    assert(first.getAs[java.sql.Timestamp]("time") === ts("2024-01-01 00:00:00"))
    assert(first.getAs[Double]("open") === 10.0)
    assert(first.getAs[Double]("high") === 12.0)
    assert(first.getAs[Double]("low") === 8.0)
    assert(first.getAs[Double]("close") === 8.0)
    assert(candles(1).getAs[Double]("open") === 9.0)
    assert(candles(2).getAs[Double]("close") === 5.0)
  }

  test("dedupSecond keeps the earliest tick per (pair, second)") {
    val ticks = Seq(
      ("X", ts("2024-01-01 00:00:05.100"), 10.0, 10.01, 1L),
      ("X", ts("2024-01-01 00:00:05.900"), 99.0, 99.01, 2L),
      ("X", ts("2024-01-01 00:00:06.000"), 11.0, 11.01, 3L))
      .toDF("pair", "time", "bid", "ask", "seq")
    val out = Ticks.dedupSecond(ticks).orderBy("time").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Double]("bid") === 10.0) // first-wins
    assert(out(0).getAs[java.sql.Timestamp]("time") === ts("2024-01-01 00:00:05"))
  }

  test("candle invariants: low <= open,close <= high (random ticks)") {
    val rnd = new scala.util.Random(42)
    val base = ts("2024-01-01 00:00:00").getTime
    val ticks = (1 to 2000).map { i =>
      (if (i % 2 == 0) "A" else "B",
        new java.sql.Timestamp(base + rnd.nextInt(7200) * 1000L),
        50 + rnd.nextDouble * 10)
    }
    val candles = Ohlc.allTimeframes(Ticks.dedupSecond(
      mkTicks(Seq.empty).sparkSession.createDataFrame(ticks).toDF("pair", "time", "bid")
        .withColumn("ask", $"bid" + 0.01).withColumn("seq", monotonically_increasing_id())))
    val bad = candles.filter($"low" > $"open" || $"low" > $"close" ||
      $"high" < $"open" || $"high" < $"close" || $"low" > $"high")
    assert(bad.count() === 0)
  }

  test("resample(1m -> 5m) equals direct 5m aggregation from ticks") {
    val rnd = new scala.util.Random(7)
    val base = ts("2024-01-01 00:00:00").getTime
    val raw = (1 to 3000).map { i =>
      (if (i % 3 == 0) "A" else "B",
        new java.sql.Timestamp(base + rnd.nextInt(7200) * 1000L),
        50 + rnd.nextDouble * 10)
    }
    val ticks = Ticks.dedupSecond(spark.createDataFrame(raw).toDF("pair", "time", "bid")
      .withColumn("ask", $"bid" + 0.01).withColumn("seq", monotonically_increasing_id()))
      .cache()
    val viaResample = Ohlc.resample(Ohlc.ohlcBase(ticks), Timeframe.byCode("5m"))
    val direct = ticks
      .groupBy($"pair", window($"time", "5 minutes"))
      .agg(min_by($"bid", $"time").as("open"), max($"bid").as("high"),
        min($"bid").as("low"), max_by($"bid", $"time").as("close"))
      .select($"pair", lit("5m").as("timeframe"), $"window.start".as("time"),
        $"open", $"high", $"low", $"close")
    assert(viaResample.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(viaResample).count() === 0)
  }
}
