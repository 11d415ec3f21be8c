package graft

import java.nio.file.Files

import graft.sources.CandleSink
import org.apache.spark.sql.functions._

class CandleSinkSpec extends SparkSpec {
  import spark.implicits._

  private def candles(rows: (String, String, String, Double)*) =
    rows.map { case (p, tf, t, c) => (p, tf, ts(t), c, c + 1, c - 1, c) }
      .toDF("pair", "timeframe", "time", "open", "high", "low", "close")

  test("partitioned write + partition-pruned read") {
    val dir = Files.createTempDirectory("sink").toString + "/candles"
    CandleSink.append(spark, candles(
      ("USD/JPY", "1m", "2024-01-01 00:00:00", 100.0),
      ("USD/JPY", "1m", "2024-01-01 00:01:00", 101.0),
      ("EUR/JPY", "1m", "2024-01-01 00:00:00", 160.0),
      ("USD/JPY", "5m", "2024-01-01 00:00:00", 100.0)), dir)

    val pruned = CandleSink.read(spark, dir)
      .filter($"pair" === "USD/JPY" && $"timeframe" === "1m")
    assert(pruned.count() === 2)
    // the filters must reach the scan as PartitionFilters (directory-level
    // pruning), not as row-level data filters
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters:")).getOrElse("")
    assert(pf.contains("pair") && pf.contains("timeframe"),
      s"partition filters missing from scan: $pf")
  }

  test("first-write-wins survives a rewrite: re-append changes nothing") {
    val dir = Files.createTempDirectory("sink").toString + "/candles"
    val first = candles(("USD/JPY", "1m", "2024-01-01 00:00:00", 100.0))
    assert(CandleSink.append(spark, first, dir) === 1L)

    // same key, different value: must be ignored (row once written is final)
    val conflicting = candles(("USD/JPY", "1m", "2024-01-01 00:00:00", 999.0))
    assert(CandleSink.append(spark, conflicting, dir) === 0L)
    val stored = CandleSink.read(spark, dir).collect()
    assert(stored.length === 1)
    assert(stored(0).getAs[Double]("open") === 100.0)

    // novel key appends
    assert(CandleSink.append(spark,
      candles(("USD/JPY", "1m", "2024-01-01 00:01:00", 101.0)), dir) === 1L)
    assert(CandleSink.read(spark, dir).count() === 2)
  }
}
