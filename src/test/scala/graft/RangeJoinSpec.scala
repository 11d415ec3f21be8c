package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val signals = Seq(
    ("X", ts("2024-01-01 00:10:00"), "BUY"),
    ("X", ts("2024-01-01 00:40:00"), "SELL"),
    ("Y", ts("2024-01-01 00:10:00"), "BUY"))
    .toDF("pair", "time", "event_type")

  private val candles = (0 until 60 by 5).map { m =>
    ("X", ts(f"2024-01-01 00:$m%02d:00"), 100.0 + m)
  }.toDF("pair", "time", "close")

  test("rangeJoin == plain inequality join on the same band") {
    val got = RangeJoin.rangeJoin(signals, candles, Seq("pair"), "time", 0, 600)
      .orderBy("pair", "l_time", "r_time").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(3)))
    val exp = signals.as("s").join(candles.as("c"),
        $"s.pair" === $"c.pair" &&
          unix_timestamp($"c.time").between(
            unix_timestamp($"s.time"), unix_timestamp($"s.time") + 600))
      .select($"s.pair", $"s.time".as("lt"), $"c.time".as("rt"))
      .orderBy("pair", "lt", "rt").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2)))
    assert(got.nonEmpty)
    assert(got.toSeq === exp.toSeq)
  }

  test("band edges are inclusive and negative lower bounds work") {
    val got = RangeJoin.rangeJoin(signals, candles, Seq("pair"), "time", -300, 300)
      .filter($"l_time" === ts("2024-01-01 00:10:00") && $"pair" === "X")
      .orderBy("r_time").collect().map(_.getTimestamp(3))
    assert(got.toSeq === Seq(ts("2024-01-01 00:05:00"),
      ts("2024-01-01 00:10:00"), ts("2024-01-01 00:15:00")))
  }
}
