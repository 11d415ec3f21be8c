package graft

import graft.operators.Flows
import org.apache.spark.sql.functions._

class FlowsSpec extends SparkSpec {
  import spark.implicits._

  // 3 hours of one-minute ticks, two pairs
  private val ticks = (0 until 180).flatMap { m =>
    Seq(("X", ts(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00"), 100.0 + m % 7),
      ("Y", ts(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00"), 50.0 + m % 5))
  }.map { case (p, t, b) => (p, t, b, b + 0.01) }.toDF("pair", "time", "bid", "ask")

  test("candleFlow materializes exactly the configured timeframes") {
    val cfg = new Config(Map("DEFAULT_TIMEFRAMES" -> "1m,5m,1h"))
    val tfs = Flows.candleFlow(ticks, cfg)
      .select("timeframe").distinct().as[String].collect().sorted
    assert(tfs.toSeq === Seq("1h", "1m", "5m"))
  }

  test("candleFlow rejects unknown timeframe codes fail-fast") {
    val cfg = new Config(Map("DEFAULT_TIMEFRAMES" -> "1m,7m"))
    val e = intercept[IllegalArgumentException](Flows.candleFlow(ticks, cfg))
    assert(e.getMessage.contains("7m"))
  }

  test("indicatorFlow fans out indicators x periods x timeframes") {
    val cfg = new Config(Map(
      "DEFAULT_PERIODS" -> "3,5", "DEFAULT_TIMEFRAMES" -> "1m,5m"))
    val grid = Flows.indicatorFlow(ticks, cfg)
      .select("indicator", "period", "timeframe").distinct().collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(grid === (for {
      i <- Set("RSI", "SMA", "EMA"); p <- Set(3, 5); t <- Set("1m", "5m")
    } yield (i, p, t)))
  }

  test("fused indicator grid is BIT-identical to the per-branch union") {
    val candles = Flows.candleFlow(ticks,
      new Config(Map("DEFAULT_TIMEFRAMES" -> "1m,5m")))
    val inds = Seq("RSI", "SMA", "EMA")
    val ps = Seq(3, 5, 14)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("indicator", "pair", "timeframe", "time", "period", "value")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getTimestamp(3), r.getInt(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .sortBy(t => (t._1, t._2, t._3, t._4.getTime, t._5))
    val branch = rows(graft.operators.Indicators.indicatorFacts(candles, inds, ps))
    val fused = rows(graft.operators.Indicators.indicatorFactsFused(candles, inds, ps))
    assert(fused.length === branch.length)
    // exact double equality — the fused SMA must replay WindowExec's fresh
    // oldest→newest frame fold, EMA/RSI the identical recursions
    assert(fused === branch)
  }

  test("snapshot-resumed fused grid is BIT-identical to the one-shot fold") {
    // the incremental-grid contract (s8j): fold a prefix, snapshot every
    // cell's machine state, resume over the tail — prefix∪tail must equal
    // the uninterrupted fold EXACTLY (raw doubles, no rounding), at a
    // split point chosen mid-warm-up so seeds cross the snapshot too
    val candles = Flows.candleFlow(ticks,
      new Config(Map("DEFAULT_TIMEFRAMES" -> "1m,5m")))
    val inds = Seq("RSI", "SMA", "EMA")
    val ps = Seq(3, 5, 14)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("indicator", "pair", "timeframe", "time", "period", "value")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getTimestamp(3), r.getInt(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .sortBy(t => (t._1, t._2, t._3, t._4.getTime, t._5))
    val full = rows(graft.operators.Indicators.indicatorFactsFused(candles, inds, ps))
    // 00:07 splits inside period-14's seed accumulation AND mid-5m-bar
    // warm-up; a second split late enough that every cell is warm
    for (cut <- Seq("2024-01-01 00:07:00", "2024-01-01 01:30:00")) {
      val prefix = candles.filter(col("time") < lit(cut))
      val tail = candles.filter(col("time") >= lit(cut))
      val state = graft.operators.Indicators.indicatorGridSnapshot(prefix, inds, ps)
      val merged = rows(
        graft.operators.Indicators.indicatorFactsFused(prefix, inds, ps).unionByName(
          graft.operators.Indicators.indicatorFactsFusedResume(tail, inds, ps, state)))
      assert(merged.length === full.length, s"cut=$cut")
      assert(merged === full, s"cut=$cut")
    }
    // a tail containing a BRAND-NEW key starts that key's machines fresh
    val newKey = rows(graft.operators.Indicators.indicatorFactsFusedResume(
      candles.filter(col("pair") === "Y"), inds, ps,
      graft.operators.Indicators.indicatorGridSnapshot(
        candles.filter(col("pair") === "X"), inds, ps)))
    assert(newKey === full.filter(_._2 == "Y"))
  }

  test("strategyFlow emits alternating BUY/SELL per pair, config periods") {
    val cfg = new Config(Map(
      "DEFAULT_SHORT_PERIOD" -> "3", "DEFAULT_LONG_PERIOD" -> "7"))
    val ev = Flows.strategyFlow(ticks, cfg)
      .orderBy("pair", "event_datetime").collect()
    assert(ev.nonEmpty)
    assert(ev.forall(_.getAs[Int]("trigger_indicator_period") === 3))
    // alternation within each pair (golden and dead crosses interleave)
    ev.groupBy(_.getAs[String]("pair")).values.foreach { rows =>
      rows.map(_.getAs[String]("event_type")).sliding(2).foreach {
        case Array(a, b) => assert(a !== b)
        case _ =>
      }
    }
  }
}
