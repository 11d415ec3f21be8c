package graft.queries

import graft.model.Timeframe
import graft.operators.{Ohlc, Ticks}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable queries for the trading spine (SURVEY.md §2.1-§2.3):
  * tick normalization → dedup → OHLC base → resample.
  *
  * Oracle-parity conventions (SURVEY.md §7.4):
  *  - timestamps are emitted as epoch values (`time_s` seconds / `time_us`
  *    micros, BIGINT) — avoids ns-vs-us precision and tz-encoding mismatches
  *    between Spark parquet output and DuckDB;
  *  - dedup survivor order compares time at microsecond precision on both
  *    sides (DuckDB `epoch_us`), since Spark truncates parquet ns → us;
  *  - OHLC first/last use `min_by`/`max_by` over unique-per-group times, so
  *    both engines pick identical rows.
  */
object TradingQueries {

  /** Shared oracle CTEs: events → ticks → valid → second-dedup → 1m candles. */
  private[queries] val ticksCte: String =
    """ticks AS (
      |  SELECT event_type AS pair, ts AS time, value AS bid,
      |         value + 0.01 AS ask, event_id AS seq
      |  FROM events
      |  WHERE value > 0 AND value + 0.01 > 0 AND value <= value + 0.01
      |)""".stripMargin

  private[queries] val dedupCte: String =
    """dedup AS (
      |  SELECT pair, date_trunc('second', time) AS time, bid, ask FROM (
      |    SELECT pair, time, bid, ask,
      |           row_number() OVER (
      |             PARTITION BY pair, date_trunc('second', time)
      |             ORDER BY epoch_us(time), seq) AS rn
      |    FROM ticks) t
      |  WHERE rn = 1
      |)""".stripMargin

  private[queries] val c1mCte: String =
    """c1m AS (
      |  SELECT pair, date_trunc('minute', time) AS time,
      |         min_by(bid, time) AS open, max(bid) AS high,
      |         min(bid) AS low, max_by(bid, time) AS close
      |  FROM dedup GROUP BY 1, 2
      |)""".stripMargin

  private def resampleSql(d: Int): String =
    s"""SELECT pair, (epoch(time)::BIGINT // $d) * $d AS time_s,
       |       min_by(open, time) AS open, max(high) AS high,
       |       min(low) AS low, max_by(close, time) AS close
       |FROM c1m GROUP BY 1, 2""".stripMargin

  /** Canonical tick set for a scale-factor dir. */
  def ticks(spark: SparkSession, d: String): DataFrame =
    Ticks.normalize(Tables.events(spark, d))

  /** Canonical 1m candles for a scale-factor dir. */
  def candles1m(spark: SparkSession, d: String): DataFrame =
    Ohlc.ohlcBase(ticks(spark, d))

  private def epochS(c: String): org.apache.spark.sql.Column =
    unix_timestamp(col(c)).as("time_s")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s2_tick_dedup" -> ((s, d) =>
      ticks(s, d).select(col("pair"), epochS("time"), col("bid"), col("ask"))),
    "p5_mid_relay" -> ((s, d) =>
      Ticks.withMid(Ticks.valid(Ticks.fromEvents(Tables.events(s, d))))
        .select(col("pair"), unix_micros(col("time")).as("time_us"),
          col("bid"), col("ask"), col("mid"))),
    "a1_ohlc_1m" -> ((s, d) =>
      candles1m(s, d).select(col("pair"), epochS("time"),
        col("open"), col("high"), col("low"), col("close"))),
    "a2_ohlc_5m" -> ((s, d) =>
      Ohlc.resample(candles1m(s, d), Timeframe.byCode("5m"))
        .select(col("pair"), epochS("time"),
          col("open"), col("high"), col("low"), col("close"))),
    "a2_ohlc_1h" -> ((s, d) =>
      Ohlc.resample(candles1m(s, d), Timeframe.byCode("1h"))
        .select(col("pair"), epochS("time"),
          col("open"), col("high"), col("low"), col("close"))),
    "a2_ohlc_15m" -> ((s, d) =>
      Ohlc.resample(candles1m(s, d), Timeframe.byCode("15m"))
        .select(col("pair"), epochS("time"),
          col("open"), col("high"), col("low"), col("close"))),
    "a2_ohlc_30m" -> ((s, d) =>
      Ohlc.resample(candles1m(s, d), Timeframe.byCode("30m"))
        .select(col("pair"), epochS("time"),
          col("open"), col("high"), col("low"), col("close"))),
    "a2_ohlc_4h" -> ((s, d) =>
      Ohlc.resample(candles1m(s, d), Timeframe.byCode("4h"))
        .select(col("pair"), epochS("time"),
          col("open"), col("high"), col("low"), col("close"))),

    // sliding (overlapping) windows — the one window shape the tumbling
    // OHLC family doesn't cover: 5-minute TWAP advancing every minute.
    // Spark replicates each row into its ≤5 covering windows (Expand);
    // mid is rounded to the 6-dp grid FIRST so the decimal sum is exact
    // and aggregation-order-insensitive on both engines
    "w5_twap_sliding" -> ((s, d) => {
      val m = ticks(s, d).select(col("pair"), col("time"),
        round((col("bid") + col("ask")) / 2, 6).as("mid"))
      m.groupBy(col("pair"), window(col("time"), "5 minutes", "1 minute"))
        .agg(count(lit(1)).as("n_ticks"),
          round(round(sum(col("mid").cast("decimal(18,6)")).cast("double"), 6)
            / count(lit(1)), 6).as("twap"))
        .select(col("pair"), unix_timestamp(col("window.start")).as("time_s"),
          col("n_ticks"), col("twap"))
    }),

    // calendar seasonality: mean 1m close-to-close return by day-of-week
    // (0 = Sunday on both engines: Spark dayofweek()−1 ↔ DuckDB
    // dayofweek()); returns snap to the 6-dp grid, means via the integer
    // HALF_UP division — no float round at emission
    "a13_dow_returns" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pair")).orderBy(col("time"))
      candles1m(s, d)
        .withColumn("pc", lag(col("close"), 1).over(w))
        .withColumn("r6",
          round((col("close") - col("pc")) / col("pc"), 6).cast("decimal(18,6)"))
        .filter(col("r6").isNotNull)
        .groupBy(col("pair"), (dayofweek(col("time")) - 1).as("dow"))
        .agg(count(lit(1)).as("n"),
          (sum(col("r6")) * 1000000).cast("long").as("micro"))
        .select(col("pair"), col("dow"), col("n"),
          (expr("CASE WHEN micro >= 0 THEN (micro * 2 + n) div (2 * n)" +
            " ELSE -(((-micro) * 2 + n) div (2 * n)) END")
            .cast("double") / 1000000.0).as("mean_ret"))
    }),

    // bid/ask microstructure: per (pair, hour) spread analytics — the ask
    // column's dedicated gate. Spreads sit on the 6-dp grid so sums and
    // extremes are exact; BOTH means use the sign-aware integer HALF_UP
    // division ((2a+n) div 2n) — a grid-exact sum over an integer count is
    // the u37 round()-tie class, so no float round may exist at emission.
    "w22_spread_1h" -> ((s, d) => {
      val t = ticks(s, d).select(col("pair"),
        (floor(unix_timestamp(col("time")) / 3600) * 3600).cast("bigint").as("hour_s"),
        (col("ask") - col("bid")).cast("decimal(18,6)").as("sp6"),
        // the rel quotient is a raw double; the oracle replays this round()
        // exactly via the shortest-repr sround twin (see Indicators.scala
        // ROUND PARITY note), so no engine-tie divergence exists at 9 dp
        round((col("ask") - col("bid")) / ((col("bid") + col("ask")) / 2), 9)
          .cast("decimal(18,9)").as("rel9"))
      t.groupBy(col("pair"), col("hour_s"))
        .agg(count(lit(1)).as("n_ticks"),
          (sum(col("sp6")) * 1000000).cast("long").as("micro"),
          max(col("sp6")).cast("double").as("max_spread"),
          min(col("sp6")).cast("double").as("min_spread"),
          (sum(col("rel9")) * 1000000000).cast("long").as("micro9"))
        .select(col("pair"), col("hour_s"), col("n_ticks"),
          (expr("CASE WHEN micro >= 0 THEN (micro * 2 + n_ticks) div (2 * n_ticks)" +
            " ELSE -(((-micro) * 2 + n_ticks) div (2 * n_ticks)) END")
            .cast("double") / 1000000.0).as("mean_spread"),
          col("max_spread"), col("min_spread"),
          (expr("CASE WHEN micro9 >= 0 THEN (micro9 * 2 + n_ticks) div (2 * n_ticks)" +
            " ELSE -(((-micro9) * 2 + n_ticks) div (2 * n_ticks)) END")
            .cast("double") / 1000000000.0).as("mean_rel_spread"))
    }),

    // duration-weighted TWAP — w5's tick-count TWAP weights every print
    // equally; the honest time-weighted average weights each print by how
    // long it was the live price (lead(time) − time). Weights are integer
    // seconds and mid sits on the 6-dp grid, so Σ(mid·dur) is an exact
    // decimal sum; the single division happens in double on both engines.
    // Each pair's final print has no successor and is dropped (its price
    // was "live" for an unknowable duration).
    "w9_twap_weighted" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("pair"))
        .orderBy(col("time"))
      ticks(s, d)
        .select(col("pair"), unix_timestamp(col("time")).as("t_s"),
          round((col("bid") + col("ask")) / 2, 6).as("mid"))
        .withColumn("dur", lead(col("t_s"), 1).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("pair"))
            .orderBy(col("t_s"))) - col("t_s"))
        .filter(col("dur").isNotNull)
        .groupBy(col("pair"))
        .agg(count(lit(1)).as("n_prints"),
          sum(col("dur")).as("total_s"),
          round(sum(col("mid").cast("decimal(18,6)") * col("dur").cast("decimal(18,6)"))
            .cast("double") / sum(col("dur")).cast("double"), 6).as("twap_w"))
    }),

    // candle gap-fill / forward-fill — the resample-asfreq op every
    // time-series store needs: a DENSE per-pair minute grid (min..max of
    // that pair's 1m candles) where missing minutes carry the last known
    // close forward as a flat print. The grid is generated per pair on
    // executors (sequence + explode, no driver loop); the fill is one
    // last(ignoreNulls) running frame — O(1)/row, one shuffle on pair.
    "a2b_gapfill_1m" -> ((s, d) => {
      val span = candles1m(s, d)
        .groupBy(col("pair"))
        .agg(min(col("time")).as("mn"), max(col("time")).as("mx"))
        .select(col("pair"),
          explode(sequence(col("mn"), col("mx"),
            expr("INTERVAL 1 MINUTE"))).as("time"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("pair"))
        .orderBy(col("time")).rowsBetween(Long.MinValue, 0)
      span.join(candles1m(s, d).select(col("pair"), col("time"), col("close")),
          Seq("pair", "time"), "left")
        .withColumn("close_f", last(col("close"), ignoreNulls = true).over(w))
        .select(col("pair"), epochS("time"),
          col("close_f"), col("close").isNull.as("is_gap"))
    }),

    // rolling z-score outlier detection — the tick-validity filter P4
    // upgraded from static bounds to a statistical one (flag prints > 3σ
    // from the trailing-window mean; the standard bad-print/fat-finger
    // screen). The window EXCLUDES the current row (rows -100..-1) so an
    // outlier can't drag its own baseline. Moments come from exact decimal
    // window sums (mid is on the 6-dp grid, squares on the 12-dp grid);
    // mean/var/z then use identical double ops on both engines, and sqrt
    // is correctly rounded per IEEE-754 — bit-identical, no decimal
    // detour needed. var > 0 guards the constant-window NaN case (the
    // engines' NaN-comparison conventions differ — never emit one).
    // W17: Lee-Ready tick-rule classification + per-minute order-flow
    // imbalance — exact integer counts, one double division
    "w17_tick_rule" -> ((s, d) =>
      Ticks.tickRule(ticks(s, d))
        .select(col("pair"), unix_timestamp(col("minute")).as("minute_s"),
          col("n_buy"), col("n_sell"), col("n_unclassified"),
          round(col("imbalance"), 6).as("imbalance"))),

    "w8_zscore_outliers" -> ((s, d) => {
      // Spark's WindowExec re-evaluates a SLIDING frame's aggregate from
      // scratch for every row (no inverse-add), so a rows(-100,-1) decimal
      // sum costs O(100·n) — measured 3.6 s at sf0.1 vs 1.2 s for this
      // prefix-subtraction form: two UNBOUNDED-PRECEDING running frames
      // (O(1)/row incremental) and the trailing window becomes
      // cum[rn−1] − cum[rn−101]. Decimal prefix sums are exact, so the
      // subtraction reproduces the direct frame sum bit-for-bit.
      val wRun = org.apache.spark.sql.expressions.Window.partitionBy(col("pair"))
        .orderBy(col("time")).rowsBetween(Long.MinValue, 0)
      val wOrd = org.apache.spark.sql.expressions.Window.partitionBy(col("pair"))
        .orderBy(col("time"))
      val zeroDec = lit(0).cast("decimal(28,6)")
      ticks(s, d)
        .select(col("pair"), col("time"),
          round((col("bid") + col("ask")) / 2, 6).as("mid"))
        // rn + both running sums in ONE select (one Window node — a
        // withColumn chain would stage one node per call), then the four
        // lags (over the sums' outputs — necessarily a second pass) in
        // ONE second select: 2 window passes total instead of 4
        .withColumn("mid6", col("mid").cast("decimal(18,6)"))
        .withColumn("mid6sq", col("mid6") * col("mid6"))
        .select(col("pair"), col("time"), col("mid"),
          row_number().over(wOrd).as("rn"),
          sum(col("mid6")).over(wRun).as("cum"),
          sum(col("mid6sq")).over(wRun).as("cumsq"))
        .select(col("pair"), col("time"), col("mid"), col("rn"),
          least(col("rn") - 1, lit(100)).cast("bigint").as("n"),
          (coalesce(lag(col("cum"), 1).over(wOrd), zeroDec) -
            coalesce(lag(col("cum"), 101).over(wOrd), zeroDec))
            .cast("double").as("s"),
          (coalesce(lag(col("cumsq"), 1).over(wOrd), zeroDec) -
            coalesce(lag(col("cumsq"), 101).over(wOrd), zeroDec))
            .cast("double").as("ss"))
        .filter(col("n") >= 30)
        .withColumn("nd", col("n").cast("double"))
        .withColumn("mean", col("s") / col("nd"))
        .withColumn("vr",
          (col("ss") - (col("s") * col("s")) / col("nd")) / (col("nd") - lit(1.0)))
        .filter(col("vr") > 0)
        .withColumn("z", (col("mid") - col("mean")) / sqrt(col("vr")))
        .filter(abs(col("z")) > 3.0)
        .select(col("pair"), epochS("time"), col("mid"), col("n"),
          round(col("z"), 6).as("z"))
    }),

    // on-balance volume over the 1m candles, volume = tick count (the
    // standard proxy when the feed publishes no trade sizes): running sum
    // of volume signed by close-to-close direction. Integer arithmetic
    // throughout — exact at any scale, no decimal detour needed.
    "w10_obv_1m" -> ((s, d) =>
      graft.operators.Indicators.obv(Ohlc.ohlcBaseWithVol(ticks(s, d)))
        .select(col("pair"), epochS("time"), col("close"), col("vol"), col("obv"))),

    // size-weighted VWAP per (pair, hour): sizes come from the tick
    // message's JSON payload (props.k), the numerator is an exact decimal
    // sum of 6-dp-grid mids — partial-aggregation-order-proof — and the
    // one float division happens identically on both engines.
    "w11_vwap_1h" -> ((s, d) => {
      val t = Ticks.withMid(Ticks.valid(Ticks.fromEventsWithSize(Tables.events(s, d))))
      Ohlc.vwap(t, 3600)
        .select(col("pair"), col("time_s"), round(col("vwap"), 6).as("vwap"), col("qty"))
    }),

    // rolling correlation + OLS beta between two pairs' 1m close-change
    // series, joined on the minute: the diversification/hedge-sizing stats
    // a trading warehouse computes BETWEEN series (every reference
    // indicator is within one). Moments are exact decimal window sums of
    // exact decimal diffs (the w8 convention) — only the final corr/beta
    // expression is float, spelled identically in the oracle.
    "w12_roll_corr_30m" -> ((s, d) =>
      graft.operators.CrossPair.rollingCorrelation(candles1m(s, d), "click", "view", 30)
        .select(epochS("time"), col("n"),
          round(col("corr"), 6).as("corr"), round(col("beta"), 6).as("beta"))),

    // the full correlation matrix: every unordered pair combo's rolling
    // corr/beta in ONE combo-partitioned window — P·(P-1)/2 bounded
    // partitions, no global ordering (the round-8 verdict's scale fix for
    // w12 generalized to the "all combos" fan-out it warned about).
    "w13_roll_corr_all" -> ((s, d) =>
      graft.operators.CrossPair.rollingCorrelationAll(candles1m(s, d), 30)
        .select(col("pair_a"), col("pair_b"), epochS("time"), col("n"),
          round(col("corr"), 6).as("corr"), round(col("beta"), 6).as("beta"))),

    // volume profile per (pair, day): size-weighted volume histogram over
    // half-point price bins, with the point of control (the bin holding
    // the day's most volume, lowest bin on ties) flagged — the
    // market-profile view desks read support/acceptance from. Bin math is
    // exact: mids sit on the 6-dp grid, so mid*2 and its floor are exact
    // doubles; volumes are integer sums. One shuffle to the bins, one
    // tiny per-(pair,day) window over bin rows.
    "w14_volume_profile" -> ((s, d) => {
      val t = Ticks.withMid(Ticks.valid(Ticks.fromEventsWithSize(Tables.events(s, d))))
      val wd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pair"), col("day"))
        .orderBy(col("vol").desc, col("bin").asc)
      t.filter(col("size").isNotNull)
        .groupBy(col("pair"), date_trunc("day", col("time")).as("day"),
          // round to the 6-dp grid BEFORE the bin floor (both engines):
          // grid values at bin boundaries (.0/.5) are exact doubles, so
          // floor(grid*2) can never straddle an ulp across engines
          floor(round(col("mid"), 6) * 2.0).cast("bigint").as("bin"))
        .agg(sum(col("size")).cast("bigint").as("vol"),
          count(lit(1)).as("n_ticks"))
        .withColumn("poc", row_number().over(wd) === 1)
        .select(col("pair"), unix_timestamp(col("day")).as("day_s"),
          col("bin"), (col("bin") / lit(2.0)).as("price_lo"),
          col("vol"), col("n_ticks"), col("poc"))
    }),

    // Heikin-Ashi recast of the 1m candles (haOpen recurrence = fold)
    "a11_heikin_ashi" -> ((s, d) =>
      graft.operators.Indicators.heikinAshi(candles1m(s, d))
        .select(col("pair"), col("timeframe"), epochS("time"),
          round(col("ha_open"), 6).as("ha_open"),
          round(col("ha_high"), 6).as("ha_high"),
          round(col("ha_low"), 6).as("ha_low"),
          round(col("ha_close"), 6).as("ha_close"))),

    // candlestick screener: doji / hammer / engulfing flags per 1h bar —
    // 1m bars in this feed are mostly single-tick (open=close=high=low),
    // so the screener runs at the grain where OHLC shape is real
    "w16_candle_patterns" -> ((s, d) =>
      graft.operators.Indicators.candlePatterns(
        Ohlc.resample(candles1m(s, d), Timeframe.byCode("1h")))
        .select(col("pair"), col("timeframe"), epochS("time"),
          col("doji"), col("hammer"), col("bull_engulf"), col("bear_engulf"))),

    // floor-trader pivot ladder from the prior day's daily bar — the
    // support/resistance levels a desk publishes each morning
    "w15_pivot_points" -> ((s, d) =>
      graft.operators.Indicators.pivotPoints(candles1m(s, d))
        .select(col("pair"), unix_timestamp(col("day")).as("day_s"),
          round(col("p"), 6).as("p"),
          round(col("r1"), 6).as("r1"), round(col("s1"), 6).as("s1"),
          round(col("r2"), 6).as("r2"), round(col("s2"), 6).as("s2"),
          round(col("r3"), 6).as("r3"), round(col("s3"), 6).as("s3"))),

    // running-peak drawdown per pair (the risk metric behind every
    // backtest report): cumulative max is a running frame (O(1)/row), the
    // drawdown is a single subtraction — no float accumulation anywhere,
    // so cross-engine parity needs no decimal detour. Trough picked by
    // (max dd, earliest time) — a total order.
    "w7_max_drawdown" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("pair"))
        .orderBy(col("time")).rowsBetween(Long.MinValue, 0)
      candles1m(s, d)
        .withColumn("time_s", unix_timestamp(col("time")))
        .withColumn("dd", max(col("close")).over(w) - col("close"))
        .groupBy(col("pair"))
        .agg(round(max(col("dd")), 6).as("max_drawdown"),
          max_by(col("time_s"), struct(col("dd"), -col("time_s"))).as("trough_s"))
    }))

  val oracleSql: Map[String, String] = Map(
    "s2_tick_dedup" ->
      s"""WITH $ticksCte, $dedupCte
         |SELECT pair, epoch(time)::BIGINT AS time_s, bid, ask FROM dedup""".stripMargin,

    "w5_twap_sliding" ->
      s"""WITH $ticksCte, $dedupCte,
         |m AS (SELECT pair, time, round(((bid + ask) / 2)::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS mid FROM dedup),
         |x AS (
         |  SELECT pair,
         |         time_bucket(INTERVAL '1 minute', time) - r.k * INTERVAL '1 minute' AS ws,
         |         mid
         |  FROM m CROSS JOIN range(0, 5) r(k))
         |SELECT pair, epoch(ws)::BIGINT AS time_s, count(*) AS n_ticks,
         |       round((round(sum(mid::DECIMAL(18,6))::DOUBLE, 6) / count(*))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS twap
         |FROM x GROUP BY 1, 2""".stripMargin,
    "a13_dow_returns" ->
      s"""WITH $ticksCte, $dedupCte, $c1mCte,
         |b AS (SELECT pair, time, close,
         |        lag(close) OVER (PARTITION BY pair ORDER BY time) AS pc
         |      FROM c1m),
         |r AS (SELECT pair, dayofweek(time) AS dow,
         |        round(((close - pc) / pc)::VARCHAR::DECIMAL(38,23), 6)::DECIMAL(18,6) AS r6
         |      FROM b WHERE pc IS NOT NULL),
         |g AS (SELECT pair, dow, count(*) AS n,
         |        CAST(sum(r6) * 1000000 AS BIGINT) AS micro
         |      FROM r GROUP BY 1, 2)
         |SELECT pair, dow::INT AS dow, n,
         |       CAST(CASE WHEN micro >= 0 THEN (micro * 2 + n) // (2 * n)
         |                 ELSE -(((-micro) * 2 + n) // (2 * n)) END
         |            AS DOUBLE) / 1000000.0 AS mean_ret
         |FROM g""".stripMargin,

    "w22_spread_1h" ->
      s"""WITH $ticksCte, $dedupCte,
         |t AS (SELECT pair,
         |        (epoch(time)::BIGINT // 3600) * 3600 AS hour_s,
         |        (ask - bid)::DECIMAL(18,6) AS sp6,
         |        round(((ask - bid) / ((bid + ask) / 2))::VARCHAR::DECIMAL(38,23), 9)::DECIMAL(18,9) AS rel9
         |      FROM dedup),
         |g AS (SELECT pair, hour_s, count(*) AS n_ticks,
         |        CAST(sum(sp6) * 1000000 AS BIGINT) AS micro,
         |        CAST(max(sp6) AS DOUBLE) AS max_spread,
         |        CAST(min(sp6) AS DOUBLE) AS min_spread,
         |        CAST(sum(rel9) * 1000000000 AS BIGINT) AS micro9
         |      FROM t GROUP BY 1, 2)
         |SELECT pair, hour_s, n_ticks,
         |       CAST(CASE WHEN micro >= 0 THEN (micro * 2 + n_ticks) // (2 * n_ticks)
         |                 ELSE -(((-micro) * 2 + n_ticks) // (2 * n_ticks)) END
         |            AS DOUBLE) / 1000000.0 AS mean_spread,
         |       max_spread, min_spread,
         |       CAST(CASE WHEN micro9 >= 0 THEN (micro9 * 2 + n_ticks) // (2 * n_ticks)
         |                 ELSE -(((-micro9) * 2 + n_ticks) // (2 * n_ticks)) END
         |            AS DOUBLE) / 1000000000.0 AS mean_rel_spread
         |FROM g""".stripMargin,

    "w9_twap_weighted" ->
      s"""WITH $ticksCte, $dedupCte,
         |m AS (SELECT pair, epoch(time)::BIGINT AS t_s,
         |             round(((bid + ask) / 2)::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS mid FROM dedup),
         |x AS (SELECT pair, t_s, mid,
         |        lead(t_s) OVER (PARTITION BY pair ORDER BY t_s) - t_s AS dur
         |      FROM m)
         |SELECT pair, count(*) AS n_prints, sum(dur)::BIGINT AS total_s,
         |       -- DECIMAL(12,6)×DECIMAL(9,0): DuckDB 1.0 multiplies two
         |       -- width-18 decimals in int64 and overflows at runtime;
         |       -- narrower declared widths route it through int128. The
         |       -- values are identical either way (sums stay exact).
         |       round((sum((mid::DECIMAL(12,6)) * (dur::DECIMAL(9,0)))::DOUBLE
         |             / sum(dur)::DOUBLE)::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS twap_w
         |FROM x WHERE dur IS NOT NULL GROUP BY 1""".stripMargin,

    "a2b_gapfill_1m" ->
      s"""WITH $ticksCte, $dedupCte, $c1mCte,
         |g AS (SELECT pair,
         |             unnest(range(epoch(mn)::BIGINT, epoch(mx)::BIGINT + 60, 60)) AS t_s
         |      FROM (SELECT pair, min(time) AS mn, max(time) AS mx
         |            FROM c1m GROUP BY 1) s),
         |j AS (SELECT g.pair, g.t_s, c.close
         |      FROM g LEFT JOIN (SELECT pair, epoch(time)::BIGINT AS t_s, close
         |                        FROM c1m) c
         |        ON g.pair = c.pair AND g.t_s = c.t_s)
         |SELECT pair, t_s AS time_s,
         |       last_value(close IGNORE NULLS) OVER (PARTITION BY pair ORDER BY t_s
         |         ROWS UNBOUNDED PRECEDING) AS close_f,
         |       close IS NULL AS is_gap
         |FROM j""".stripMargin,

    // zero ticks inherit the last nonzero direction (IGNORE NULLS running
    // last_value — the a2b gapfill device); counts are exact integers
    "w17_tick_rule" ->
      s"""WITH $ticksCte, $dedupCte,
         |c AS (SELECT pair, time, bid,
         |             lag(bid) OVER (PARTITION BY pair ORDER BY time) AS pb
         |      FROM dedup),
         |d2 AS (SELECT pair, time,
         |              CASE WHEN pb IS NULL THEN NULL
         |                   WHEN bid > pb THEN 1
         |                   WHEN bid < pb THEN -1 END AS d0
         |       FROM c),
         |e AS (SELECT pair, time,
         |             last_value(d0 IGNORE NULLS) OVER (
         |               PARTITION BY pair ORDER BY time
         |               ROWS UNBOUNDED PRECEDING) AS dir
         |      FROM d2),
         |a AS (SELECT pair, date_trunc('minute', time) AS minute,
         |             sum(CASE WHEN dir = 1 THEN 1 ELSE 0 END)::BIGINT AS n_buy,
         |             sum(CASE WHEN dir = -1 THEN 1 ELSE 0 END)::BIGINT AS n_sell,
         |             sum(CASE WHEN dir IS NULL THEN 1 ELSE 0 END)::BIGINT
         |               AS n_unclassified
         |      FROM e GROUP BY 1, 2)
         |SELECT pair, epoch(minute)::BIGINT AS minute_s,
         |       n_buy, n_sell, n_unclassified,
         |       CASE WHEN n_buy + n_sell > 0
         |            THEN round(((n_buy - n_sell)::DOUBLE / (n_buy + n_sell))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE
         |       END AS imbalance
         |FROM a""".stripMargin,

    "w8_zscore_outliers" ->
      s"""WITH $ticksCte, $dedupCte,
         |m AS (SELECT pair, time, round(((bid + ask) / 2)::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS mid FROM dedup),
         |x AS (
         |  SELECT pair, time, mid,
         |         count(mid) OVER w AS n,
         |         sum(mid::DECIMAL(18,6)) OVER w AS s_dec,
         |         sum((mid::DECIMAL(18,6)) * (mid::DECIMAL(18,6))) OVER w AS ss_dec
         |  FROM m
         |  WINDOW w AS (PARTITION BY pair ORDER BY time
         |               ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING)),
         |y AS (
         |  SELECT pair, time, mid, n,
         |         s_dec::DOUBLE AS s, ss_dec::DOUBLE AS ss, n::DOUBLE AS nd
         |  FROM x WHERE n >= 30),
         |z AS (
         |  SELECT pair, time, mid, n,
         |         (ss - (s * s) / nd) / (nd - 1.0) AS vr,
         |         s / nd AS mean
         |  FROM y)
         |SELECT pair, epoch(time)::BIGINT AS time_s, mid, n,
         |       round(((mid - mean) / sqrt(vr))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS z
         |FROM z
         |WHERE vr > 0 AND abs((mid - mean) / sqrt(vr)) > 3.0""".stripMargin,

    "w10_obv_1m" ->
      s"""WITH $ticksCte, $dedupCte,
         |c1v AS (
         |  SELECT pair, date_trunc('minute', time) AS time,
         |         max_by(bid, time) AS close, count(*) AS vol
         |  FROM dedup GROUP BY 1, 2),
         |x AS (
         |  SELECT pair, time, close, vol,
         |         lag(close) OVER (PARTITION BY pair ORDER BY time) AS pc
         |  FROM c1v),
         |sv AS (
         |  SELECT pair, time, close, vol,
         |         CASE WHEN pc IS NULL THEN 0
         |              WHEN close > pc THEN vol
         |              WHEN close < pc THEN -vol
         |              ELSE 0 END AS signed_vol
         |  FROM x)
         |SELECT pair, epoch(time)::BIGINT AS time_s, close, vol,
         |       sum(signed_vol) OVER (PARTITION BY pair ORDER BY time
         |         ROWS UNBOUNDED PRECEDING)::BIGINT AS obv
         |FROM sv""".stripMargin,

    "w11_vwap_1h" ->
      """WITH tks AS (
        |  SELECT event_type AS pair, ts AS time, value AS bid,
        |         value + 0.01 AS ask,
        |         CAST(props::JSON->>'k' AS INTEGER) AS sz
        |  FROM events
        |  WHERE value > 0 AND value + 0.01 > 0 AND value <= value + 0.01),
        |b AS (
        |  -- epoch_us // 1000000 floors the sub-second part like Spark's
        |  -- unix_timestamp (epoch(t)::BIGINT would ROUND it — off-by-one
        |  -- bucket for ticks in the last half-second of an hour)
        |  SELECT pair, ((epoch_us(time) // 1000000) // 3600) * 3600 AS time_s,
        |         -- DECIMAL(12,6)×DECIMAL(9,0) keeps the product in int128
        |         -- (the w9 lesson: two width-18 decimals overflow int64)
        |         sum((round(((bid + ask) / 2)::VARCHAR::DECIMAL(38,23), 6)::DECIMAL(12,6))
        |             * (sz::DECIMAL(9,0))) AS pv,
        |         sum(sz)::BIGINT AS qty
        |  FROM tks GROUP BY 1, 2)
        |SELECT pair, time_s,
        |       CASE WHEN qty > 0 THEN round((pv::DOUBLE / qty)::VARCHAR::DECIMAL(38,23), 6)::DOUBLE END AS vwap,
        |       qty
        |FROM b""".stripMargin,

    "w12_roll_corr_30m" ->
      s"""WITH $ticksCte, $dedupCte, $c1mCte,
         |a AS (SELECT time, close::DECIMAL(12,6) AS ca FROM c1m WHERE pair = 'click'),
         |b AS (SELECT time, close::DECIMAL(12,6) AS cb FROM c1m WHERE pair = 'view'),
         |j AS (SELECT a.time, a.ca, b.cb FROM a JOIN b USING (time)),
         |dd AS (
         |  SELECT time,
         |         ca - lag(ca) OVER (ORDER BY time) AS dx,
         |         cb - lag(cb) OVER (ORDER BY time) AS dy,
         |         row_number() OVER (ORDER BY time) AS rn
         |  FROM j),
         |s AS (
         |  SELECT time, rn,
         |         CAST(sum(dx) OVER w AS DOUBLE) AS sx,
         |         CAST(sum(dy) OVER w AS DOUBLE) AS sy,
         |         CAST(sum(dx * dy) OVER w AS DOUBLE) AS sxy,
         |         CAST(sum(dx * dx) OVER w AS DOUBLE) AS sxx,
         |         CAST(sum(dy * dy) OVER w AS DOUBLE) AS syy
         |  FROM dd
         |  WINDOW w AS (ORDER BY time ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
         |SELECT epoch(time)::BIGINT AS time_s, 30 AS n,
         |       CASE WHEN rn >= 31 AND (30.0 * sxx - sx * sx) > 0.0
         |                 AND (30.0 * syy - sy * sy) > 0.0
         |            THEN round(((30.0 * sxy - sx * sy)
         |                 / sqrt((30.0 * sxx - sx * sx) * (30.0 * syy - sy * sy)))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE
         |       END AS corr,
         |       CASE WHEN rn >= 31 AND (30.0 * sxx - sx * sx) > 0.0
         |            THEN round(((30.0 * sxy - sx * sy) / (30.0 * sxx - sx * sx))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE
         |       END AS beta
         |FROM s""".stripMargin,

    "w13_roll_corr_all" ->
      s"""WITH $ticksCte, $dedupCte, $c1mCte,
         |a AS (SELECT pair AS pair_a, time, close::DECIMAL(12,6) AS ca FROM c1m),
         |b AS (SELECT pair AS pair_b, time, close::DECIMAL(12,6) AS cb FROM c1m),
         |j AS (SELECT pair_a, pair_b, a.time, ca, cb
         |      FROM a JOIN b ON a.time = b.time WHERE pair_a < pair_b),
         |dd AS (
         |  SELECT pair_a, pair_b, time,
         |         ca - lag(ca) OVER w0 AS dx,
         |         cb - lag(cb) OVER w0 AS dy,
         |         row_number() OVER w0 AS rn
         |  FROM j
         |  WINDOW w0 AS (PARTITION BY pair_a, pair_b ORDER BY time)),
         |s AS (
         |  SELECT pair_a, pair_b, time, rn,
         |         CAST(sum(dx) OVER w AS DOUBLE) AS sx,
         |         CAST(sum(dy) OVER w AS DOUBLE) AS sy,
         |         CAST(sum(dx * dy) OVER w AS DOUBLE) AS sxy,
         |         CAST(sum(dx * dx) OVER w AS DOUBLE) AS sxx,
         |         CAST(sum(dy * dy) OVER w AS DOUBLE) AS syy
         |  FROM dd
         |  WINDOW w AS (PARTITION BY pair_a, pair_b ORDER BY time
         |               ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
         |SELECT pair_a, pair_b, epoch(time)::BIGINT AS time_s, 30 AS n,
         |       CASE WHEN rn >= 31 AND (30.0 * sxx - sx * sx) > 0.0
         |                 AND (30.0 * syy - sy * sy) > 0.0
         |            THEN round(((30.0 * sxy - sx * sy)
         |                 / sqrt((30.0 * sxx - sx * sx) * (30.0 * syy - sy * sy)))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE
         |       END AS corr,
         |       CASE WHEN rn >= 31 AND (30.0 * sxx - sx * sx) > 0.0
         |            THEN round(((30.0 * sxy - sx * sy) / (30.0 * sxx - sx * sx))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE
         |       END AS beta
         |FROM s""".stripMargin,

    "a11_heikin_ashi" ->
      s"""WITH RECURSIVE $ticksCte, $dedupCte, $c1mCte,
         |c AS MATERIALIZED (SELECT pair, time, open, high, low, close,
         |             row_number() OVER (PARTITION BY pair ORDER BY time) AS rn
         |      FROM c1m),
         |r AS (
         |  SELECT pair, rn, time, high, low,
         |         (open + close) / 2.0 AS ha_open,
         |         (open + high + low + close) / 4.0 AS ha_close
         |  FROM c WHERE rn = 1
         |  UNION ALL
         |  SELECT c.pair, c.rn, c.time, c.high, c.low,
         |         (r.ha_open + r.ha_close) / 2.0,
         |         (c.open + c.high + c.low + c.close) / 4.0
         |  FROM r JOIN c ON c.pair = r.pair AND c.rn = r.rn + 1)
         |SELECT pair, '1m' AS timeframe, epoch(time)::BIGINT AS time_s,
         |       round((ha_open)::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS ha_open,
         |       round((greatest(high, ha_open, ha_close))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS ha_high,
         |       round((least(low, ha_open, ha_close))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS ha_low,
         |       round((ha_close)::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS ha_close
         |FROM r""".stripMargin,

    "w16_candle_patterns" ->
      s"""WITH $ticksCte, $dedupCte, $c1mCte,
         |c1h AS (${resampleSql(3600)}),
         |b AS (
         |  SELECT pair, time_s, open, high, low, close,
         |         lag(open) OVER w AS po, lag(close) OVER w AS pc,
         |         abs(close - open) AS body, high - low AS rng,
         |         high - greatest(open, close) AS upper_s,
         |         least(open, close) - low AS lower_s
         |  FROM c1h WINDOW w AS (PARTITION BY pair ORDER BY time_s)),
         |f AS (
         |  SELECT pair, time_s,
         |         (rng > 0.0 AND body <= rng * 0.1) AS doji,
         |         (rng > body * 3.0 AND lower_s >= body * 2.0
         |          AND upper_s <= body) AS hammer,
         |         coalesce(pc < po AND close > open
         |                  AND open <= pc AND close >= po, FALSE) AS bull_engulf,
         |         coalesce(pc > po AND close < open
         |                  AND open >= pc AND close <= po, FALSE) AS bear_engulf
         |  FROM b)
         |SELECT pair, '1h' AS timeframe, time_s,
         |       doji, hammer, bull_engulf, bear_engulf
         |FROM f WHERE doji OR hammer OR bull_engulf OR bear_engulf""".stripMargin,

    "w14_volume_profile" ->
      """WITH tks AS (
        |  SELECT event_type AS pair, ts AS time, value AS bid,
        |         value + 0.01 AS ask,
        |         CAST(props::JSON->>'k' AS INTEGER) AS sz
        |  FROM events
        |  WHERE value > 0 AND value + 0.01 > 0 AND value <= value + 0.01),
        |b AS (
        |  SELECT pair, date_trunc('day', time) AS day,
        |         CAST(floor(round(((bid + ask) / 2)::VARCHAR::DECIMAL(38,23), 6)::DOUBLE * 2.0) AS BIGINT) AS bin,
        |         sum(sz)::BIGINT AS vol, count(*) AS n_ticks
        |  FROM tks WHERE sz IS NOT NULL GROUP BY 1, 2, 3)
        |SELECT pair, epoch(day)::BIGINT AS day_s, bin, bin / 2.0 AS price_lo,
        |       vol, n_ticks,
        |       row_number() OVER (PARTITION BY pair, day
        |                          ORDER BY vol DESC, bin ASC) = 1 AS poc
        |FROM b""".stripMargin,

    "w15_pivot_points" ->
      s"""WITH $ticksCte, $dedupCte, $c1mCte,
         |daily AS (
         |  SELECT pair, date_trunc('day', time) AS day,
         |         max(high) AS h, min(low) AS l, max_by(close, time) AS c
         |  FROM c1m GROUP BY 1, 2),
         |lagged AS (
         |  SELECT pair, day,
         |         lag(h) OVER w AS ph, lag(l) OVER w AS pl, lag(c) OVER w AS pc
         |  FROM daily WINDOW w AS (PARTITION BY pair ORDER BY day)),
         |pv AS (
         |  SELECT pair, day, ph, pl, pc, (ph + pl + pc) / 3.0 AS p FROM lagged)
         |SELECT pair, epoch(day)::BIGINT AS day_s,
         |       round((p)::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS p,
         |       round((p * 2.0 - pl)::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS r1,
         |       round((p * 2.0 - ph)::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS s1,
         |       round((p + (ph - pl))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS r2,
         |       round((p - (ph - pl))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS s2,
         |       round((ph + (p - pl) * 2.0)::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS r3,
         |       round((pl - (ph - p) * 2.0)::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS s3
         |FROM pv WHERE p IS NOT NULL""".stripMargin,

    "w7_max_drawdown" ->
      s"""WITH $ticksCte, $dedupCte, $c1mCte,
         |p AS (
         |  SELECT pair, epoch(time)::BIGINT AS time_s,
         |         max(close) OVER (PARTITION BY pair ORDER BY time
         |           ROWS UNBOUNDED PRECEDING) - close AS dd
         |  FROM c1m)
         |SELECT pair, round((dd)::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS max_drawdown, time_s AS trough_s
         |FROM p
         |QUALIFY row_number() OVER (PARTITION BY pair
         |  ORDER BY dd DESC, time_s) = 1""".stripMargin,

    "p5_mid_relay" ->
      s"""WITH $ticksCte
         |SELECT pair, epoch_us(time) AS time_us, bid, ask,
         |       (bid + ask) / 2 AS mid
         |FROM ticks""".stripMargin,
    "a1_ohlc_1m" ->
      s"""WITH $ticksCte, $dedupCte, $c1mCte
         |SELECT pair, epoch(time)::BIGINT AS time_s, open, high, low, close
         |FROM c1m""".stripMargin,
    "a2_ohlc_5m" ->
      s"""WITH $ticksCte, $dedupCte, $c1mCte
         |${resampleSql(300)}""".stripMargin,
    "a2_ohlc_1h" ->
      s"""WITH $ticksCte, $dedupCte, $c1mCte
         |${resampleSql(3600)}""".stripMargin,
    "a2_ohlc_15m" ->
      s"""WITH $ticksCte, $dedupCte, $c1mCte
         |${resampleSql(900)}""".stripMargin,
    "a2_ohlc_30m" ->
      s"""WITH $ticksCte, $dedupCte, $c1mCte
         |${resampleSql(1800)}""".stripMargin,
    "a2_ohlc_4h" ->
      s"""WITH $ticksCte, $dedupCte, $c1mCte
         |${resampleSql(14400)}""".stripMargin)
}
