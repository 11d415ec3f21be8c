package graft.operators

import graft.model.Timeframe
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OHLC candle construction — the heart of the engine (SURVEY.md §7.2 step 3).
  *
  * Reference semantics (src/etl/flows/transform_services.py:56-124):
  *  - base: ticks bucketed to the minute; open = first bid by time,
  *    high = max bid, low = min bid, close = last bid by time (A1)
  *  - resample: 1m candles bucketed by epoch-floor(duration_seconds);
  *    open = first open by time, high = max high, low = min low,
  *    close = last close by time (A2)
  *
  * `min_by`/`max_by` are the exact Spark equivalents of the reference's
  * `(array_agg(x ORDER BY time))[1]` idiom, and deterministic here because
  * `time` is unique per pair after tick dedup (candle times unique per
  * pair×timeframe by construction). One hash aggregate = one shuffle per
  * timeframe; partial aggregation (map-side combine) applies, so at 100 TB
  * the shuffle carries one row per (pair, bucket), not per tick.
  */
object Ohlc {

  /** A1: 1-minute base candles from deduped ticks (bid prices). */
  def ohlcBase(ticks: DataFrame): DataFrame =
    ticks
      .groupBy(col("pair"), window(col("time"), "1 minute"))
      .agg(
        min_by(col("bid"), col("time")).as("open"),
        max(col("bid")).as("high"),
        min(col("bid")).as("low"),
        max_by(col("bid"), col("time")).as("close"))
      .select(col("pair"), lit(Timeframe.Base.code).as("timeframe"),
        col("window.start").as("time"),
        col("open"), col("high"), col("low"), col("close"))

  /** A1 variant carrying tick volume: `vol` = tick count per candle — the
    * standard volume proxy when the feed publishes no trade sizes. Same
    * single hash-aggregate plan as [[ohlcBase]]. */
  def ohlcBaseWithVol(ticks: DataFrame): DataFrame =
    ticks
      .groupBy(col("pair"), window(col("time"), "1 minute"))
      .agg(
        min_by(col("bid"), col("time")).as("open"),
        max(col("bid")).as("high"),
        min(col("bid")).as("low"),
        max_by(col("bid"), col("time")).as("close"),
        count(lit(1)).as("vol"))
      .select(col("pair"), lit(Timeframe.Base.code).as("timeframe"),
        col("window.start").as("time"),
        col("open"), col("high"), col("low"), col("close"), col("vol"))

  /** Size-weighted average price per (pair, epoch-floor bucket):
    * `vwap = Σ(mid·size) / Σ(size)`. The numerator is an EXACT decimal sum
    * (so the result is independent of Spark's partial-aggregation order and
    * engine-portable); the only float op is one final division. One
    * map-side-combined hash aggregate — at 100 TB the shuffle carries one
    * row per (pair, bucket), not per tick. Buckets with zero total size
    * emit NULL. */
  def vwap(ticksWithSize: DataFrame, durationSeconds: Long): DataFrame = {
    val bucket = (floor(unix_timestamp(col("time")) / durationSeconds) * durationSeconds)
      .cast("bigint")
    // mid snaps to the 6-dp grid BEFORE the decimal cast (the w5 convention:
    // a rounded double is within half-ulp of its decimal, so the cast
    // recovers the same decimal on every engine — no tie-rounding drift)
    val pv = round(col("mid"), 6).cast("decimal(18,6)") * col("size")
    ticksWithSize
      .groupBy(col("pair"), bucket.as("time_s"))
      .agg(
        sum(pv).as("pv"),
        sum(col("size")).cast("bigint").as("qty"))
      .select(col("pair"), col("time_s"),
        when(col("qty") > 0, col("pv").cast("double") / col("qty")).as("vwap"),
        col("qty"))
  }

  /** A2: resample base candles into a coarser timeframe by epoch-floor
    * bucketing (reference: transform_services.py:108-110). */
  def resample(candles: DataFrame, tf: Timeframe): DataFrame = {
    val d = tf.durationSeconds.toLong
    val bucket = timestamp_seconds(floor(unix_timestamp(col("time")) / d) * d)
    candles
      .groupBy(col("pair"), bucket.as("bucket"))
      .agg(
        min_by(col("open"), col("time")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col("time")).as("close"))
      .select(col("pair"), lit(tf.code).as("timeframe"), col("bucket").as("time"),
        col("open"), col("high"), col("low"), col("close"))
  }

  /** All configured timeframes from one tick set: base 1m + derived, unioned
    * (the reference's per-table loop collapses into one DataFrame —
    * src/etl/flows/transform.py:42-76). */
  def allTimeframes(ticks: DataFrame, tfs: Seq[Timeframe] = Timeframe.All): DataFrame = {
    val base = ohlcBase(ticks)
    tfs.filter(_.durationSeconds > Timeframe.Base.durationSeconds)
      .map(resample(base, _))
      .foldLeft(base)(_ unionByName _)
  }
}
