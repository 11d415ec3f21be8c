package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SMA-cross signal detection (SURVEY.md §2.4 J1 + §2.5 W1).
  *
  * Reference: self equi-join of fact_sma (short × long period) on
  * (time, currency, timeframe, calc_version), LAG over time, cross predicate
  * (src/etl/flows/transform_services.py:401-443 golden, :463-505 dead).
  *
  *  - golden cross (BUY):  prev_short <= prev_long AND short >  long
  *  - dead cross  (SELL):  prev_short >= prev_long AND short <  long
  *
  * Scale notes: the self-join keys on (pair, timeframe, time, calc_version) —
  * high-cardinality and uniform, so a shuffled hash join partitions cleanly;
  * the subsequent lag window reuses the same (pair, timeframe) partitioning.
  * Warm-up rows carry NULL values; NULL comparisons are filtered out, so no
  * signal can fire before both SMAs are materialized. This is an
  * *intentional deviation* from the reference: Postgres NaN compares
  * NaN<=NaN as true and sorts NaN above all values, so the reference can
  * fire a spurious signal at the first bar where both SMAs materialize
  * (prev values still NaN); NULL propagation suppresses that edge here.
  */
object Signals {

  /** Join short- and long-period SMA series into one row per bar with
    * `short_value`/`long_value` plus their 1-bar lags. */
  def smaCrossInput(sma: DataFrame, shortPeriod: Int, longPeriod: Int): DataFrame = {
    require(shortPeriod < longPeriod,
      s"short period must be < long period ($shortPeriod >= $longPeriod)")
    val keys = Seq("pair", "timeframe", "time", "calc_version")
    val s = sma.filter(col("period") === shortPeriod)
      .select(keys.map(col) :+ col("value").as("short_value"): _*)
    val l = sma.filter(col("period") === longPeriod)
      .select(keys.map(col) :+ col("value").as("long_value"): _*)
    val w = Window.partitionBy(col("pair"), col("timeframe"), col("calc_version"))
      .orderBy(col("time"))
    s.join(l, keys)
      .withColumn("prev_short", lag(col("short_value"), 1).over(w))
      .withColumn("prev_long", lag(col("long_value"), 1).over(w))
  }

  private def toEvents(crossed: DataFrame, eventType: String, shortPeriod: Int): DataFrame =
    crossed.select(
      col("time").as("event_datetime"),
      col("pair"),
      lit(eventType).as("event_type"),
      col("short_value").as("price"),
      lit(0).as("quantity"), // reference writes quantity=0 (transform_services.py:434)
      lit("SMA").as("trigger_indicator_name"),
      col("short_value").as("trigger_indicator_value"),
      col("timeframe").as("trigger_indicator_timeframe"),
      lit(shortPeriod).as("trigger_indicator_period"))

  /** Golden cross → BUY events. */
  def goldenCross(sma: DataFrame, shortPeriod: Int, longPeriod: Int): DataFrame =
    toEvents(
      smaCrossInput(sma, shortPeriod, longPeriod)
        .filter(col("prev_short") <= col("prev_long") &&
          col("short_value") > col("long_value")),
      "BUY", shortPeriod)

  /** Dead cross → SELL events. */
  def deadCross(sma: DataFrame, shortPeriod: Int, longPeriod: Int): DataFrame =
    toEvents(
      smaCrossInput(sma, shortPeriod, longPeriod)
        .filter(col("prev_short") >= col("prev_long") &&
          col("short_value") < col("long_value")),
      "SELL", shortPeriod)

  /** F4 strategy flow: both cross detectors over one shared intermediate
    * (reference: src/etl/flows/transform.py:123-129). Single-pass: one
    * filter with a CASE-typed event column instead of two filtered branches
    * + union — no cache needed (the old `.cache()` here leaked storage
    * across repeated invocations), and one scan instead of two. */
  def strategy(sma: DataFrame, shortPeriod: Int, longPeriod: Int): DataFrame = {
    val golden = col("prev_short") <= col("prev_long") &&
      col("short_value") > col("long_value")
    val dead = col("prev_short") >= col("prev_long") &&
      col("short_value") < col("long_value")
    smaCrossInput(sma, shortPeriod, longPeriod)
      .filter(golden || dead)
      .select(
        col("time").as("event_datetime"),
        col("pair"),
        when(golden, "BUY").otherwise("SELL").as("event_type"),
        col("short_value").as("price"),
        lit(0).as("quantity"),
        lit("SMA").as("trigger_indicator_name"),
        col("short_value").as("trigger_indicator_value"),
        col("timeframe").as("trigger_indicator_timeframe"),
        lit(shortPeriod).as("trigger_indicator_period"))
  }
}
