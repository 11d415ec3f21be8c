package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tick ingest/normalization operators.
  *
  * Reference behavior:
  *  - validity rule: discard `bid <= 0`, `ask <= 0`, `bid > ask`
  *    (reference: docs/ws_ticker_spec.md:95, src/gmo/ws-connection.py:143-145)
  *  - storage grain: one row per (pair, second), first tick in the second wins
  *    (reference: src/gmo/ws-connection.py:47-57)
  *  - derived `mid = (bid + ask) / 2` (reference: src/gmo/ws_ticker_server.py:164)
  *
  * Scale notes: dedup is one hash-shuffle on (pair, second-bucket); the window
  * variant used here shuffles once on the same key and never materializes
  * per-key state beyond a row counter. At 100 TB the key space
  * (pairs × seconds) is enormous and uniform — no skew concern.
  */
object Ticks {

  /** Adapt the driver's `events` table into the canonical tick shape.
    * pair←event_type, time←ts, bid←value, ask←value+0.01 (synthetic spread);
    * `seq`←event_id is kept only as a deterministic arrival-order tiebreak. */
  def fromEvents(events: DataFrame): DataFrame =
    events.select(
      col("event_type").as("pair"),
      col("ts").as("time"),
      col("value").as("bid"),
      (col("value") + lit(0.01)).as("ask"),
      col("event_id").as("seq"))

  /** [[fromEvents]] plus the JSON trade-size field (`props.k`) as `size` —
    * the volume-carrying tick shape for VWAP-style size-weighted analytics.
    * `get_json_object` stays inside codegen; rows whose `props` lack `k`
    * get a NULL size (excluded from size-weighted sums by Spark/SQL NULL
    * aggregation semantics). */
  def fromEventsWithSize(events: DataFrame): DataFrame =
    events.select(
      col("event_type").as("pair"),
      col("ts").as("time"),
      col("value").as("bid"),
      (col("value") + lit(0.01)).as("ask"),
      get_json_object(col("props"), "$.k").cast("int").as("size"),
      col("event_id").as("seq"))

  /** Validity filter (P4): positive prices, bid ≤ ask. */
  def valid(ticks: DataFrame): DataFrame =
    ticks.filter(col("bid") > 0 && col("ask") > 0 && col("bid") <= col("ask"))

  /** Derived mid price (P5). */
  def withMid(ticks: DataFrame): DataFrame =
    ticks.withColumn("mid", (col("bid") + col("ask")) / 2)

  /** First-tick-per-second dedup (S2): truncate `time` to the second and keep
    * the earliest tick per (pair, second), ties broken by `seq`. Deterministic
    * (unlike naive dropDuplicates, whose survivor depends on task order). */
  def dedupSecond(ticks: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("pair"), date_trunc("second", col("time")))
      .orderBy(col("time"), col("seq"))
    ticks
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("pair"), date_trunc("second", col("time")).as("time"),
        col("bid"), col("ask"))
  }

  /** Full ingest normalization: events → valid deduped 1-second ticks. */
  def normalize(events: DataFrame): DataFrame = dedupSecond(valid(fromEvents(events)))
}
