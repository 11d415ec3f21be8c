package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization — group each user's event stream into sessions separated
  * by inactivity gaps strictly greater than `gapSeconds`: an event exactly
  * `gapSeconds` after its predecessor still merges, matching Spark's
  * `session_window` (each event's window is `[t, t+gap]` for merging, so
  * batch and streaming agree on EVERY boundary, including exact-gap ties —
  * a tie found at sf0.1 is what forced this convention to be pinned down).
  * The canonical user-analytics / training-data segmentation operator.
  *
  * Batch form is the classic two-window pass: flag rows whose gap from the
  * previous event exceeds the threshold, running-sum the flags into a
  * per-user session ordinal, aggregate. Both windows share one
  * (user)-partitioned sort — a single shuffle, no join, exact DuckDB
  * parity (timestamp arithmetic and integer sums only). At 100 TB the
  * partition key (user_id) is high-cardinality/uniform; one user's history
  * is bounded, so window state is safe.
  *
  * The streaming twin is `session_window` (see
  * [[graft.streaming.Streams.sessionizeStream]]) — same session boundaries
  * for gap-closed sessions.
  */
object Sessions {

  /** Per-event session ordinal: `(user_id, ts, …, session_no)` with
    * `session_no` starting at 1 per user. */
  def withSessionNo(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("_prev", lag(col("ts"), 1).over(w))
      .withColumn("_new",
        // microsecond arithmetic: unix_timestamp would truncate to seconds
        // and disagree with a sub-second-aware oracle on near-gap events
        when(col("_prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("_prev")) >
            gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      // ROWS, not the default RANGE frame: with duplicate (user_id, ts)
      // events RANGE includes tie peers in the running sum, diverging from
      // engines that define the frame row-wise
      .withColumn("session_no",
        sum(col("_new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev", "_new")
  }

  /** Session-level rollup: bounds, event count, value sum per session.
    *
    * `total_value` sums through DECIMAL(18,6): double addition is
    * order-sensitive, so a partition-order sum can differ by a ulp from a
    * time-order sum and cross a rounding boundary downstream. The decimal
    * sum is associative/exact and lands exactly on the 6-dp grid, so the
    * emitted double is identical regardless of aggregation order. */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame =
    withSessionNo(events, gapSeconds)
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
}
