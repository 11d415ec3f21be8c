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

  /** S1 wire ingest: parse raw ws ticker messages (reference
    * src/gmo/ws-connection.py:143-150) into the canonical tick shape.
    * One JSON object per line: `{"symbol":"USD_JPY","timestamp":
    * "2026-02-16T13:05:10.123Z","bid":"151.245","ask":"151.249"}` —
    * bid/ask arrive as STRINGS (cast on parse, like the reference),
    * `symbol` uses `_` where the warehouse pair uses `/`, timestamps are
    * ISO-8601 UTC at ANY fractional precision (the spec pins the format,
    * not the digit count, and the reference's `datetime.fromisoformat`
    * accepts 0–6 fractional digits — the lenient default parse here
    * matches that instead of silently dropping a 2- or 6-digit source).
    * Malformed lines and non-numeric prices parse to NULL and are dropped
    * (the reference's skip-bad-rows loop) — `try_*` forms so ANSI mode
    * cannot fail the stream. Works on any line-shaped source — the socket
    * source's `value` column, a Kafka value, or a text file — batch or
    * streaming. No `seq` is assigned: wire order is the source's order;
    * [[dedupSecond]] callers supply their own tiebreak. */
  def fromWireJson(lines: DataFrame, lineCol: String = "value"): DataFrame = {
    val schema = "symbol STRING, timestamp STRING, bid STRING, ask STRING"
    lines
      // r16 optimization: `from_json` is CodegenFallback (interpreted), and
      // Catalyst pushes the malformed-row filter below this projection,
      // inlining the WHOLE parse into each of the filter's four conjuncts —
      // five interpreted parses per row, below any downstream fan-out
      // (measured on u4c: the filter alone carried 4× from_json,
      // plans/r16/u4c_wire_ingest_before.txt). The nondeterministic column
      // blocks predicate pushdown and project collapse through this
      // projection, so the parse runs exactly once per row;
      // spark_partition_id is the cheapest streaming-safe nondeterministic
      // and is dropped by the next projection.
      .select(from_json(col(lineCol), org.apache.spark.sql.types.StructType
        .fromDDL(schema)).as("m"),
        spark_partition_id().as("_no_pushdown"))
      // the always-true filter keeps the barrier column REFERENCED —
      // otherwise ColumnPruning deletes it and the barrier with it
      // (measured: the drop-only variant re-inlined all four parses)
      .filter(col("_no_pushdown") >= -1)
      .select(
        regexp_replace(col("m.symbol"), "_", "/").as("pair"),
        try_to_timestamp(col("m.timestamp")).as("time"),
        col("m.bid").try_cast("double").as("bid"),
        col("m.ask").try_cast("double").as("ask"))
      .filter(col("pair").isNotNull && col("time").isNotNull &&
        col("bid").isNotNull && col("ask").isNotNull)
  }

  /** Validity filter (P4): positive prices, bid ≤ ask. */
  def valid(ticks: DataFrame): DataFrame =
    ticks.filter(col("bid") > 0 && col("ask") > 0 && col("bid") <= col("ask"))

  /** Derived mid price (P5). */
  def withMid(ticks: DataFrame): DataFrame =
    ticks.withColumn("mid", (col("bid") + col("ask")) / 2)

  /** First-tick-per-second dedup (S2): truncate `time` to the second and keep
    * the earliest tick per (pair, second), ties broken by `seq`. Deterministic
    * (unlike naive dropDuplicates, whose survivor depends on task order).
    *
    * Shape (r16 optimization, guide §2.3): a `min_by` hash aggregate, not a
    * `row_number` window. The survivor is identical — `min` over the
    * lexicographic `(time, seq)` struct IS "first by (time, seq)" — but the
    * aggregate form partially aggregates map-side, so the exchange carries
    * at most one row per (pair, second) per map partition instead of EVERY
    * tick, and the per-partition sort the window needed disappears
    * entirely. Measured at sf0.1: the spine's dedup stage loses its Sort
    * and ~40% of its shuffle bytes (see OPTIMIZATION_r16.md). */
  def dedupSecond(ticks: DataFrame): DataFrame =
    ticks
      .groupBy(col("pair"), date_trunc("second", col("time")).as("time"))
      .agg(min_by(struct(col("bid"), col("ask")),
        struct(col("time"), col("seq"))).as("_first"))
      .select(col("pair"), col("time"),
        col("_first.bid").as("bid"), col("_first.ask").as("ask"))

  /** Full ingest normalization: events → valid deduped 1-second ticks. */
  def normalize(events: DataFrame): DataFrame = dedupSecond(valid(fromEvents(events)))

  /** W17: tick-rule trade classification + per-minute order-flow
    * imbalance — the Lee-Ready tick test on a quote stream: a tick is a
    * buy on an uptick, a sell on a downtick, and on a ZERO tick inherits
    * the last nonzero direction (the standard zero-tick rule, via
    * `last(..., ignoreNulls)`); the first tick (and any zero-tick run at
    * the head) is unclassified. Aggregated per (pair, minute):
    * up/down/unclassified counts and `imbalance = (up − down)/(up + down)`
    * — exact integer counts, one double division. Two pair-keyed window
    * passes + one aggregation shuffle; nothing global. */
  def tickRule(deduped: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("pair")).orderBy(col("time"))
    val classified = deduped
      .withColumn("pb", lag(col("bid"), 1).over(w))
      .withColumn("d0",
        when(col("pb").isNull, lit(null).cast("int"))
          .when(col("bid") > col("pb"), lit(1))
          .when(col("bid") < col("pb"), lit(-1))
          .otherwise(lit(null).cast("int"))) // zero tick: inherit below
      .withColumn("dir", last(col("d0"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    classified
      .groupBy(col("pair"), date_trunc("minute", col("time")).as("minute"))
      .agg(
        sum(when(col("dir") === 1, 1L).otherwise(0L)).as("n_buy"),
        sum(when(col("dir") === -1, 1L).otherwise(0L)).as("n_sell"),
        sum(when(col("dir").isNull, 1L).otherwise(0L)).as("n_unclassified"))
      .withColumn("imbalance",
        when(col("n_buy") + col("n_sell") > 0,
          (col("n_buy") - col("n_sell")).cast("double")
            / (col("n_buy") + col("n_sell"))))
  }
}
