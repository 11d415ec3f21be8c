package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data relay / serving operators (SURVEY.md §2.1 S5-S6, §2.8 T4-T5,
  * §2.9 U4).
  *
  * Reference: poll-based relay server — bootstrap latest row, then fetch rows
  * `time > cursor` each second, normalize to the ws message shape, broadcast
  * (src/gmo/ws_ticker_server.py:151-255; wire contract docs/ws_ticker_spec.md:16-89).
  * The broadcast/socket layer is serving-side and out of engine scope; these
  * are the query-semantics pieces it polls with.
  */
object Relay {

  /** S6/T5: latest tick per pair — `max_by(struct(...), time)` aggregation,
    * one shuffle carrying one row per pair (vs. the reference's
    * ORDER BY time DESC LIMIT 1 per table). */
  def latestPerPair(ticks: DataFrame): DataFrame =
    ticks
      .groupBy(col("pair"))
      .agg(max_by(struct(col("time"), col("bid"), col("ask")), col("time")).as("t"))
      .select(col("pair"), col("t.time").as("time"), col("t.bid").as("bid"),
        col("t.ask").as("ask"))

  /** S5/T4: incremental cursor scan — all ticks strictly after `cursor`.
    * In Structured Streaming this is the source offset; in batch it is a
    * pushed-down range predicate (min/max-pruned at the parquet footer). */
  def afterCursor(ticks: DataFrame, cursor: java.sql.Timestamp): DataFrame =
    ticks.filter(col("time") > lit(cursor))

  /** U4/P10/P11: normalize ticks to the ws ticker message JSON
    * (docs/ws_ticker_spec.md:28-51): `{type, symbol, bid, ask, mid,
    * timestamp}` with ISO-8601 millisecond UTC timestamps. */
  def toMessages(ticks: DataFrame): DataFrame =
    ticks.select(col("pair"), to_json(struct(
      lit("ticker").as("type"),
      col("pair").as("symbol"),
      col("bid"),
      col("ask"),
      ((col("bid") + col("ask")) / 2).as("mid"),
      date_format(col("time"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("timestamp")
    )).as("message"))

  /** U4 with oracle-exact formatting: the same wire message built via
    * explicit `%.6f` number formatting instead of Jackson's
    * shortest-roundtrip rendering, so DuckDB's `printf` reproduces the
    * string byte-for-byte. (No rounding ties exist: a double would need the
    * exact decimal `…5`·10⁻⁷ tail, which is not dyadic-representable, so
    * Java's HALF_UP and C's half-even always agree.) */
  def toWireMessages(ticks: DataFrame): DataFrame =
    ticks.select(col("pair"), concat(
      lit("{\"type\":\"ticker\",\"symbol\":\""), col("pair"),
      lit("\",\"bid\":"), format_string("%.6f", col("bid")),
      lit(",\"ask\":"), format_string("%.6f", col("ask")),
      lit(",\"mid\":"), format_string("%.6f", (col("bid") + col("ask")) / 2),
      lit(",\"timestamp\":\""), date_format(col("time"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"),
      lit("\"}")).as("message"))
}
