package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided synthetic parquet tables
  * (/root/repo/TESTDATA.md). Schemas are fixed by the generator; we read
  * without inference surprises and normalize the few type edges (ns
  * timestamps) once, here, so every operator downstream sees canonical types.
  */
object Tables {

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Timestamp policy (round-8 regression class): fixture generations have
    // shipped µs `isAdjustedToUTC=0` parquet, which Spark 4's default
    // `inferTimestampNTZ` surfaces as TIMESTAMP_NTZ — a type that
    // `withWatermark`/`unix_micros` reject and that collects as
    // LocalDateTime. Every naive fixture timestamp IS a UTC instant (the
    // reference normalizes at ingest, src/gmo/ws-connection.py:147), so
    // read naive µs directly as TimestampType (sessions run UTC, identical
    // values) and ns columns as raw longs for [[normalizeEventTime]].
    // Set here, not in session builders, so the policy also holds under a
    // driver-owned SparkSession (the `entry` smoke contract).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(spark: SparkSession, d: String): DataFrame = read(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = read(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = read(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = read(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = read(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = read(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = read(spark, d, "lineitem")
  def documents(spark: SparkSession, d: String): DataFrame = read(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = read(spark, d, "embeddings")

  /** `events` plays the tick stream (SURVEY.md §7.1). Fixture generations
    * have shipped `ts` in three flavors — ns-precision parquet (which
    * Spark's vectorized reader rejects, PARQUET_TYPE_ILLEGAL, hence the
    * legacy raw-long switch), µs `isAdjustedToUTC=0` (surfacing as
    * TIMESTAMP_NTZ under Spark 4's `inferTimestampNTZ`), and µs
    * UTC-adjusted TIMESTAMP. All three normalize HERE, once, to Spark's
    * session-TZ `TimestampType` so every downstream watermark /
    * `unix_micros` / `session_window` consumer sees one canonical type.
    * Mirrors the reference's ingest-time UTC normalization of naive
    * timestamps (src/gmo/ws-connection.py:147). Sessions run with UTC
    * session TZ, so the NTZ→TIMESTAMP cast is a pure re-tag. */
  def events(spark: SparkSession, d: String): DataFrame =
    normalizeEventTime(read(spark, d, "events"))

  /** Canonicalize an event-time `ts` column to `TimestampType` (see
    * [[events]]). Shared by the batch reader, the streaming reader
    * ([[graft.queries.StreamQueries]]), and any spec reading fixtures
    * directly. */
  def normalizeEventTime(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      // `div` (integer division) — ns epochs ≈ 1.7e18 overflow double
      // precision, so a floating floor(ts/1000) would be off by ±1 µs.
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
}
