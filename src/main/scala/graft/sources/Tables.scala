package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided synthetic parquet tables
  * (/root/repo/TESTDATA.md). Schemas are fixed by the generator; we read
  * without inference surprises and normalize the few type edges (ns
  * timestamps) once, here, so every operator downstream sees canonical types.
  */
object Tables {

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame = read(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = read(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = read(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = read(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = read(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = read(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = read(spark, d, "lineitem")
  def documents(spark: SparkSession, d: String): DataFrame = read(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = read(spark, d, "embeddings")

  /** `events` plays the tick stream (SURVEY.md §7.1). Its `ts` column is
    * nanosecond-precision parquet, which Spark's vectorized reader rejects
    * (PARQUET_TYPE_ILLEGAL); read it as raw nanos and normalize to Spark's
    * microsecond TimestampType so window/date_trunc semantics are canonical. */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(spark, d, "events")
    // `div` (integer division) — ns epochs ≈ 1.7e18 overflow double precision,
    // so a floating floor(ts/1000) would be off by ±1 µs. The synthesized
    // scale-up corpora (graft.ScaleUp) carry µs TIMESTAMP ts (Spark cannot
    // write ns parquet), which the legacy switch leaves untouched — so
    // normalize only when ts actually arrives as raw nanos.
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
}
