package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Fixture-regeneration tripwire (round-8 regression class). The driver's
  * parquet generator has shipped the events `ts` column in three flavors
  * across regenerations:
  *
  *   1. ns-precision INT64 timestamps (Spark's vectorized reader rejects
  *      them; read as raw longs via `spark.sql.legacy.parquet.nanosAsLong`)
  *   2. µs `isAdjustedToUTC=0` — Spark 4 (`inferTimestampNTZ` default on)
  *      surfaces these as TIMESTAMP_NTZ, which `withWatermark` and
  *      `unix_micros` both reject
  *   3. µs UTC-adjusted — plain TimestampType
  *
  * [[graft.sources.Tables.normalizeEventTime]] must canonicalize ALL
  * THREE to session-TZ TimestampType (the reference normalizes naive
  * timestamps to UTC at ingest: src/gmo/ws-connection.py:147). Each
  * flavor is written here as a real parquet fixture, read back through
  * the production reader, and pushed through a watermark analysis plus a
  * value check so the next silent regeneration cannot break the gate
  * queries without failing this spec first.
  */
class TimestampFlavorSpec extends SparkSpec {

  // 2021-01-02T03:04:05.123456Z — exercises sub-second µs precision
  private val epochMicros = 1609556645123456L

  private def writeAndReadBack(flavor: String)(write: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-tsflavor-$flavor-")
    write(dir.toString)
    val df = graft.sources.Tables.events(spark, dir.toString)
    assert(df.schema("ts").dataType === TimestampType,
      s"$flavor: reader must canonicalize ts to TimestampType, " +
        s"got ${df.schema("ts").dataType}")
    // exact µs round-trip under the UTC session TZ
    val got = df.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got === epochMicros, s"$flavor: ts drifted: $got != $epochMicros")
    // the round-8 failure mode: watermark assignment rejects NTZ at
    // analysis time — prove the canonical column passes it
    val wm = df.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute")).count()
    wm.queryExecution.assertAnalyzed()
  }

  test("flavor 1: legacy ns-as-long fixtures normalize to TimestampType") {
    writeAndReadBack("ns-long") { dir =>
      // Spark cannot write ns parquet; fake the generator's shape with a
      // raw long column named ts (exactly what nanosAsLong surfaces)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType)))
      spark.createDataFrame(
        java.util.List.of(Row(1L, epochMicros * 1000L)), schema)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
  }

  test("flavor 2: µs TIMESTAMP_NTZ fixtures (current generator) normalize") {
    writeAndReadBack("ntz") { dir =>
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampNTZType)))
      spark.createDataFrame(
        java.util.List.of(Row(1L,
          java.time.LocalDateTime.ofEpochSecond(
            epochMicros / 1000000L, (epochMicros % 1000000L).toInt * 1000,
            java.time.ZoneOffset.UTC))), schema)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
  }

  test("flavor 3: µs UTC-adjusted TIMESTAMP fixtures pass through") {
    writeAndReadBack("utc") { dir =>
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType)))
      spark.createDataFrame(
        java.util.List.of(Row(1L,
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
            epochMicros / 1000000L, (epochMicros % 1000000L) * 1000L)))), schema)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
  }

  test("normalizeEventTime canonicalizes an in-memory NTZ column (defense in depth)") {
    // production readers disable inferTimestampNTZ at the scan, but a
    // session outside our control (the driver's own smoke SparkSession)
    // may still hand the operators an NTZ column — the cast branch must
    // cover it
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType)))
    val ntz = spark.createDataFrame(
      java.util.List.of(Row(1L,
        java.time.LocalDateTime.ofEpochSecond(
          epochMicros / 1000000L, (epochMicros % 1000000L).toInt * 1000,
          java.time.ZoneOffset.UTC))), schema)
    val got = graft.sources.Tables.normalizeEventTime(ntz)
    assert(got.schema("ts").dataType === TimestampType)
    assert(got.select(unix_micros(col("ts"))).head().getLong(0) === epochMicros)
  }

  test("ingestion is session-TZ-proof: naive µs loads as the same UTC instant") {
    // with inferTimestampNTZ pinned off, a naive µs value copies verbatim
    // into TimestampType's UTC epoch — no session-TZ conversion on read —
    // so a user session running in any timezone sees the same instants
    // (only rendering differs). A TZ-dependent read would silently shift
    // every watermark and epoch emission for non-UTC users.
    val d = "/root/testdata/sf0.001"
    val utc = graft.sources.Tables.events(spark, d)
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val tokyo = graft.sources.Tables.events(spark, d)
        .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
      assert(tokyo === utc,
        s"session TZ changed the loaded instants: $tokyo vs $utc")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("current driver fixtures read canonical through both readers") {
    val df = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType === TimestampType)
    // collect must yield java.sql.Timestamp, not LocalDateTime (the
    // round-8 ScaleUpSpec ClassCastException)
    assert(df.select(col("ts")).head().get(0).isInstanceOf[java.sql.Timestamp])
  }
}
