package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the append-mode emission rule at the EXACT watermark boundary: a
  * window (or merged session) whose end equals the current watermark is
  * EMITTED — Spark evicts on `end <= watermark`, not strict `<`. The t2 /
  * t6 gate oracles restate this as `end <= max_event_time − delay`; if
  * Spark's rule ever drifted to strict inequality these tests fail before
  * an sf-dependent one-row oracle mismatch can (the exact failure mode the
  * round-8 session-gap tie exposed for the MERGE boundary). */
class WatermarkBoundarySpec extends SparkSpec {
  import spark.implicits._

  test("tumbling window whose end == watermark is emitted (<= eviction)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, java.sql.Timestamp, Double)]
    val agg = in.toDF().toDF("pair", "time", "bid")
      .withWatermark("time", "1 minute")
      .groupBy(col("pair"), window(col("time"), "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("pair"), col("window.end").as("wend"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_tumbling")
      .outputMode("append").start()
    in.addData(Seq(("A", ts("2024-01-01 00:00:30"), 1.0)))
    q.processAllAvailable() // watermark still before the window end
    assert(spark.table("wm_tumbling").isEmpty)
    in.addData(Seq(("A", ts("2024-01-01 00:02:00"), 1.0)))
    q.processAllAvailable()
    // max event 00:02:00 → watermark 00:01:00 == end of window [00:00, 00:01)
    val got = spark.table("wm_tumbling").collect().map(_.getTimestamp(1)).toSeq
    assert(got === Seq(ts("2024-01-01 00:01:00")),
      s"window ending exactly at the watermark must be emitted, got $got")
    q.stop()
  }

  test("session whose end == watermark is emitted (<= eviction)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = Streams.sessionizeStream(
        in.toDF().toDF("user_id", "ts", "value"),
        gap = "30 minutes", watermark = "30 minutes")
      .writeStream.format("memory").queryName("wm_session")
      .outputMode("append").start()
    in.addData(Seq((1L, ts("2024-01-01 00:00:00"), 1.0)))
    q.processAllAvailable()
    assert(spark.table("wm_session").isEmpty)
    // next event is exactly gap + delay later: it does NOT merge (strict->
    // break is > gap away) and pushes the watermark to exactly the first
    // session's end (00:00 + 30 m gap = 00:30 = 01:00 − 30 m delay)
    in.addData(Seq((1L, ts("2024-01-01 01:00:00"), 1.0)))
    q.processAllAvailable()
    val got = spark.table("wm_session").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
    assert(got === Seq((1L, ts("2024-01-01 00:00:00"))),
      s"session ending exactly at the watermark must be emitted, got $got")
    q.stop()
  }
}
