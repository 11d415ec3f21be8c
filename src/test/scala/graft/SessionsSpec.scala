package graft

import graft.operators.{Sessions, Sketches}
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    (1L, ts("2024-01-01 00:00:00"), 10.0),
    (1L, ts("2024-01-01 00:10:00"), 20.0), // same session (gap 10m < 30m)
    (1L, ts("2024-01-01 01:00:00"), 30.0), // new session (gap 50m)
    (1L, ts("2024-01-01 01:05:00"), 40.0),
    (2L, ts("2024-01-01 00:00:00"), 5.0),  // separate user
    (2L, ts("2024-01-01 00:30:00"), 6.0))  // exact-gap tie: MERGES (not a split)
    .toDF("user_id", "ts", "value")

  test("gap-based sessionization splits exactly at the threshold") {
    val got = Sessions.sessionize(events, gapSeconds = 1800)
      .orderBy("user_id", "session_no").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq === Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 2L, 30.0),
      (1L, 2L, ts("2024-01-01 01:00:00"), 2L, 70.0),
      (2L, 1L, ts("2024-01-01 00:00:00"), 2L, 11.0)))
  }

  test("a gap of exactly the threshold still merges (session_window parity)") {
    // Spark's session_window merges an event landing exactly `gap` after
    // its predecessor (windows [t, t+gap] touch); the batch operator must
    // use the same strict-> break or batch and streaming disagree on ties —
    // found in the wild at sf0.1 (two events exactly 1800 s apart).
    val e = Seq((1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:30:00"), 1.0)).toDF("user_id", "ts", "value")
    assert(Sessions.sessionize(e, 1800).count() === 1)
    // one microsecond past the gap does split
    val e2 = Seq((1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, new java.sql.Timestamp(ts("2024-01-01 00:30:00").getTime + 1), 1.0))
      .toDF("user_id", "ts", "value")
    assert(Sessions.sessionize(e2, 1800).count() === 2)
  }

  test("streaming session_window matches batch sessions on gap-closed data") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = Streams.sessionizeStream(
        in.toDF().toDF("user_id", "ts", "value"), gap = "30 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    in.addData(events.as[(Long, java.sql.Timestamp, Double)].collect().toSeq)
    in.addData(Seq((1L, ts("2024-01-01 09:00:00"), 0.0),
      (2L, ts("2024-01-01 09:00:00"), 0.0))) // watermark flush
    q.processAllAvailable(); q.stop()

    val got = spark.table("sess_out")
      .filter(col("session_start") < ts("2024-01-01 09:00:00"))
      .select("user_id", "session_start", "n_events", "total_value")
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val exp = Sessions.sessionize(events, 1800)
      .select($"user_id", $"session_start", $"n_events", $"total_value")
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === exp.toSeq)
  }

  test("HLL distinct counts stay within the error bound") {
    val rnd = new scala.util.Random(13)
    val big = (1 to 20000).map { _ =>
      (s"t${rnd.nextInt(3)}", rnd.nextInt(1000).toLong, rnd.nextDouble())
    }.toDF("event_type", "user_id", "value")
    Sketches.distinctUsersPerType(big, rsd = 0.05).collect().foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val approx = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(approx - exact) / exact < 0.15,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("approximate quantiles bracket the exact median") {
    val vals = (1 to 10001).map(i => ("t", 0L, i.toDouble))
      .toDF("event_type", "user_id", "value")
    val q = Sketches.valueQuantiles(vals, Seq(0.5)).collect()(0)
      .getAs[scala.collection.Seq[Double]]("quantiles")
    assert(math.abs(q.head - 5001.0) < 100.0)
  }
}
