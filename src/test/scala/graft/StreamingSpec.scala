package graft

import java.nio.file.Files

import graft.operators.{Ohlc, Ticks}
import graft.streaming.{Streams, TickRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming layer (T1/T2/T4/T5): every op is checked for
  * equivalence against its batch twin on the same data — the streaming path
  * must be a latency refinement, not a different answer. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tick(p: String, t: String, b: Double): TickRow =
    TickRow(p, ts(t), b, b + 0.01)

  private val ticks = Seq(
    tick("X", "2024-01-01 00:00:05.100", 10.0),
    tick("X", "2024-01-01 00:00:05.700", 11.0), // same second, loses dedup
    tick("X", "2024-01-01 00:00:30.000", 12.0),
    tick("X", "2024-01-01 00:00:50.000", 8.0),
    tick("X", "2024-01-01 00:01:10.000", 9.0),
    tick("Y", "2024-01-01 00:00:59.000", 5.0),
    tick("Y", "2024-01-01 00:01:02.000", 6.0))

  // watermark-advancing sentinel far past all real data
  private val flush = Seq(tick("X", "2024-01-01 09:00:00", 1.0),
    tick("Y", "2024-01-01 09:00:00", 1.0))

  test("S1: parseTicks decodes valid messages, drops malformed and invalid") {
    val raw = Seq(
      """{"symbol":"USD/JPY","timestamp":"2024-01-01T00:00:05.000Z","bid":"104.5","ask":"104.52"}""",
      """{"symbol":"EUR/JPY","timestamp":"2024-01-01T00:00:06.000Z","bid":"160.1","ask":"160.0"}""", // bid > ask
      """{"symbol":"USD/JPY","timestamp":"bogus","bid":"1","ask":"2"}""", // bad ts
      """not json at all""",
      """{"channel":"heartbeat"}""" // non-ticker message
    ).toDF("value")
    val out = Streams.parseTicks(raw).collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("pair") === "USD/JPY")
    assert(out(0).getAs[Double]("bid") === 104.5)
    assert(out(0).getAs[Double]("ask") === 104.52)
  }

  test("T1: streaming dedup == batch dedupSecond on in-order data") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TickRow]
    val q = Streams.dedupTicks(in.toDF()).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    in.addData(ticks)
    in.addData(flush)
    q.processAllAvailable(); q.stop()

    val got = spark.table("dedup_out")
      .filter(col("time") < ts("2024-01-01 09:00:00"))
      .select("pair", "time", "bid", "ask")
      .orderBy("pair", "time").collect().toSeq
    val exp = Ticks.dedupSecond(
        ticks.toDF().withColumn("seq", monotonically_increasing_id()))
      .select("pair", "time", "bid", "ask")
      .orderBy("pair", "time").collect().toSeq
    assert(got === exp)
  }

  test("T7: stream-stream window join == batch join per minute bucket") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[TickRow]
    val rIn = MemoryStream[TickRow]
    val q = Streams.windowJoin(lIn.toDF(), rIn.toDF()).writeStream
      .format("memory").queryName("wjoin_out").outputMode("append").start()
    // partners split ACROSS batches: left minute-0 rows arrive in batch 1,
    // their right partners only in batch 2 — state must hold the window
    lIn.addData(tick("X", "2024-01-01 00:00:05", 10.0),
      tick("X", "2024-01-01 00:00:30", 12.0))
    rIn.addData(tick("Y", "2024-01-01 00:01:02", 6.0))
    q.processAllAvailable()
    lIn.addData(tick("X", "2024-01-01 00:01:10", 9.0))
    rIn.addData(tick("Y", "2024-01-01 00:00:59", 5.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("wjoin_out")
      .select("time", "l_bid", "r_bid")
      .orderBy("time", "l_bid").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("time"),
        r.getAs[Double]("l_bid"), r.getAs[Double]("r_bid"))).toSeq
    // batch truth: minute 0 has l={10,12} × r={5}; minute 1 has l={9} × r={6}
    assert(got === Seq(
      (ts("2024-01-01 00:00:00"), 10.0, 5.0),
      (ts("2024-01-01 00:00:00"), 12.0, 5.0),
      (ts("2024-01-01 00:01:00"), 9.0, 6.0)))
  }

  /** Batch truth for the window-equality join: minute buckets × inner join. */
  private def batchWindowJoin(l: Seq[TickRow], r: Seq[TickRow]): Set[(java.sql.Timestamp, Double, Double)] = {
    val lw = l.toDF().select(window(col("time"), "1 minute").as("w"), col("bid").as("l_bid"))
    val rw = r.toDF().select(window(col("time"), "1 minute").as("w"), col("bid").as("r_bid"))
    lw.join(rw, "w").select(col("w.start"), col("l_bid"), col("r_bid"))
      .collect().map(x => (x.getTimestamp(0), x.getDouble(1), x.getDouble(2))).toSet
  }

  test("T7: shuffled + late-within-watermark replay still equals the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val left = Seq(tick("X", "2024-01-01 00:00:10", 1.0), tick("X", "2024-01-01 00:00:45", 2.0),
      tick("X", "2024-01-01 00:01:20", 3.0), tick("X", "2024-01-01 00:02:15", 4.0))
    val right = Seq(tick("Y", "2024-01-01 00:00:30", 5.0), tick("Y", "2024-01-01 00:01:05", 6.0),
      tick("Y", "2024-01-01 00:01:55", 7.0), tick("Y", "2024-01-01 00:02:40", 8.0))
    val lIn = MemoryStream[TickRow]
    val rIn = MemoryStream[TickRow]
    val q = Streams.windowJoin(lIn.toDF(), rIn.toDF()).writeStream
      .format("memory").queryName("wjoin_ooo").outputMode("append").start()
    // batch 1 delivers LATER rows first (fixed scramble, not time order);
    // global watermark after it = min(02:15, 01:55) − 60s = 00:55 — below
    // every delivered window's end, so nothing is evicted early
    lIn.addData(left(3), left(1))
    rIn.addData(right(2))
    q.processAllAvailable()
    // batch 2 delivers the minute-0 stragglers LATE but within the
    // watermark (window end 01:00 ≥ 00:55) plus the rest, again shuffled
    lIn.addData(left(0), left(2))
    rIn.addData(right(3), right(0), right(1))
    q.processAllAvailable()
    lIn.addData(flush.head); rIn.addData(flush.last)
    q.processAllAvailable(); q.stop()
    val got = spark.table("wjoin_ooo")
      .filter(col("time") < ts("2024-01-01 09:00:00"))
      .collect().map(r => (r.getAs[java.sql.Timestamp]("time"),
        r.getAs[Double]("l_bid"), r.getAs[Double]("r_bid"))).toSet
    assert(got === batchWindowJoin(left, right))
  }

  test("T7: a row beyond the watermark is dropped (documented divergence from batch)") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[TickRow]
    val rIn = MemoryStream[TickRow]
    val q = Streams.windowJoin(lIn.toDF(), rIn.toDF()).writeStream
      .format("memory").queryName("wjoin_late").outputMode("append").start()
    // batch 1: a minute-0 left row plus minute-10 rows on BOTH sides —
    // global watermark advances to 09:00, evicting the minute-0 window
    lIn.addData(tick("X", "2024-01-01 00:00:10", 1.0), tick("X", "2024-01-01 00:10:00", 99.0))
    rIn.addData(tick("Y", "2024-01-01 00:10:00", 88.0))
    q.processAllAvailable()
    // batch 2: the minute-0 right partner arrives BEYOND the watermark
    // (window end 00:01 < 09:00) — Structured Streaming drops it, so the
    // (1.0, 5.0) pair a batch join would produce never appears
    rIn.addData(tick("Y", "2024-01-01 00:00:30", 5.0))
    q.processAllAvailable()
    lIn.addData(flush.head); rIn.addData(flush.last)
    q.processAllAvailable(); q.stop()
    val got = spark.table("wjoin_late")
      .filter(col("time") < ts("2024-01-01 09:00:00"))
      .collect().map(r => (r.getAs[java.sql.Timestamp]("time"),
        r.getAs[Double]("l_bid"), r.getAs[Double]("r_bid"))).toSet
    assert(got === Set((ts("2024-01-01 00:10:00"), 99.0, 88.0)))
  }

  test("T2: streaming 1m OHLC == batch ohlcBase on deduped ticks") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TickRow]
    val q = Streams.ohlc1m(in.toDF()).writeStream
      .format("memory").queryName("ohlc_out").outputMode("append").start()
    in.addData(ticks)
    in.addData(flush)
    q.processAllAvailable(); q.stop()

    val got = spark.table("ohlc_out")
      .filter(col("time") < ts("2024-01-01 09:00:00"))
      .orderBy("pair", "time").collect().toSeq
    val exp = Ohlc.ohlcBase(ticks.toDF())
      .select("pair", "time", "open", "high", "low", "close")
      .orderBy("pair", "time").collect().toSeq
    assert(got === exp)
  }

  test("T5: latest-value state emits the per-pair maximum-time tick") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TickRow]
    val q = Streams.latestPerPair(in.toDS()).writeStream
      .format("memory").queryName("latest_out").outputMode("update").start()
    in.addData(ticks.take(4)) // batch 1: only X
    q.processAllAvailable()
    in.addData(ticks.drop(4)) // batch 2: X update + Y
    q.processAllAvailable(); q.stop()

    // last update emitted per pair must be the overall latest tick
    val got = spark.table("latest_out")
      .groupBy("pair").agg(max_by(struct($"time", $"bid"), $"time").as("t"))
      .select($"pair", $"t.time".as("time"), $"t.bid".as("bid"))
      .orderBy("pair").collect()
    assert(got.map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2))).toSeq ===
      Seq(("X", ts("2024-01-01 00:01:10"), 9.0), ("Y", ts("2024-01-01 00:01:02"), 6.0)))
  }

  test("T5+TTL: idle pair's state is evicted by event time; proof via re-seed") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TickRow]
    // TTL 60 s of EVENT time: X@00:01:10 times out once the watermark
    // (driven by Y's ticks) passes 00:02:10
    val q = Streams.latestPerPairTtl(in.toDS(), ttlMs = 60000L)
      .writeStream.format("memory").queryName("latest_ttl_out")
      .outputMode("update").start()
    try {
      in.addData(tick("X", "2024-01-01 00:01:10", 9.0))
      q.processAllAvailable() // wm after batch: 00:01:10
      in.addData(tick("Y", "2024-01-01 00:10:00", 5.0))
      q.processAllAvailable() // wm advances to 00:10:00 at batch end
      in.addData(tick("Y", "2024-01-01 00:11:00", 6.0))
      q.processAllAvailable() // X's 00:02:10 deadline < wm → state evicted
      // (no intermediate assertion: once the watermark advances, Spark may
      // run the eviction in an eager follow-up timeout batch — the exact
      // batch it lands in is an implementation detail)
      val after = q.lastProgress.stateOperators.apply(0).numRowsTotal
      assert(after === 1, s"idle X must be evicted from state, got $after")
    } finally q.stop()
    // emissions unaffected: X's latest stays the one tick it ever sent
    val lastX = spark.table("latest_ttl_out").filter($"pair" === "X")
      .orderBy($"time").collect().map(r => (r.getTimestamp(1), r.getDouble(2)))
    assert(lastX.toSeq === Seq((ts("2024-01-01 00:01:10"), 9.0)))
  }

  test("T1+T2 chained: dedup then windowed OHLC in ONE streaming query") {
    // two stateful operators back to back (Spark 3.4+ watermark
    // propagation); result must equal the batch spine on the same data
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TickRow]
    val q = Streams.dedupThenOhlc(in.toDF()).writeStream
      .format("memory").queryName("chain_out").outputMode("append").start()
    in.addData(ticks)
    in.addData(flush)
    q.processAllAvailable(); q.stop()

    val got = spark.table("chain_out")
      .filter(col("time") < ts("2024-01-01 09:00:00"))
      .orderBy("pair", "time").collect().toSeq
    val exp = Ohlc.ohlcBase(Ticks.dedupSecond(
        ticks.toDF().withColumn("seq", monotonically_increasing_id())))
      .select("pair", "time", "open", "high", "low", "close")
      .orderBy("pair", "time").collect().toSeq
    assert(got === exp)
  }

  test("T4: relay sink is idempotent across redelivery") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("relay").toString
    val sink = s"$dir/sink"

    val in1 = MemoryStream[TickRow]
    in1.addData(ticks.take(5))
    Streams.relayToParquet(in1.toDF(), sink, s"$dir/cp1").awaitTermination()

    // second run redelivers overlapping rows (fresh checkpoint = full replay)
    val in2 = MemoryStream[TickRow]
    in2.addData(ticks) // includes the 5 already delivered
    Streams.relayToParquet(in2.toDF(), sink, s"$dir/cp2").awaitTermination()

    val got = spark.read.parquet(sink)
    assert(got.count() === ticks.size) // no duplicates from redelivery
    assert(got.groupBy("pair", "time").count().filter($"count" > 1).count() === 0)
  }
}
