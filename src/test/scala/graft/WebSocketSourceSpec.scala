package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.operators.Ticks
import graft.serving.WireReplayServer
import org.apache.spark.sql.streaming.Trigger

/** The direct socket→engine ingest (round-12): `readStream.format
  * ("graft-websocket")` — a DataSourceV2 micro-batch source owning a real
  * RFC-6455 client — driven against the [[WireReplayServer]] fixture.
  * Covers the three contracts the file-spool path already proved:
  * subscribe-on-connect + reconnect-and-resubscribe on an abrupt drop,
  * micro-batch delivery into the production wire parser, and
  * kill/restart durability via the checkpoint-local WAL. */
class WebSocketSourceSpec extends SparkSpec {

  private def tickJson(symbol: String, ts: String, bid: String, ask: String) =
    s"""{"symbol":"$symbol","timestamp":"$ts","bid":"$bid","ask":"$ask"}"""

  private val wire = IndexedSeq(
    tickJson("USD_JPY", "2024-01-01T00:00:00.100Z", "151.245", "151.249"),
    tickJson("EUR_JPY", "2024-01-01T00:00:00.250Z", "160.101", "160.110"),
    tickJson("USD_JPY", "2024-01-01T00:00:01.000Z", "151.250", "151.252"),
    tickJson("EUR_JPY", "2024-01-01T00:00:01.500Z", "160.105", "160.112"),
    tickJson("USD_JPY", "2024-01-01T00:00:02.000Z", "151.260", "151.262"))

  test("socket source: subscribe, abrupt drops, reconnect, exactly the wire set") {
    // sever the TCP stream after every 2 messages — the client must
    // reconnect with backoff, re-subscribe, and resume WITHOUT loss
    val server = new WireReplayServer(wire, dropEvery = 2)
    val port = server.start()
    val ckpt = Files.createTempDirectory("graft-wssrc-").toString
    try {
      val lines = spark.readStream.format("graft-websocket")
        .option("host", "localhost").option("port", port.toString)
        .option("path", "/ws/public/v1")
        .option("subscribe",
          """{"command":"subscribe","channel":"ticker","symbol":"USD_JPY"}""")
        .option("maxMessages", wire.length.toString)
        .option("backoffMs", "50")
        .load()
      val q = Ticks.valid(Ticks.fromWireJson(lines))
        .writeStream.format("memory").queryName("wssrc_ticks")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$ckpt/q")
        .start()
      q.awaitTermination(60000)
      val rows = spark.sql(
        "SELECT pair, time, bid, ask FROM wssrc_ticks ORDER BY time, pair")
        .collect()
      assert(rows.length === wire.length, rows.mkString("\n"))
      assert(rows.map(_.getString(0)).toSeq ===
        Seq("USD/JPY", "EUR/JPY", "USD/JPY", "EUR/JPY", "USD/JPY"))
      assert(rows.head.getDouble(2) === 151.245)
      // 5 messages at 2 per connection = 3 connections, each re-subscribed
      assert(server.subscribesSeen === 3,
        s"expected 3 subscribes (reconnect+resubscribe), got ${server.subscribesSeen}")
    } finally server.stop()
  }

  test("socket source: WAL replays received-but-uncommitted messages across a restart") {
    // phase 1: a clean run commits wire(0..2)
    val first = new WireReplayServer(wire.take(3))
    val p1 = first.start()
    val root = Files.createTempDirectory("graft-wssrc-restart-").toString
    val ckpt = s"$root/ckpt"
    val sink = s"$root/sink"
    def run(port: Int, maxMessages: Int): Unit = {
      val lines = spark.readStream.format("graft-websocket")
        .option("host", "localhost").option("port", port.toString)
        .option("subscribe", """{"command":"subscribe"}""")
        .option("maxMessages", maxMessages.toString)
        .load()
      val q = Ticks.valid(Ticks.fromWireJson(lines))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    try run(p1, 3) finally first.stop()
    assert(spark.read.parquet(sink).count() === 3)

    // the kill: a receiver appends to the WAL the moment a message arrives,
    // BEFORE any batch containing it commits — so a query killed there
    // leaves exactly this state: wire(3) and wire(4) in the WAL, absent
    // from the sink and from Spark's offset log. Seed that state directly
    // (deterministic; a real kill races the micro-batch thread) into the
    // last surviving WAL segment.
    val walDir = Paths.get(ckpt, "sources", "0", "ws-wal")
    val segs = Files.list(walDir).iterator()
    val lastSeg = {
      var acc = List.empty[java.nio.file.Path]
      while (segs.hasNext) { val p = segs.next(); if (p.getFileName.toString.startsWith("seg-")) acc ::= p }
      assert(acc.nonEmpty, "phase-1 WAL segments missing")
      acc.maxBy(_.getFileName.toString)
    }
    Files.write(lastSeg, (wire(3) + "\n" + wire(4) + "\n").getBytes(UTF_8),
      StandardOpenOption.APPEND)

    // phase 2: restart against a server that only has NEW data (it can
    // never re-serve 3/4 — only the WAL can) — the run must emit the two
    // WAL messages exactly once and continue with the live tail. The new
    // endpoint's 1 message + 5 already in the WAL = maxMessages 6.
    val more = IndexedSeq(
      tickJson("USD_JPY", "2024-01-01T00:00:03.000Z", "151.270", "151.272"))
    val second = new WireReplayServer(more)
    val p2 = second.start()
    try run(p2, 6) finally second.stop()

    val got = spark.read.parquet(sink)
      .select("pair", "time", "bid").orderBy("time", "pair").collect()
    assert(got.length === 6, got.mkString("\n"))
    assert(got.map(_.getDouble(2)).toSeq ===
      Seq(151.245, 160.101, 151.25, 160.105, 151.26, 151.27))
  }

  // ---- round-13: commit-time GC + the fan-out valve, driven directly ----

  private def streamOpts(port: Int, extra: (String, String)*) = {
    val m = new java.util.HashMap[String, String]()
    m.put("host", "localhost"); m.put("port", port.toString)
    m.put("subscribe", """{"command":"subscribe"}""")
    extra.foreach { case (k, v) => m.put(k, v) }
    new org.apache.spark.sql.util.CaseInsensitiveStringMap(m)
  }

  private def awaitReceived(s: graft.sources.WebSocketMicroBatchStream,
                            n: Int): Unit = {
    val deadline = System.currentTimeMillis() + 30000
    while (s.bufferedCount < n && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    assert(s.bufferedCount === n, "receiver did not deliver the fixture")
  }

  test("socket source: commit() trims the buffer to O(uncommitted) and GCs WAL segments") {
    val msgs = (0 until 10).map(i => s"""{"i":$i}""")
    val server = new WireReplayServer(msgs)
    val port = server.start()
    val ckpt = Files.createTempDirectory("graft-wssrc-gc-").toString
    try {
      val s1 = new graft.sources.WebSocketMicroBatchStream(
        streamOpts(port, "maxMessages" -> "10", "walSegmentMessages" -> "2"), ckpt)
      try {
        awaitReceived(s1, 10)
        assert(s1.walSegmentStarts === Seq(0L, 2L, 4L, 6L, 8L))
        // micro-batch [0,7) runs and commits
        val batch = s1.planInputPartitions(
          graft.sources.WsOffset(0L), graft.sources.WsOffset(7L))
        assert(batch.map(_.asInstanceOf[graft.sources.WsInputPartition].msgs.length).sum === 7)
        s1.commit(graft.sources.WsOffset(7L))
        // driver state is O(uncommitted): 3 buffered, floor at the commit
        assert(s1.gcFloor === 7L)
        assert(s1.bufferedCount === 3)
        // segments wholly below the commit are gone; the straddler survives
        assert(s1.walSegmentStarts === Seq(6L, 8L))
      } finally s1.stop()

      // restart on the GC'd WAL: only [6,10) survives on disk, and the
      // uncommitted range [7,10) must still replay exactly
      val s2 = new graft.sources.WebSocketMicroBatchStream(
        streamOpts(port, "maxMessages" -> "10", "walSegmentMessages" -> "2"), ckpt)
      try {
        assert(s2.bufferedCount === 4) // the straddling segment re-buffers whole
        val replay = s2.planInputPartitions(
          graft.sources.WsOffset(7L), graft.sources.WsOffset(10L))
          .flatMap(_.asInstanceOf[graft.sources.WsInputPartition].msgs)
        assert(replay.toSeq === msgs.slice(7, 10))
        // an offset below the GC floor fails loudly, never silently misreads
        intercept[IllegalArgumentException] {
          s2.planInputPartitions(
            graft.sources.WsOffset(5L), graft.sources.WsOffset(10L))
        }
      } finally s2.stop()
    } finally server.stop()
  }

  // ---- round-13: WAL-replay determinism as a ScalaCheck property ---------

  test("socket source: output invariant over random kill x commit x reconnect x segmentation points") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.{forAll, propBoolean}

    // one simulated run of Spark's offset protocol against a live stream:
    // drain [from, to) in the given micro-batch splits, committing after
    // each batch exactly as the engine does
    def drain(s: graft.sources.WebSocketMicroBatchStream,
              from: Long, to: Long, splits: Seq[Long]): Seq[String] = {
      if (from >= to) return Nil
      val bounds = (from +: splits.filter(b => b > from && b < to) :+ to).distinct.sorted
      bounds.sliding(2).flatMap { case Seq(a, b) =>
        val out = s.planInputPartitions(
          graft.sources.WsOffset(a), graft.sources.WsOffset(b))
          .flatMap(_.asInstanceOf[graft.sources.WsInputPartition].msgs)
        s.commit(graft.sources.WsOffset(b))
        out
      }.toSeq
    }

    val params = for {
      n <- Gen.chooseNum(6, 20)               // wire length
      drop <- Gen.oneOf(Int.MaxValue, 1, 2, 3) // sever every k frames
      walSeg <- Gen.chooseNum(1, 5)            // GC granularity
      k1 <- Gen.chooseNum(1, n)                // kill after k1 received
      c <- Gen.chooseNum(0, k1)                // committed boundary at kill
      splits <- Gen.listOfN(4, Gen.chooseNum(1L, n.toLong - 1)) // batch bounds
    } yield (n, drop, walSeg, k1, c, splits)

    val prop = forAll(params) { case (n, drop, walSeg, k1, c, splits) =>
      val msgs = (0 until n).map(i =>
        tickJson("USD_JPY", f"2024-01-01T00:00:$i%02d.000Z", s"151.$i", s"152.$i"))
      val ckpt = Files.createTempDirectory("graft-wssrc-prop-").toString
      def opts(port: Int, maxMessages: Int) = streamOpts(port,
        "maxMessages" -> maxMessages.toString, "backoffMs" -> "10",
        "walSegmentMessages" -> walSeg.toString)

      // phase 1: receive exactly k1, commit through c, then the kill.
      // the phase-1 server holds ONLY the first k1 messages so the stop
      // point can never race frames into an unread TCP buffer
      val srv1 = new WireReplayServer(msgs.take(k1), dropEvery = drop)
      val p1 = srv1.start()
      val s1 = new graft.sources.WebSocketMicroBatchStream(opts(p1, k1), ckpt)
      val out1 =
        try { awaitReceived(s1, k1); drain(s1, 0L, c.toLong, splits.map(_ min c.toLong)) }
        finally { s1.stop(); srv1.stop() }

      // phase 2: restart on the same checkpoint; the server has only NEW
      // data — [c, k1) must come back from the GC'd segmented WAL alone
      val srv2 = new WireReplayServer(msgs.drop(k1), dropEvery = drop)
      val p2 = srv2.start()
      val s2 = new graft.sources.WebSocketMicroBatchStream(opts(p2, n), ckpt)
      val out2 =
        try {
          val deadline = System.currentTimeMillis() + 30000
          while (s2.gcFloor + s2.bufferedCount < n &&
            System.currentTimeMillis() < deadline) Thread.sleep(10)
          drain(s2, c.toLong, n.toLong, splits)
        } finally { s2.stop(); srv2.stop() }

      ((out1 ++ out2) == msgs) :|
        s"n=$n drop=$drop walSeg=$walSeg kill=$k1 commit=$c splits=$splits " +
        s"got=${(out1 ++ out2).length} rows"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("socket source: minPartitions fans a micro-batch into ordered contiguous chunks") {
    val msgs = (0 until 10).map(i => s"""{"i":$i}""")
    val server = new WireReplayServer(msgs)
    val port = server.start()
    val ckpt = Files.createTempDirectory("graft-wssrc-fan-").toString
    try {
      val s1 = new graft.sources.WebSocketMicroBatchStream(
        streamOpts(port, "maxMessages" -> "10", "minPartitions" -> "3"), ckpt)
      try {
        awaitReceived(s1, 10)
        val parts = s1.planInputPartitions(
          graft.sources.WsOffset(0L), graft.sources.WsOffset(10L))
          .map(_.asInstanceOf[graft.sources.WsInputPartition].msgs.toSeq)
        // the valve: a CPU-heavy parse stage downstream runs one task per
        // chunk (narrow 1:1), so source width IS the parse width
        assert(parts.length === 3)
        assert(parts.flatten.toSeq === msgs)
        assert(parts.forall(_.nonEmpty))
      } finally s1.stop()
    } finally server.stop()
  }
}
