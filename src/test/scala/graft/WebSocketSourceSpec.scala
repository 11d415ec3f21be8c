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
    // (deterministic; a real kill races the micro-batch thread).
    val wal = Paths.get(ckpt, "sources", "0", "ws-wal.txt")
    assert(Files.exists(wal), "phase-1 WAL missing")
    Files.write(wal, (wire(3) + "\n" + wire(4) + "\n").getBytes(UTF_8),
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
}
