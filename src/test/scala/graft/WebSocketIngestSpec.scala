package graft

import java.io.{DataInputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.security.MessageDigest
import java.util.Base64

import graft.operators.Ticks
import graft.sources.{WebSocketClient, WebSocketIngest}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** S1's last fidelity delta (round-9 verdict item 4): the reference's tick
  * source is a live WebSocket with subscribe pacing and reconnect
  * (reference: src/gmo/ws-connection.py:99-172). This spec runs a REAL
  * RFC-6455 exchange end-to-end: an in-test ws server (handshake
  * validation, text frames, a fragmented message, a ping, an abrupt
  * mid-stream disconnect, a clean CLOSE) → [[WebSocketIngest]] (subscribe
  * on every connect, fixed-backoff reconnect, atomic spool files) →
  * `readStream.text` micro-batches → the production
  * [[Ticks.fromWireJson]] parse.
  */
class WebSocketIngestSpec extends SparkSpec {

  // ---- a minimal RFC-6455 SERVER (test fixture) --------------------------

  private def acceptToken(key: String): String =
    Base64.getEncoder.encodeToString(MessageDigest.getInstance("SHA-1")
      .digest((key + WebSocketClient.Guid).getBytes(UTF_8)))

  /** Read the client handshake, reply 101 with the computed accept. */
  private def serverHandshake(sock: Socket): (DataInputStream, OutputStream) = {
    val in = new DataInputStream(sock.getInputStream)
    val out = sock.getOutputStream
    val sb = new StringBuilder
    while (!sb.endsWith("\r\n\r\n")) {
      val b = in.read()
      require(b >= 0, "EOF in client handshake")
      sb.append(b.toChar)
    }
    val key = sb.toString.split("\r\n")
      .find(_.toLowerCase.startsWith("sec-websocket-key:"))
      .map(h => h.substring(h.indexOf(':') + 1).trim)
      .getOrElse(fail("client sent no Sec-WebSocket-Key"))
    out.write(("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
      s"Connection: Upgrade\r\nSec-WebSocket-Accept: ${acceptToken(key)}\r\n\r\n")
      .getBytes(UTF_8))
    out.flush()
    (in, out)
  }

  /** Read one client frame (client→server frames are MASKED per §5.1);
    * returns (opcode, payload). */
  private def readClientFrame(in: DataInputStream): (Int, Array[Byte]) = {
    val b0 = in.read(); val b1 = in.read()
    require(b0 >= 0 && b1 >= 0, "EOF reading client frame")
    require((b1 & 0x80) != 0, "client frame not masked (RFC 6455 violation)")
    var len = (b1 & 0x7f).toLong
    if (len == 126) len = ((in.read() & 0xffL) << 8) | (in.read() & 0xffL)
    else if (len == 127) len = in.readLong()
    val mask = new Array[Byte](4); in.readFully(mask)
    val p = new Array[Byte](len.toInt); in.readFully(p)
    var i = 0
    while (i < p.length) { p(i) = (p(i) ^ mask(i % 4)).toByte; i += 1 }
    (b0 & 0x0f, p)
  }

  /** Server→client frame (unmasked). */
  private def frame(op: Int, payload: Array[Byte], fin: Boolean = true): Array[Byte] = {
    val head =
      if (payload.length < 126) Array(((if (fin) 0x80 else 0) | op).toByte, payload.length.toByte)
      else Array(((if (fin) 0x80 else 0) | op).toByte, 126.toByte,
        (payload.length >> 8).toByte, (payload.length & 0xff).toByte)
    head ++ payload
  }
  private def text(s: String, fin: Boolean = true, cont: Boolean = false) =
    frame(if (cont) 0x0 else 0x1, s.getBytes(UTF_8), fin)

  // ---- fixture wire data --------------------------------------------------

  private def tickJson(symbol: String, ts: String, bid: String, ask: String) =
    s"""{"symbol":"$symbol","timestamp":"$ts","bid":"$bid","ask":"$ask"}"""

  test("RFC-6455 end-to-end: handshake, fragments, ping, reconnect, micro-batches") {
    val root = Files.createTempDirectory("graft-ws-").toString
    val spool = s"$root/spool"
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    @volatile var serverErr: Option[Throwable] = None
    @volatile var subscribesSeen = 0

    val srv = new Thread(() => {
      try {
        // ---- connection 1: subscribe, 2 ticks (one fragmented), a ping,
        // then an ABRUPT close mid-stream (no CLOSE frame) → client must
        // reconnect with backoff and re-subscribe
        val s1 = server.accept()
        val (in1, out1) = serverHandshake(s1)
        val (op1, sub1) = readClientFrame(in1)
        assert(op1 === 0x1)
        assert(new String(sub1, UTF_8).contains("\"ticker\""))
        subscribesSeen += 1
        out1.write(text(tickJson("USD_JPY", "2024-01-01T00:00:00.100Z", "151.245", "151.249")))
        // a fragmented message: text frame without FIN + continuation
        val full = tickJson("EUR_JPY", "2024-01-01T00:00:00.250Z", "160.101", "160.110")
        val (h, t) = full.splitAt(20)
        out1.write(text(h, fin = false))
        // RFC 6455 §5.4: control frames MAY be injected between fragments —
        // the client must answer the ping AND keep reassembling
        out1.write(frame(0x9, "hb".getBytes(UTF_8)))
        out1.write(text(t, fin = true, cont = true))
        out1.flush()
        val (opPong, pongP) = readClientFrame(in1) // the pong, echoed payload
        assert(opPong === 0xA && new String(pongP, UTF_8) === "hb")
        s1.close() // abrupt TCP drop — the reference's reconnect trigger

        // ---- connection 2: fresh handshake + re-subscribe, 1 more tick,
        // then a clean CLOSE frame
        val s2 = server.accept()
        val (in2, out2) = serverHandshake(s2)
        val (op2, sub2) = readClientFrame(in2)
        assert(op2 === 0x1 && new String(sub2, UTF_8).contains("\"ticker\""))
        subscribesSeen += 1
        out2.write(text(tickJson("USD_JPY", "2024-01-01T00:00:02.000Z", "151.260", "151.262")))
        out2.write(frame(0x8, Array.emptyByteArray))
        out2.flush()
        readClientFrame(in2) // the echoed CLOSE
        s2.close()
      } catch { case e: Throwable => serverErr = Some(e) }
    })
    srv.setDaemon(true)
    srv.start()

    // ---- the connector: subscribe on every connect, spool 1 msg per file
    // (each spool file = one downstream micro-batch), reconnect budget 3
    val n = WebSocketIngest.run("localhost", port, "/ws/public/v1",
      subscribe = Seq("""{"command":"subscribe","channel":"ticker","symbol":"USD_JPY"}"""),
      spoolDir = spool, maxMessages = 3, maxReconnects = 3,
      backoffMs = 50, subscribePaceMs = 10, spoolBatch = 1)
    srv.join(10000)
    assert(serverErr.isEmpty, s"server thread failed: $serverErr")
    assert(n === 3, s"expected 3 messages through the wire, got $n")
    assert(subscribesSeen === 2, "client did not re-subscribe on reconnect")

    // ---- t-style micro-batch replay of the spool through the PRODUCTION
    // wire parser (one file per trigger = one batch per message)
    val stream = spark.readStream.option("maxFilesPerTrigger", "1").text(spool)
    val q = Ticks.withMid(Ticks.valid(Ticks.fromWireJson(stream)))
      .writeStream.format("memory").queryName("ws_ticks")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 3, s"expected >= 3 non-empty micro-batches, got $batches")

    val rows = spark.sql(
      "SELECT pair, time, bid, ask, round(mid, 6) AS mid FROM ws_ticks")
      .orderBy("time").collect()
    assert(rows.length === 3, rows.mkString("\n"))
    assert(rows.map(_.getString(0)).toSeq === Seq("USD/JPY", "EUR/JPY", "USD/JPY"))
    // the fragmented message reassembled into a complete, parseable tick
    assert(rows(1).getDouble(2) === 160.101 && rows(1).getDouble(3) === 160.110)
    assert(rows(0).getTimestamp(1) === ts("2024-01-01 00:00:00.1"))
    server.close()
  }
}
