package graft.sources

import java.io.{BufferedOutputStream, DataInputStream, EOFException, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import java.util.Base64

/** Minimal RFC-6455 WebSocket CLIENT over a plain `java.net.Socket` —
  * the protocol framing behind the reference's tick source
  * (reference: src/gmo/ws-connection.py:99-172 uses the `websocket`
  * library against a wss endpoint; the framing itself is the public
  * RFC 6455 spec, re-implemented here with zero dependencies).
  *
  * Scope (a data-plane client, not a general library):
  *  - opening handshake with `Sec-WebSocket-Accept` validation
  *    (base64(SHA1(key + RFC-6455 GUID)));
  *  - text frames incl. fragmentation (opcode 0x1 + 0x0 continuations);
  *  - control frames: PING answered with PONG in-stream, CLOSE echoed
  *    then surfaced as end-of-stream (`readMessage` → None);
  *  - client→server frames masked (MUST per §5.1), server→client frames
  *    accepted masked or not;
  *  - frame-size cap so a hostile server cannot OOM the ingest task.
  *
  * TLS termination is out of scope (production fronts the socket with a
  * TLS tunnel or a Kafka hop; the framing above it is identical).
  */
final class WebSocketClient(host: String, port: Int, path: String = "/",
                            maxFrameBytes: Int = 1 << 20) {

  private[this] val rng = new java.security.SecureRandom()
  private[this] var sock: Socket = _
  private[this] var in: DataInputStream = _
  private[this] var out: OutputStream = _

  /** Open the TCP connection and perform the RFC 6455 §4 handshake;
    * throws on any deviation (non-101 status, bad accept token). */
  def connect(): Unit = {
    sock = new Socket(host, port)
    in = new DataInputStream(sock.getInputStream)
    out = new BufferedOutputStream(sock.getOutputStream)
    val keyBytes = new Array[Byte](16)
    rng.nextBytes(keyBytes)
    val key = Base64.getEncoder.encodeToString(keyBytes)
    val req = s"GET $path HTTP/1.1\r\nHost: $host:$port\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Key: $key\r\nSec-WebSocket-Version: 13\r\n\r\n"
    out.write(req.getBytes(UTF_8)); out.flush()
    val headers = readHttpHeaders()
    require(headers.headOption.exists(_.contains(" 101")),
      s"handshake rejected: ${headers.headOption.getOrElse("<EOF>")}")
    val accept = headers.collectFirst {
      case h if h.toLowerCase.startsWith("sec-websocket-accept:") =>
        h.substring(h.indexOf(':') + 1).trim
    }.getOrElse(throw new IllegalStateException("no Sec-WebSocket-Accept header"))
    val expected = Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1")
        .digest((key + WebSocketClient.Guid).getBytes(UTF_8)))
    require(accept == expected, s"bad Sec-WebSocket-Accept: got $accept")
  }

  private def readHttpHeaders(): List[String] = {
    val sb = new StringBuilder
    while (!sb.endsWith("\r\n\r\n")) {
      val b = in.read()
      if (b < 0) throw new EOFException("EOF during handshake")
      sb.append(b.toChar)
      require(sb.length <= 16384, "handshake response too large")
    }
    sb.toString.split("\r\n").toList
  }

  /** Next complete TEXT message, transparently answering pings and
    * reassembling fragments; None once the peer closes (a CLOSE frame is
    * echoed back first, per §5.5.1) or the TCP stream ends. */
  def readMessage(): Option[String] = {
    val frag = new java.io.ByteArrayOutputStream()
    var inText = false
    try {
      while (true) {
        val b0 = in.read()
        if (b0 < 0) return None
        val fin = (b0 & 0x80) != 0
        val op = b0 & 0x0f
        val b1 = in.read()
        if (b1 < 0) return None
        val masked = (b1 & 0x80) != 0
        var len: Long = (b1 & 0x7f).toLong
        if (len == 126) len = ((in.read() & 0xffL) << 8) | (in.read() & 0xffL)
        else if (len == 127) len = in.readLong()
        require(len >= 0 && len <= maxFrameBytes, s"frame too large: $len")
        val mask = if (masked) { val m = new Array[Byte](4); in.readFully(m); m }
                   else null
        val payload = new Array[Byte](len.toInt)
        in.readFully(payload)
        if (masked) {
          var i = 0
          while (i < payload.length) {
            payload(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1
          }
        }
        op match {
          case 0x1 => // text
            if (fin) return Some(new String(payload, UTF_8))
            inText = true; frag.reset(); frag.write(payload)
          case 0x0 => // continuation
            frag.write(payload)
            if (fin && inText) return Some(new String(frag.toByteArray, UTF_8))
          case 0x8 => // close: echo and end the stream
            try sendFrame(0x8, payload) catch { case _: Exception => () }
            return None
          case 0x9 => sendFrame(0xA, payload) // ping → pong, same payload
          case _ => () // pong / binary / reserved: skip
        }
      }
      None
    } catch { case _: EOFException => None }
  }

  /** Send one masked TEXT frame (the subscribe command path —
    * reference: ws-connection.py:121-128). */
  def send(text: String): Unit = sendFrame(0x1, text.getBytes(UTF_8))

  private def sendFrame(op: Int, payload: Array[Byte]): Unit = synchronized {
    out.write(0x80 | op)
    val n = payload.length
    if (n < 126) out.write(0x80 | n)
    else if (n < 65536) { out.write(0x80 | 126); out.write(n >> 8); out.write(n & 0xff) }
    else {
      out.write(0x80 | 127)
      var i = 7
      while (i >= 0) { out.write(((n.toLong >>> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    val mask = new Array[Byte](4)
    rng.nextBytes(mask)
    out.write(mask)
    val m = new Array[Byte](n)
    var i = 0
    while (i < n) { m(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1 }
    out.write(m)
    out.flush()
  }

  def close(): Unit = {
    try sendFrame(0x8, Array.emptyByteArray) catch { case _: Exception => () }
    try sock.close() catch { case _: Exception => () }
  }
}

object WebSocketClient {
  /** RFC 6455 §1.3 handshake GUID (a public protocol constant). */
  val Guid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
}

/** S1 connector: drive a [[WebSocketClient]] against a live endpoint and
  * spool received text messages into line files that a
  * `spark.readStream.text(spoolDir)` turns into micro-batches feeding
  * [[graft.operators.Ticks.fromWireJson]] — the file hop is the
  * single-process stand-in for the Kafka topic a production deployment
  * would put between the connector and Spark (the framing, subscribe
  * pacing and reconnect policy are the part the reference implements;
  * reference: src/gmo/ws-connection.py:14-16,121-128,168-172).
  *
  * Faithful behaviors:
  *  - subscribe commands sent on (re)connect with `subscribePaceMs`
  *    between them (the reference's SUBSCRIBE_INTERVAL_SECONDS rate-limit
  *    guard);
  *  - on a dropped/closed connection: reconnect after a fixed
  *    `backoffMs` (the reference's RECONNECT_BACKOFF_SECONDS loop),
  *    re-subscribing each time, up to `maxReconnects`;
  *  - spool files are written atomically (temp file + move) so the file
  *    source never reads a half-written batch.
  */
object WebSocketIngest {

  /** Run until `maxMessages` messages are spooled or the reconnect budget
    * is exhausted; returns the number of messages received. Each batch of
    * up to `spoolBatch` messages becomes one spool file = one downstream
    * micro-batch. */
  def run(host: String, port: Int, path: String, subscribe: Seq[String],
          spoolDir: String, maxMessages: Int, maxReconnects: Int = 5,
          backoffMs: Long = 100, subscribePaceMs: Long = 0,
          spoolBatch: Int = 100): Int = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    var received = 0
    var reconnects = 0
    var fileNo = 0
    val batch = new scala.collection.mutable.ArrayBuffer[String]
    def flush(): Unit = if (batch.nonEmpty) {
      fileNo += 1
      writeAtomic(dir, f"spool-$fileNo%05d.txt", batch.toSeq)
      batch.clear()
    }
    var more = true
    while (more && received < maxMessages && reconnects <= maxReconnects) {
      val client = new WebSocketClient(host, port, path)
      try {
        client.connect()
        subscribe.foreach { s =>
          client.send(s)
          if (subscribePaceMs > 0) Thread.sleep(subscribePaceMs)
        }
        var msg = client.readMessage()
        while (msg.isDefined && received < maxMessages) {
          batch += msg.get
          received += 1
          if (batch.size >= spoolBatch) flush()
          if (received < maxMessages) msg = client.readMessage()
        }
        if (msg.isEmpty && received < maxMessages) {
          // peer closed mid-stream: reconnect after the fixed backoff
          reconnects += 1
          if (reconnects <= maxReconnects) Thread.sleep(backoffMs)
        } else more = false
      } catch {
        case _: Exception =>
          reconnects += 1
          if (reconnects <= maxReconnects) Thread.sleep(backoffMs)
      } finally {
        flush()
        client.close()
      }
    }
    received
  }

  private def writeAtomic(dir: Path, name: String, lines: Seq[String]): Unit = {
    val tmp = dir.resolve(name + ".tmp")
    Files.write(tmp, lines.mkString("", "\n", "\n").getBytes(UTF_8))
    Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }
}
