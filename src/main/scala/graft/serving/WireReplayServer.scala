package graft.serving

import java.io.DataInputStream
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import graft.sources.WebSocketClient

/** RFC-6455 replay fixture: a WebSocket SERVER that streams a fixed
  * message sequence to each subscriber — the stand-in for the reference's
  * live tick endpoint (src/gmo/ws-connection.py connects OUT to one of
  * these) used by the `u4d_socket_ingest` gate and the source specs.
  *
  * Faithful to the upstream contract the ingest relies on:
  *  - RFC 6455 §4 server handshake (accept token from the client key);
  *  - waits for ONE subscribe command before streaming (the reference
  *    endpoint only pushes after a subscribe, ws-connection.py:121-128);
  *  - a SHARED cursor across connections: a reconnecting client resumes
  *    at the first unsent message (the ingest's reconnect proof needs the
  *    stream to continue, not restart);
  *  - optional `dropEvery`: abruptly severs the TCP connection after
  *    every N messages (no CLOSE frame) — the reconnect trigger;
  *  - clean CLOSE frame once the sequence is exhausted.
  *
  * Driver-side test plumbing, not a data-plane component: the message
  * sequence is bounded by construction (the gate caps it). */
final class WireReplayServer(messages: IndexedSeq[String], port: Int = 0,
                             dropEvery: Int = Int.MaxValue) {

  private val cursor = new AtomicInteger(0)
  // indices claimed from the cursor whose send FAILED: pushed here so any
  // later connection re-serves them. A plain CAS rollback is lossy when
  // connections overlap (a racing thread that already advanced the cursor
  // past i+1 makes the rollback no-op and message i vanishes, stalling an
  // AvailableNow drain that expects the full set); a reclaim queue never
  // drops an index no matter how claims interleave.
  private val orphans = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
  // indices claimed but not yet written-or-parked: a connection must not
  // send the clean CLOSE while another connection's claimed index is
  // in flight and about to fail into the orphan queue — that client
  // would stop reconnecting and the message would never be served
  private val inflight = new AtomicInteger(0)
  private val subs = new AtomicInteger(0)
  private val running = new AtomicBoolean(false)
  private var server: ServerSocket = _
  private var acceptor: Thread = _

  def subscribesSeen: Int = subs.get()

  /** Start accepting; returns the bound port. */
  def start(): Int = {
    server = new ServerSocket(port)
    running.set(true)
    acceptor = new Thread(() => {
      while (running.get()) {
        try {
          val s = server.accept()
          val t = new Thread(() => handle(s), s"wire-replay-${s.getPort}")
          t.setDaemon(true)
          t.start()
        } catch { case _: SocketException => () /* closed */ }
      }
    }, "wire-replay-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    server.getLocalPort
  }

  def stop(): Unit = {
    running.set(false)
    if (server != null) server.close()
  }

  private def handle(sock: Socket): Unit = {
    try {
      val in = new DataInputStream(sock.getInputStream)
      val out = sock.getOutputStream
      // §4 handshake
      val sb = new StringBuilder
      while (!sb.endsWith("\r\n\r\n")) {
        val b = in.read()
        if (b < 0) return
        sb.append(b.toChar)
      }
      val key = sb.toString.split("\r\n")
        .find(_.toLowerCase.startsWith("sec-websocket-key:"))
        .map(h => h.substring(h.indexOf(':') + 1).trim)
        .getOrElse(return)
      val accept = Base64.getEncoder.encodeToString(
        MessageDigest.getInstance("SHA-1")
          .digest((key + WebSocketClient.Guid).getBytes(UTF_8)))
      out.write(("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
        s"Connection: Upgrade\r\nSec-WebSocket-Accept: $accept\r\n\r\n")
        .getBytes(UTF_8))
      out.flush()
      // wait for the subscribe command (a masked client text frame)
      readClientFrame(in)
      subs.incrementAndGet()
      // stream from the shared cursor (orphaned indices first); sever
      // abruptly every `dropEvery`
      var sentThisConn = 0
      var i = claim()
      while (i >= 0) {
        try { out.write(textFrame(messages(i))); inflight.decrementAndGet() }
        catch {
          case e: Exception =>
            // the claimed message never left: park it for the NEXT
            // connection to reclaim (never lossy, unlike a cursor CAS
            // rollback that a racing claim can defeat). Park BEFORE
            // dropping the inflight count so a closing connection either
            // still sees the claim or already sees the orphan.
            orphans.add(i)
            inflight.decrementAndGet()
            throw e
        }
        sentThisConn += 1
        if (sentThisConn >= dropEvery) { sock.close(); return }
        i = claim()
      }
      out.write(closeFrame())
      out.flush()
    } catch { case _: Exception => () } finally {
      try sock.close() catch { case _: Exception => () }
    }
  }

  /** Next index to serve (claimed: the inflight count is raised and must
    * be dropped after the write succeeds or the index is parked): a
    * parked orphan if one exists, else the shared cursor. Returns -1 only
    * once the sequence is exhausted AND no other connection holds a
    * claim that could still fail into the orphan queue — so the clean
    * CLOSE can never race a message into oblivion. */
  private def claim(): Int = {
    val o = orphans.poll()
    if (o != null) { inflight.incrementAndGet(); return o.intValue() }
    val i = cursor.getAndIncrement()
    if (i < messages.length) { inflight.incrementAndGet(); return i }
    cursor.set(messages.length)
    // exhausted: wait out in-flight claims (their writes either succeed
    // — nothing to do — or park an orphan this connection then serves)
    while (inflight.get() > 0 || !orphans.isEmpty) {
      val o2 = orphans.poll()
      if (o2 != null) { inflight.incrementAndGet(); return o2.intValue() }
      Thread.sleep(2)
    }
    -1
  }

  private def readClientFrame(in: DataInputStream): Unit = {
    val b0 = in.read(); val b1 = in.read()
    if (b0 < 0 || b1 < 0) return
    var len = (b1 & 0x7f).toLong
    if (len == 126) len = ((in.read() & 0xffL) << 8) | (in.read() & 0xffL)
    else if (len == 127) len = in.readLong()
    if ((b1 & 0x80) != 0) { val m = new Array[Byte](4); in.readFully(m) }
    val p = new Array[Byte](len.toInt); in.readFully(p)
  }

  private def textFrame(s: String): Array[Byte] = {
    val payload = s.getBytes(UTF_8)
    val head =
      if (payload.length < 126) Array((0x80 | 0x1).toByte, payload.length.toByte)
      else if (payload.length < 65536)
        Array((0x80 | 0x1).toByte, 126.toByte,
          (payload.length >> 8).toByte, (payload.length & 0xff).toByte)
      else throw new IllegalArgumentException("fixture frame > 64 KiB")
    head ++ payload
  }

  private def closeFrame(): Array[Byte] = Array((0x80 | 0x8).toByte, 0.toByte)
}
