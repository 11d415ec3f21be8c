package graft.sources

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 as a FIRST-CLASS Spark streaming source: `readStream.format
  * ("graft-websocket")` — the direct socket→engine path that replaces the
  * [[WebSocketIngest]] file spool (the spool remains the Kafka-hop
  * stand-in; this source is the no-hop deployment).
  *
  * A driver-side receiver thread owns one [[WebSocketClient]] against the
  * live endpoint (reference: src/gmo/ws-connection.py:99-172 — subscribe
  * commands with pacing on every (re)connect, fixed-backoff reconnect on
  * drop, bounded reconnect budget) and appends each received text message
  * to BOTH an in-memory buffer and a SEGMENTED write-ahead log under the
  * query's checkpoint location. The WAL is what makes the source
  * RESTARTABLE: a new run of the same query (same checkpoint) rebuilds
  * the buffer from the surviving WAL segments, so every message received
  * before a kill — committed micro-batch or not — replays with its
  * original offset, and Spark's offset log resumes exactly where it
  * stopped. Messages the endpoint pushes while no query is running are
  * lost at the TCP layer, exactly as in the reference (its client also
  * only hears what's sent while connected); the first-wins dedup
  * downstream makes redelivery after re-subscribe idempotent.
  *
  * BOUNDED STATE: `commit(end)` trims the in-memory buffer below the
  * committed offset and deletes WAL segments that lie wholly below it, so
  * driver heap and restart-replay time are O(uncommitted messages) — not
  * O(messages ever received), which is what a month-long query needs. A
  * `floor` marker records the trim point so a restart after total GC
  * resumes offset accounting where the committed history ended. The
  * reconnect budget is PER-OUTAGE (it resets on the first message of each
  * successful connection, mirroring ws-connection.py's indefinite
  * run_forever loop), and a receiver that exhausts the budget surfaces as
  * a stream failure on the next micro-batch rather than a silent stall.
  *
  * SCALE SHAPE: one socket = one receiver; offsets are message counts.
  * By default each micro-batch ships its slice to ONE task (socket order
  * preserved); CPU-heavy parse stages set `minPartitions` — the fan-out
  * valve (the t26 single-partition lesson) — to split the slice into that
  * many contiguous, order-preserving chunks. Horizontal scale is by
  * symbol — one source per subscription set, union'd, each with its own
  * WAL.
  *
  * Options: `host`, `port` (required); `path` (default "/"); `subscribe`
  * — `;`-separated commands sent on every (re)connect; `subscribePaceMs`
  * (default 0) between them; `backoffMs` (default 100) before a
  * reconnect; `maxReconnects` (default 5) — consecutive failed attempts
  * per outage; `maxMessages` (default ∞) — stop receiving once the WAL
  * holds this many (makes AvailableNow runs deterministic: the trigger
  * drains exactly the expected set); `availableNowTimeoutMs` (default
  * 30000) — how long AvailableNow waits for `maxMessages` before
  * draining what arrived; `maxMessagesPerBatch` (default ∞) — ReadLimit
  * per micro-batch (an AvailableNow drain then runs MULTIPLE batches to
  * the frozen target, the Kafka maxOffsetsPerTrigger pattern);
  * `minPartitions` (default 1) — contiguous chunks per micro-batch;
  * `walSegmentMessages` (default 4096) — messages per WAL segment file
  * (the GC granularity). */
final class WebSocketSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-websocket"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WebSocketSourceProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WebSocketTable(new CaseInsensitiveStringMap(properties))
}

object WebSocketSourceProvider {
  val Schema: StructType = StructType(Seq(StructField("value", StringType)))
}

private[sources] final class WebSocketTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-websocket(${options.get("host")}:${options.get("port")})"
  override def schema(): StructType = WebSocketSourceProvider.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = WebSocketSourceProvider.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new WebSocketMicroBatchStream(options, checkpointLocation)
      }
    }
}

private[graft] final case class WsOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[graft] final case class WsInputPartition(msgs: Array[String])
    extends InputPartition

/** Driver-side stream state: receiver thread + segmented-WAL replay
  * buffer with commit-time GC. */
private[graft] final class WebSocketMicroBatchStream(
    options: CaseInsensitiveStringMap, checkpointLocation: String)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val host = required(options.get("host"), "host")
  private val port = required(options.get("port"), "port").toInt
  private val path = Option(options.get("path")).getOrElse("/")
  private val subscribe: Seq[String] =
    Option(options.get("subscribe")).map(_.split(";").toSeq.filter(_.nonEmpty))
      .getOrElse(Nil)
  private val subscribePaceMs =
    Option(options.get("subscribePaceMs")).map(_.toLong).getOrElse(0L)
  private val backoffMs =
    Option(options.get("backoffMs")).map(_.toLong).getOrElse(100L)
  private val maxReconnects =
    Option(options.get("maxReconnects")).map(_.toInt).getOrElse(5)
  private val maxMessages =
    Option(options.get("maxMessages")).map(_.toLong).getOrElse(Long.MaxValue)
  private val availableNowTimeoutMs =
    Option(options.get("availableNowTimeoutMs")).map(_.toLong).getOrElse(30000L)
  private val maxMessagesPerBatch =
    Option(options.get("maxMessagesPerBatch")).map(_.toLong)
  require(maxMessagesPerBatch.forall(_ >= 1),
    s"maxMessagesPerBatch must be >= 1, got $maxMessagesPerBatch")
  private val minPartitions =
    Option(options.get("minPartitions")).map(_.toInt).getOrElse(1)
  require(minPartitions >= 1, s"minPartitions must be >= 1, got $minPartitions")
  private val walSegmentMessages =
    Option(options.get("walSegmentMessages")).map(_.toLong).getOrElse(4096L)
  require(walSegmentMessages >= 1,
    s"walSegmentMessages must be >= 1, got $walSegmentMessages")

  private def required(v: String, name: String): String = {
    if (v == null) throw new IllegalArgumentException(
      s"graft-websocket: option '$name' is required")
    v
  }

  // ---- segmented WAL + buffer -------------------------------------------
  //
  // Disk layout under <checkpoint>/ws-wal/:
  //   floor                 — offset below which history was GC'd (absent = 0)
  //   seg-<start, 20 digits>.txt — one message per line, offsets
  //                           [start, start + lines)
  // In memory, `buffer(i)` holds offset `bufferBase + i`; commit() trims
  // the prefix and deletes fully-committed segments, so both are
  // O(uncommitted). All buffer/segment mutation synchronizes on `buffer`.

  private val walDir = Paths.get(
    checkpointLocation.stripPrefix("file:"), "ws-wal")
  private val floorPath = walDir.resolve("floor")

  private final class Segment(val start: Long, val path: Path, var count: Long)

  private val buffer = new ArrayBuffer[String]
  private var bufferBase: Long = 0L
  private val segments = new ArrayBuffer[Segment]

  Files.createDirectories(walDir)
  private def listSegs(): Seq[Path] = {
    val s = Files.list(walDir)
    try s.iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith("seg-"))
      .sortBy(_.getFileName.toString)
    finally s.close()
  }
  // legacy single-file layout (pre-GC) reads as one segment at offset 0
  private val legacyWal = walDir.getParent.resolve("ws-wal.txt")
  if (Files.exists(legacyWal) && !Files.exists(floorPath) && listSegs().isEmpty) {
    Files.move(legacyWal, segPath(0L))
  }
  if (Files.exists(floorPath)) {
    bufferBase = new String(Files.readAllBytes(floorPath), UTF_8).trim.toLong
  }
  // restart: everything a previous run of this checkpoint received and has
  // not GC'd replays from the surviving segments with its original offset
  locally {
    val segs = listSegs()
    segs.foreach { p =>
      val start = p.getFileName.toString.stripPrefix("seg-").stripSuffix(".txt").toLong
      val lines = Files.readAllLines(p, UTF_8).asScala
      if (segments.isEmpty) {
        // the first surviving segment may begin below the floor (it
        // straddled the commit when GC last ran): replay it whole — the
        // committed prefix is never requested again, only re-buffered
        bufferBase = math.min(bufferBase, start)
        require(start == bufferBase || bufferBase + buffer.length == start,
          s"WAL gap: floor $bufferBase, first segment starts at $start")
      } else require(bufferBase + buffer.length == start,
        s"WAL gap: expected segment at ${bufferBase + buffer.length}, found $start")
      buffer ++= lines
      segments += new Segment(start, p, lines.length.toLong)
    }
  }

  private def segPath(start: Long): Path =
    walDir.resolve(f"seg-$start%020d.txt")

  private def received: Long = buffer.synchronized(bufferBase + buffer.length)

  /** Test probe: in-memory buffered message count (O(uncommitted)). */
  private[graft] def bufferedCount: Int = buffer.synchronized(buffer.length)
  /** Test probe: the GC floor (offset of `buffer(0)`). */
  private[graft] def gcFloor: Long = buffer.synchronized(bufferBase)
  /** Test probe: surviving WAL segment start offsets, ascending. */
  private[graft] def walSegmentStarts: Seq[Long] =
    buffer.synchronized(segments.map(_.start).toSeq)

  // the open segment's writer; rolled when the segment fills
  private var wal: BufferedWriter = _

  private def openSegment(start: Long): Unit = {
    segments += new Segment(start, segPath(start), 0L)
    wal = new BufferedWriter(new OutputStreamWriter(
      Files.newOutputStream(segPath(start), StandardOpenOption.CREATE,
        StandardOpenOption.APPEND), UTF_8))
  }

  private def append(msg: String): Unit = buffer.synchronized {
    if (wal == null || segments.last.count >= walSegmentMessages) {
      if (wal != null) wal.close()
      openSegment(bufferBase + buffer.length)
    }
    // segments are line-oriented; wire messages are single-line JSON
    wal.write(msg); wal.newLine(); wal.flush()
    segments.last.count += 1
    buffer += msg
  }

  // ---- receiver thread (the ws-connection.py loop) -----------------------

  @volatile private var running = true
  @volatile private var client: WebSocketClient = _
  @volatile private var receiverFailure: Option[String] = None

  private val receiver = new Thread(() => {
    // the budget is per-OUTAGE: a successful resume earns it back
    // (ws-connection.py's run_forever reconnects indefinitely; what we
    // bound is consecutive failures, not lifetime drops)
    var reconnects = 0
    while (running && received < maxMessages && reconnects <= maxReconnects) {
      val c = new WebSocketClient(host, port, path)
      client = c
      try {
        c.connect()
        subscribe.foreach { s =>
          c.send(s)
          if (subscribePaceMs > 0) Thread.sleep(subscribePaceMs)
        }
        var first = true
        var msg = c.readMessage()
        while (running && msg.isDefined && received < maxMessages) {
          append(msg.get)
          if (first) { reconnects = 0; first = false }
          if (received < maxMessages) msg = c.readMessage()
        }
        if (running && msg.isEmpty && received < maxMessages) {
          reconnects += 1
          if (reconnects <= maxReconnects) Thread.sleep(backoffMs)
        } else running = false
      } catch {
        case _: InterruptedException => running = false
        case _: Exception =>
          reconnects += 1
          if (reconnects <= maxReconnects) Thread.sleep(backoffMs)
      } finally c.close()
    }
    if (running && received < maxMessages && reconnects > maxReconnects)
      receiverFailure = Some(
        s"graft-websocket: receiver gave up after $maxReconnects consecutive " +
        s"failed reconnects to $host:$port (received $received messages)")
  }, s"graft-ws-receiver-$host:$port")
  receiver.setDaemon(true)
  if (received < maxMessages) receiver.start() else running = false

  // ---- MicroBatchStream --------------------------------------------------

  @volatile private var availableNowCap: Long = -1L

  override def prepareForTriggerAvailableNow(): Unit = {
    // deterministic bounded drain: wait for the receiver to deliver the
    // configured message budget (or die trying), then freeze the target
    val deadline = System.currentTimeMillis() + availableNowTimeoutMs
    if (maxMessages != Long.MaxValue) {
      while (received < maxMessages && receiver.isAlive &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
    }
    availableNowCap = received
  }

  override def getDefaultReadLimit: ReadLimit =
    maxMessagesPerBatch.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    // a dead receiver must fail the query, not stall it silently
    receiverFailure.foreach(m => throw new IllegalStateException(m))
    val cap = if (availableNowCap >= 0) availableNowCap else received
    val s = start.asInstanceOf[WsOffset].n
    WsOffset(limit match {
      case mr: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        math.min(cap, s + mr.maxRows())
      case _ => cap
    })
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def initialOffset(): Offset = WsOffset(0L)

  override def deserializeOffset(json: String): Offset = WsOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[WsOffset].n, end.asInstanceOf[WsOffset].n)
    val slice = buffer.synchronized {
      require(s >= bufferBase,
        s"graft-websocket: offset $s below the GC floor $bufferBase — " +
        "Spark never requests below its committed offset, so this WAL was " +
        "trimmed by a foreign commit log")
      require(e - bufferBase <= Int.MaxValue,
        s"graft-websocket: uncommitted span ${e - bufferBase} exceeds the " +
        "in-memory buffer's addressable range; commits are not advancing")
      buffer.slice((s - bufferBase).toInt, (e - bufferBase).toInt).toArray
    }
    if (slice.isEmpty) Array.empty
    else {
      // the fan-out valve: up to minPartitions contiguous chunks, order
      // preserved by (partition index, row index)
      val parts = math.min(minPartitions, slice.length)
      val per = (slice.length + parts - 1) / parts
      slice.grouped(per).map(g => WsInputPartition(g): InputPartition).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val msgs = partition.asInstanceOf[WsInputPartition].msgs
          private var i = -1
          override def next(): Boolean = { i += 1; i < msgs.length }
          override def get(): InternalRow =
            new GenericInternalRow(Array[Any](UTF8String.fromString(msgs(i))))
          override def close(): Unit = ()
        }
    }

  /** Offsets below the commit are durable in Spark's own offset/commit
    * logs, so the committed prefix never needs replay: trim it from the
    * in-memory buffer, delete WAL segments wholly below the commit, and
    * persist the floor so a restart after total GC resumes offset
    * accounting where the committed history ended. A segment straddling
    * the commit survives whole (its committed prefix is re-buffered but
    * never re-served). */
  override def commit(end: Offset): Unit = buffer.synchronized {
    val e = end.asInstanceOf[WsOffset].n
    if (e > bufferBase) {
      buffer.remove(0, (e - bufferBase).toInt)
      bufferBase = e
      // atomic floor update: a crash mid-write must never leave an
      // empty/partial marker (restart parses it with toLong)
      val tmp = walDir.resolve("floor.tmp")
      Files.write(tmp, (e.toString + "\n").getBytes(UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      Files.move(tmp, floorPath, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      while (segments.nonEmpty && segments.head.start + segments.head.count <= e &&
             !(segments.last eq segments.head)) {
        Files.deleteIfExists(segments.head.path)
        segments.remove(0)
      }
      // the open segment is GC'd too once fully committed and full
      if (segments.nonEmpty && (segments.last eq segments.head) &&
          segments.head.start + segments.head.count <= e &&
          segments.head.count >= walSegmentMessages) {
        if (wal != null) { wal.close(); wal = null }
        Files.deleteIfExists(segments.head.path)
        segments.remove(0)
      }
    }
  }

  override def stop(): Unit = {
    running = false
    val c = client
    if (c != null) c.close()
    receiver.interrupt()
    receiver.join(5000)
    buffer.synchronized { if (wal != null) wal.close() }
  }
}
