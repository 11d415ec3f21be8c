package graft.sources

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}
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
  * to BOTH an in-memory buffer and a line-oriented write-ahead log under
  * the query's checkpoint location. The WAL is what makes the source
  * RESTARTABLE: a new run of the same query (same checkpoint) rebuilds
  * the buffer from the WAL, so every message received before a kill —
  * committed micro-batch or not — replays with its original offset, and
  * Spark's offset log resumes exactly where it stopped. Messages the
  * endpoint pushes while no query is running are lost at the TCP layer,
  * exactly as in the reference (its client also only hears what's sent
  * while connected); the first-wins dedup downstream makes redelivery
  * after re-subscribe idempotent.
  *
  * SCALE SHAPE: one socket = one receiver; offsets are message counts,
  * each micro-batch ships its slice to ONE task (socket order preserved).
  * CPU-heavy parse stages repartition downstream (the t26 single-
  * partition lesson); horizontal scale is by symbol — one source per
  * subscription set, union'd, each with its own WAL.
  *
  * Options: `host`, `port` (required); `path` (default "/"); `subscribe`
  * — `;`-separated commands sent on every (re)connect; `subscribePaceMs`
  * (default 0) between them; `backoffMs` (default 100) before a
  * reconnect; `maxReconnects` (default 5); `maxMessages` (default ∞) —
  * stop receiving once the WAL holds this many (makes AvailableNow runs
  * deterministic: the trigger drains exactly the expected set);
  * `availableNowTimeoutMs` (default 30000) — how long AvailableNow waits
  * for `maxMessages` before draining what arrived. */
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

private[sources] final case class WsOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] final case class WsInputPartition(msgs: Array[String])
    extends InputPartition

/** Driver-side stream state: receiver thread + WAL-backed replay buffer. */
private[sources] final class WebSocketMicroBatchStream(
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

  private def required(v: String, name: String): String = {
    if (v == null) throw new IllegalArgumentException(
      s"graft-websocket: option '$name' is required")
    v
  }

  // ---- WAL + buffer ------------------------------------------------------

  private val walPath = Paths.get(
    checkpointLocation.stripPrefix("file:"), "ws-wal.txt")
  private val buffer = new ArrayBuffer[String]
  // restart: everything a previous run of this checkpoint received replays
  // from the WAL with its original offset
  if (Files.exists(walPath)) {
    Files.readAllLines(walPath, UTF_8).asScala.foreach(buffer += _)
  } else {
    Files.createDirectories(walPath.getParent)
  }
  private val wal = new BufferedWriter(new OutputStreamWriter(
    Files.newOutputStream(walPath, StandardOpenOption.CREATE,
      StandardOpenOption.APPEND), UTF_8))

  private def received: Long = buffer.synchronized(buffer.length.toLong)

  private def append(msg: String): Unit = buffer.synchronized {
    // the WAL is line-oriented; wire messages are single-line JSON
    wal.write(msg); wal.newLine(); wal.flush()
    buffer += msg
  }

  // ---- receiver thread (the ws-connection.py loop) -----------------------

  @volatile private var running = true
  @volatile private var client: WebSocketClient = _

  private val receiver = new Thread(() => {
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
        var msg = c.readMessage()
        while (running && msg.isDefined && received < maxMessages) {
          append(msg.get)
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

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    WsOffset(if (availableNowCap >= 0) availableNowCap else received)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def initialOffset(): Offset = WsOffset(0L)

  override def deserializeOffset(json: String): Offset = WsOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[WsOffset].n, end.asInstanceOf[WsOffset].n)
    val slice = buffer.synchronized {
      buffer.slice(s.toInt, e.toInt).toArray
    }
    if (slice.isEmpty) Array.empty
    else Array(WsInputPartition(slice))
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
    * logs; the WAL keeps the full history so ANY uncommitted offset range
    * stays replayable across a restart. (A production deployment GCs WAL
    * segments below the commit; at gate scale the whole log is kept.) */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = {
    running = false
    val c = client
    if (c != null) c.close()
    receiver.interrupt()
    receiver.join(5000)
    wal.close()
  }
}
