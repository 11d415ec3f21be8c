package graft

import java.nio.file.Files

import graft.streaming.{SeqTick, Streams, TickRow}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Crash-recovery for the CUSTOM-state streaming operators (the relay's
  * cursor recovery is RelayRestartSpec): kill the query mid-replay, restart
  * from the same checkpoint, and the result must be bit-identical to an
  * uninterrupted run — which requires the checkpoint to restore
  *  - t8: the EMA fold's carried (n, seedSum, prev) per key — a double
  *    recurrence diverges forever if one tick is lost or replayed;
  *  - t5+TTL: the latest-tick value AND its event-time timeout timestamp,
  *    plus the watermark that drives eviction.
  */
class StateRestartSpec extends SparkSpec {
  import spark.implicits._

  /** Stage chunk `name` into `src` as a single parquet file with the given
    * mtime (the file source replays ascending-mtime files one per batch). */
  private def stage(df: DataFrame, root: String, src: String,
                    name: String, mtime: Long): Unit = {
    val tmp = s"$root/tmp-$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.startsWith("part-")).get
    val dst = new java.io.File(src, s"$name.parquet")
    Files.copy(part.toPath, dst.toPath)
    dst.setLastModified(mtime)
  }

  // ---------------------------------------------------------------- t8: EMA

  private def seqTicks(rows: Seq[(String, String, Long, Double)]) =
    rows.map { case (p, t, q, b) => (p, ts(t), q, b) }
      .toDF("pair", "time", "seq", "bid")

  // period=3: the SMA seed for X completes in chunk 2, so the kill point
  // lands exactly between "seed full, recurrence started" and "recurrence
  // continuing" — the state the checkpoint must carry
  private val emaChunks = Seq(
    seqTicks(Seq(("X", "2024-01-01 00:00:00", 1L, 10.0),
      ("X", "2024-01-01 00:00:10", 2L, 11.0),
      ("Y", "2024-01-01 00:00:05", 3L, 5.0))),
    seqTicks(Seq(("X", "2024-01-01 00:00:20", 4L, 12.0),
      ("Y", "2024-01-01 00:00:25", 5L, 6.0))),
    seqTicks(Seq(("X", "2024-01-01 00:00:30", 6L, 9.0),
      ("X", "2024-01-01 00:00:40", 7L, 14.0),
      ("Y", "2024-01-01 00:00:35", 8L, 7.0))),
    seqTicks(Seq(("X", "2024-01-01 00:00:50", 9L, 13.0))))

  private def runEma(src: String, sink: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    Streams.emaStream(stream.as[SeqTick], period = 3)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
  }

  private def emaRows(sink: String) =
    spark.read.parquet(sink).select("pair", "time", "ema")
      .orderBy("pair", "time").collect().toSeq

  test("t8: EMA fold resumes from checkpointed (n, seedSum, prev) bit-exactly") {
    val root = Files.createTempDirectory("graft-t8-restart-").toString
    val (srcA, srcB) = (s"$root/srcA", s"$root/srcB")
    new java.io.File(srcA).mkdirs(); new java.io.File(srcB).mkdirs()

    // uninterrupted reference: all four chunks staged up front
    emaChunks.zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcA, s"c$i", 1600000000000L + i * 60000L)
    }
    runEma(srcA, s"$root/sinkA", s"$root/ckptA")

    // interrupted run: two chunks, drain, process "dies"; two more chunks,
    // restart from the SAME checkpoint
    emaChunks.take(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c$i", 1600000000000L + i * 60000L)
    }
    runEma(srcB, s"$root/sinkB", s"$root/ckptB")
    emaChunks.drop(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c${i + 2}", 1600000120000L + i * 60000L)
    }
    runEma(srcB, s"$root/sinkB", s"$root/ckptB")

    val (a, b) = (emaRows(s"$root/sinkA"), emaRows(s"$root/sinkB"))
    assert(a.nonEmpty, "reference run emitted nothing")
    assert(b === a) // bit-equality: same doubles, same rows
  }

  // --------------------------------------- t13: transformWithState drawdown

  private def runDrawdown(src: String, sink: String, ckpt: String): Unit = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(src).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      Streams.drawdownStream(stream.as[SeqTick])
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("t13: transformWithState peak state survives a RocksDB checkpoint restart") {
    // X's peak (12.0) is set in chunk 2 and must survive the kill: chunk 3's
    // lower bids (9, then a new peak 14) distinguish restored state from
    // reinitialized state (a lost peak would emit dd=0 at bid 9)
    val root = Files.createTempDirectory("graft-t13-restart-").toString
    val (srcA, srcB) = (s"$root/srcA", s"$root/srcB")
    new java.io.File(srcA).mkdirs(); new java.io.File(srcB).mkdirs()

    def run(src: String, tag: String, upTo: Int, from: Int = 0): Unit = {
      emaChunks.slice(from, upTo).zipWithIndex.foreach { case (c, i) =>
        stage(c, root, src, s"c${from + i}", 1600000000000L + (from + i) * 60000L)
      }
      runDrawdown(src, s"$root/sink$tag", s"$root/ckpt$tag")
    }
    run(srcA, "A", emaChunks.length) // uninterrupted reference
    run(srcB, "B", 2)                // two chunks, then the process "dies"
    run(srcB, "B", emaChunks.length, from = 2) // restart, same checkpoint

    def rows(sink: String) = spark.read.parquet(sink)
      .select("pair", "time", "seq", "peak", "dd")
      .orderBy("pair", "time", "seq").collect().toSeq
    val (a, b) = (rows(s"$root/sinkA"), rows(s"$root/sinkB"))
    assert(a.nonEmpty, "reference run emitted nothing")
    assert(b === a)
    // the restored-state branch actually fired: chunk 3's bid 9.0 for X must
    // show the chunk-2 peak (12.0), not itself
    val x9 = a.find(r => r.getString(0) == "X" && r.getDouble(4) > 0
      && r.getDouble(3) == 12.0)
    assert(x9.isDefined, s"no row proves carried peak state: $a")
  }

  // --------------------------------- t23: stale timers (transformWithState)

  // threshold 10 min. Pre-kill: X@0 and Y@20min land in one chunk; the
  // no-data batch fires X's timer (expiry 10min <= wm 20min) and sets the
  // stale FLAG. Post-restart: X@30min has a 30-min gap but the RESTORED
  // flag must suppress the duplicate; X@50min confirms a fresh 20-min gap
  // inline (restored lastMs); Y's trailing timer (expiry 30min <= final wm
  // 50min) fires with Y's pre-kill last tick — price and time exist only
  // in the restored state.
  private val staleChunks = Seq(
    seqTicks(Seq(("X", "2024-01-01 00:00:00", 1L, 10.0),
      ("Y", "2024-01-01 00:20:00", 2L, 5.0))),
    // --- kill point ---
    seqTicks(Seq(("X", "2024-01-01 00:30:00", 3L, 11.0),
      ("X", "2024-01-01 00:50:00", 4L, 12.0))))

  private def runStale(src: String, sink: String, ckpt: String): Unit = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(src).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .withWatermark("time", "0 seconds")
      Streams.staleStream(stream.as[SeqTick], thresholdMs = 600000L)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("t23: stale flag, lastMs and the pending timer survive the kill") {
    val root = Files.createTempDirectory("graft-t23-restart-").toString
    val (srcA, srcB) = (s"$root/srcA", s"$root/srcB")
    new java.io.File(srcA).mkdirs(); new java.io.File(srcB).mkdirs()

    staleChunks.zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcA, s"c$i", 1600000000000L + i * 60000L)
    }
    runStale(srcA, s"$root/sinkA", s"$root/ckptA")

    staleChunks.take(1).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c$i", 1600000000000L + i * 60000L)
    }
    runStale(srcB, s"$root/sinkB", s"$root/ckptB")
    staleChunks.drop(1).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c${i + 1}", 1600000120000L + i * 60000L)
    }
    runStale(srcB, s"$root/sinkB", s"$root/ckptB")

    def rows(sink: String) = spark.read.parquet(sink)
      .select("pair", "last_time", "stale_at")
      .orderBy("pair", "last_time").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2))).toSeq
    val (a, b) = (rows(s"$root/sinkA"), rows(s"$root/sinkB"))
    assert(b === a, s"restart diverged:\nref=${a.mkString("\n")}\ncut=${b.mkString("\n")}")
    assert(a === Seq(
      ("X", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")),
      ("X", ts("2024-01-01 00:30:00"), ts("2024-01-01 00:40:00")),
      ("Y", ts("2024-01-01 00:20:00"), ts("2024-01-01 00:30:00"))), s"points: $a")
  }

  // ------------------------------------------------ t15: tick-grain SAR

  private def runSar(src: String, sink: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    Streams.sarStream(stream.as[SeqTick])
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
  }

  test("t15: the trailing-stop state machine resumes bit-exactly after a kill") {
    // reuses the EMA chunks: X's bid path (10,11,12,9,14,13) flips the
    // stop around the kill point, so the restart must restore (trend,
    // sar, ep, af) AND the two-bid clamp window to reproduce the path
    val root = Files.createTempDirectory("graft-t15-restart-").toString
    val (srcA, srcB) = (s"$root/srcA", s"$root/srcB")
    new java.io.File(srcA).mkdirs(); new java.io.File(srcB).mkdirs()
    emaChunks.zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcA, s"c$i", 1600000000000L + i * 60000L)
    }
    runSar(srcA, s"$root/sinkA", s"$root/ckptA")
    emaChunks.take(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c$i", 1600000000000L + i * 60000L)
    }
    runSar(srcB, s"$root/sinkB", s"$root/ckptB")
    emaChunks.drop(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c${i + 2}", 1600000120000L + i * 60000L)
    }
    runSar(srcB, s"$root/sinkB", s"$root/ckptB")
    def rows(sink: String) = spark.read.parquet(sink)
      .select("pair", "time", "value").orderBy("pair", "time")
      .collect().map(_.toString).toSeq
    val (a, b) = (rows(s"$root/sinkA"), rows(s"$root/sinkB"))
    assert(a.nonEmpty, "reference run emitted nothing")
    assert(b === a)
  }

  // ---------------------------------------- t14: cross-pair correlation

  // n=2 so corr warms fast. The kill lands MID-MINUTE: chunk 1 ends
  // inside minute 00:03 (X has ticked, Y not yet), so the restart must
  // restore the open-minute pick buffers AND the diff ring/prev closes
  // from the checkpoint to finalize 00:03 identically.
  private val corrChunks = Seq(
    seqTicks(Seq(("X", "2024-01-01 00:00:10", 1L, 10.0),
      ("Y", "2024-01-01 00:00:20", 2L, 5.0),
      ("X", "2024-01-01 00:01:10", 3L, 11.0),
      ("Y", "2024-01-01 00:01:20", 4L, 7.0))),
    seqTicks(Seq(("X", "2024-01-01 00:02:10", 5L, 13.0),
      ("Y", "2024-01-01 00:02:15", 6L, 6.0),
      ("X", "2024-01-01 00:03:05", 7L, 12.5))),
    seqTicks(Seq(("Y", "2024-01-01 00:03:30", 8L, 8.5),
      ("X", "2024-01-01 00:04:10", 9L, 14.0),
      ("Y", "2024-01-01 00:04:40", 10L, 9.0),
      ("X", "2024-01-01 00:05:59", 11L, 15.0))))

  private def runCorr(src: String, sink: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    Streams.corrStream(stream.as[SeqTick], "X", "Y", n = 2)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
  }

  test("t14: open-minute buffers and the diff ring survive a restart bit-exactly") {
    val root = Files.createTempDirectory("graft-t14-restart-").toString
    val (srcA, srcB) = (s"$root/srcA", s"$root/srcB")
    new java.io.File(srcA).mkdirs(); new java.io.File(srcB).mkdirs()

    corrChunks.zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcA, s"c$i", 1600000000000L + i * 60000L)
    }
    runCorr(srcA, s"$root/sinkA", s"$root/ckptA")

    corrChunks.take(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c$i", 1600000000000L + i * 60000L)
    }
    runCorr(srcB, s"$root/sinkB", s"$root/ckptB")
    corrChunks.drop(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c${i + 2}", 1600000120000L + i * 60000L)
    }
    runCorr(srcB, s"$root/sinkB", s"$root/ckptB")

    def rows(sink: String) = spark.read.parquet(sink)
      .select("time", "n", "corr", "beta")
      .orderBy("time").collect().map(_.toString).toSeq
    val (a, b) = (rows(s"$root/sinkA"), rows(s"$root/sinkB"))
    assert(a.nonEmpty, "reference run emitted nothing")
    // minutes 00:00-00:04 aligned (00:05 stays open): 5 grid rows, and
    // the minute the kill split (00:03) must carry a non-null corr
    assert(a.length === 5, a.mkString("\n"))
    val m3 = spark.read.parquet(s"$root/sinkA")
      .filter(col("time") === ts("2024-01-01 00:03:00")).collect().head
    assert(!m3.isNullAt(2), s"00:03 corr must be warm: $m3")
    assert(b === a, s"restart diverged:\nref=${a.mkString("\n")}\ncut=${b.mkString("\n")}")
  }

  // --------------------------- t14: straggler drop is counted, not silent

  test("t14: a cross-batch straggler is dropped AND counted via the accumulator") {
    val root = Files.createTempDirectory("graft-t14-straggler-").toString
    val mk = (withStraggler: Boolean) => Seq(
      seqTicks(Seq(("X", "2024-01-01 00:00:10", 1L, 10.0),
        ("Y", "2024-01-01 00:00:20", 2L, 5.0),
        ("X", "2024-01-01 00:01:05", 3L, 11.0))), // finalizes minute 00:00
      seqTicks(
        (if (withStraggler) Seq(("X", "2024-01-01 00:00:30", 4L, 99.0)) else Nil) ++
          Seq(("Y", "2024-01-01 00:01:40", 5L, 6.0),
            ("X", "2024-01-01 00:02:10", 6L, 12.0)))) // finalizes minute 00:01
    def run(tag: String, chunks: Seq[org.apache.spark.sql.DataFrame],
            acc: Option[org.apache.spark.util.LongAccumulator]) = {
      val src = s"$root/src$tag"; new java.io.File(src).mkdirs()
      chunks.zipWithIndex.foreach { case (c, i) =>
        stage(c, root, src, s"c$i", 1600000000000L + i * 60000L)
      }
      val schema = spark.read.parquet(src).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      Streams.corrStream(stream.as[SeqTick], "X", "Y", n = 2, dropped = acc)
        .writeStream.format("parquet")
        .option("path", s"$root/sink$tag")
        .option("checkpointLocation", s"$root/ckpt$tag")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      spark.read.parquet(s"$root/sink$tag").select("time", "n", "corr", "beta")
        .orderBy("time").collect().map(_.toString).toSeq
    }
    val acc = spark.sparkContext.longAccumulator("corr-stragglers")
    val withS = run("A", mk(true), Some(acc))
    val without = run("B", mk(false), None)
    assert(withS.nonEmpty && withS === without,
      "a dropped straggler must not change the emitted grid")
    assert(acc.value === 1L, s"straggler count: ${acc.value}")
  }

  // ------------------------------------------- t2: windowed OHLC aggregate

  // X's minute 00:03 is SPLIT by the kill (13.0 before, 9.0 after): the
  // restart must restore the window's partial aggregate — min_by/max_by
  // open/close picks and the min/max extremes — to finalize it as one
  // candle (open 13, close 9), not two fragments.
  private val ohlcChunks = Seq(
    seqTicks(Seq(("X", "2024-01-01 00:00:10", 1L, 10.0),
      ("X", "2024-01-01 00:00:40", 2L, 12.0),
      ("Y", "2024-01-01 00:00:20", 3L, 5.0))),
    seqTicks(Seq(("X", "2024-01-01 00:01:10", 4L, 11.0),
      ("X", "2024-01-01 00:03:05", 5L, 13.0))),
    seqTicks(Seq(("X", "2024-01-01 00:03:40", 6L, 9.0),
      ("Y", "2024-01-01 00:03:50", 7L, 6.0))),
    seqTicks(Seq(("X", "2024-01-01 00:10:00", 8L, 1.0),
      ("Y", "2024-01-01 00:10:00", 9L, 1.0))))

  private def runOhlc(src: String, sink: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    Streams.ohlc1mSeq(stream)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
  }

  test("t2: a window split by the kill finalizes as ONE candle after restart") {
    val root = Files.createTempDirectory("graft-t2-restart-").toString
    val (srcA, srcB) = (s"$root/srcA", s"$root/srcB")
    new java.io.File(srcA).mkdirs(); new java.io.File(srcB).mkdirs()

    ohlcChunks.zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcA, s"c$i", 1600000000000L + i * 60000L)
    }
    runOhlc(srcA, s"$root/sinkA", s"$root/ckptA")

    ohlcChunks.take(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c$i", 1600000000000L + i * 60000L)
    }
    runOhlc(srcB, s"$root/sinkB", s"$root/ckptB")
    ohlcChunks.drop(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c${i + 2}", 1600000120000L + i * 60000L)
    }
    runOhlc(srcB, s"$root/sinkB", s"$root/ckptB")

    def rows(sink: String) = spark.read.parquet(sink)
      .select("pair", "time", "open", "high", "low", "close")
      .orderBy("pair", "time").collect().map(_.toString).toSeq
    val (a, b) = (rows(s"$root/sinkA"), rows(s"$root/sinkB"))
    assert(a.nonEmpty, "reference run emitted nothing")
    assert(b === a, s"restart diverged:\nref=${a.mkString("\n")}\ncut=${b.mkString("\n")}")
    // the split window merged: one X@00:03 candle spanning both sides
    val m3 = spark.read.parquet(s"$root/sinkB")
      .filter(col("pair") === "X" && col("time") === ts("2024-01-01 00:03:00"))
      .collect()
    assert(m3.length === 1, s"X@00:03 did not finalize as one candle: ${m3.toSeq}")
    assert(m3.head.getDouble(2) === 13.0 && m3.head.getDouble(5) === 9.0,
      s"pre/post-kill halves not merged: ${m3.head}")
  }

  // ---------------------------------------------- t6: session-window state

  private def eventRows(rows: Seq[(String, String, Double)]) =
    rows.map { case (u, t, v) => (u, ts(t), v) }
      .toDF("user_id", "ts", "value")

  // u1's session is OPEN at the kill (00:00-00:20 events, 30 min gap) and
  // chunk 2's 00:40 event falls INSIDE the gap: the restarted query must
  // restore the open session from the checkpoint and MERGE, emitting one
  // four-event session — a lost state would emit two fragments.
  private val sessionChunks = Seq(
    eventRows(Seq(("u1", "2024-01-01 00:00:00", 1.0),
      ("u1", "2024-01-01 00:10:00", 2.0),
      ("u2", "2024-01-01 00:05:00", 10.0))),
    eventRows(Seq(("u1", "2024-01-01 00:20:00", 3.0),
      ("u2", "2024-01-01 00:50:00", 20.0))),
    eventRows(Seq(("u1", "2024-01-01 00:40:00", 4.0),
      ("u2", "2024-01-01 01:40:00", 30.0))),
    eventRows(Seq(("u1", "2024-01-01 06:00:00", 0.0),
      ("u2", "2024-01-01 06:00:00", 0.0))))

  private def runSessions(src: String, sink: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    Streams.sessionizeStream(stream)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
  }

  test("t6: an open session survives the kill and merges across the restart") {
    val root = Files.createTempDirectory("graft-t6-restart-").toString
    val (srcA, srcB) = (s"$root/srcA", s"$root/srcB")
    new java.io.File(srcA).mkdirs(); new java.io.File(srcB).mkdirs()

    sessionChunks.zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcA, s"c$i", 1600000000000L + i * 60000L)
    }
    runSessions(srcA, s"$root/sinkA", s"$root/ckptA")

    sessionChunks.take(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c$i", 1600000000000L + i * 60000L)
    }
    runSessions(srcB, s"$root/sinkB", s"$root/ckptB")
    sessionChunks.drop(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c${i + 2}", 1600000120000L + i * 60000L)
    }
    runSessions(srcB, s"$root/sinkB", s"$root/ckptB")

    def rows(sink: String) = spark.read.parquet(sink)
      .select("user_id", "session_start", "n_events", "total_value")
      .orderBy("user_id", "session_start").collect().map(_.toString).toSeq
    val (a, b) = (rows(s"$root/sinkA"), rows(s"$root/sinkB"))
    assert(a.nonEmpty, "reference run emitted nothing")
    assert(b === a, s"restart diverged:\nref=${a.mkString("\n")}\ncut=${b.mkString("\n")}")
    // the kill-spanning session emitted as ONE row with all four events
    val u1 = spark.read.parquet(s"$root/sinkB")
      .filter(col("user_id") === "u1" &&
        col("session_start") === ts("2024-01-01 00:00:00")).collect()
    assert(u1.length === 1 && u1.head.getLong(2) === 4L,
      s"open session not merged across restart: ${u1.toSeq}")
  }

  // ------------------------------------------------------------ t5 with TTL

  private def tickRows(rows: Seq[(String, String, Double)]) =
    rows.map { case (p, t, b) => (p, ts(t), b, b + 0.01) }
      .toDF("pair", "time", "bid", "ask")

  // TTL 60 s of event time: Y ticks stop at 00:00:40, so its timeout
  // (00:01:40) is passed by the watermark once X@02:00 commits — Y must be
  // evicted in the final batch, in the restarted run just like the
  // uninterrupted one (timeout timestamp + watermark live in the checkpoint)
  private val ttlChunks = Seq(
    tickRows(Seq(("X", "2024-01-01 00:00:00", 10.0),
      ("Y", "2024-01-01 00:00:05", 5.0))),
    tickRows(Seq(("X", "2024-01-01 00:00:30", 11.0),
      ("Y", "2024-01-01 00:00:40", 6.0))),
    tickRows(Seq(("X", "2024-01-01 00:02:00", 12.0))),
    tickRows(Seq(("X", "2024-01-01 00:02:30", 13.0))))

  /** Returns the final batch's state-store row count (post-eviction). */
  private def runTtl(src: String, sink: String, ckpt: String): Long = {
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = Streams.latestPerPairTtl(stream.as[TickRow], ttlMs = 60000L)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[TickRow], _: Long) =>
        batch.write.mode("append").parquet(sink)
      }
      .start()
    q.awaitTermination()
    q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal)).lastOption
      .getOrElse(-1L)
  }

  private def ttlLog(sink: String) =
    spark.read.parquet(sink).select("pair", "time", "bid", "ask")
      .orderBy("pair", "time", "bid").collect().toSeq

  test("t5+TTL: latest-value state, watermark and timeout survive restart") {
    val root = Files.createTempDirectory("graft-t5-restart-").toString
    val (srcA, srcB) = (s"$root/srcA", s"$root/srcB")
    new java.io.File(srcA).mkdirs(); new java.io.File(srcB).mkdirs()

    ttlChunks.zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcA, s"c$i", 1600000000000L + i * 60000L)
    }
    val stateA = runTtl(srcA, s"$root/sinkA", s"$root/ckptA")

    ttlChunks.take(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c$i", 1600000000000L + i * 60000L)
    }
    runTtl(srcB, s"$root/sinkB", s"$root/ckptB")
    ttlChunks.drop(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c${i + 2}", 1600000120000L + i * 60000L)
    }
    val stateB = runTtl(srcB, s"$root/sinkB", s"$root/ckptB")

    // identical emission logs (same batch boundaries, restored state)
    val (a, b) = (ttlLog(s"$root/sinkA"), ttlLog(s"$root/sinkB"))
    assert(a.nonEmpty, "reference run emitted nothing")
    assert(b === a)
    // Y evicted by event-time TTL in BOTH runs: had the restart lost the
    // timeout timestamp or the watermark, the restarted run would end with
    // 2 state rows (X and a zombie Y)
    assert(stateA === 1L, s"uninterrupted run final state rows: $stateA")
    assert(stateB === 1L, s"restarted run final state rows: $stateB")
  }

  // ------------------------------------------------- t16: VWAP window state

  // The X@00:01 minute bucket is split by the kill: its exact-decimal
  // numerator (pv) and qty accumulated pre-kill must merge with the
  // post-restart half, finalizing as ONE bucket with the full-window VWAP.
  private def sizedTicks(rows: Seq[(String, String, Double, Int)]) =
    rows.map { case (p, t, m, sz) => (p, ts(t), m, sz) }
      .toDF("pair", "time", "mid", "size")

  private val vwapChunks = Seq(
    sizedTicks(Seq(("X", "2024-01-01 00:00:10", 10.0, 2),
      ("X", "2024-01-01 00:01:05", 20.0, 1))),
    sizedTicks(Seq(("X", "2024-01-01 00:01:20", 30.0, 3))),
    // --- kill point: X@00:01 holds pv=20+90=110, qty=4 in state ---
    sizedTicks(Seq(("X", "2024-01-01 00:01:40", 40.0, 1))),
    sizedTicks(Seq(("X", "2024-01-01 00:05:00", 50.0, 1))))

  private def runVwap(src: String, sink: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    Streams.vwapStream(stream, duration = "1 minute", watermark = "1 minute")
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
  }

  test("t16: a VWAP bucket split by the kill finalizes as ONE exact bucket") {
    val root = Files.createTempDirectory("graft-t16-restart-").toString
    val (srcA, srcB) = (s"$root/srcA", s"$root/srcB")
    new java.io.File(srcA).mkdirs(); new java.io.File(srcB).mkdirs()

    vwapChunks.zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcA, s"c$i", 1600000000000L + i * 60000L)
    }
    runVwap(srcA, s"$root/sinkA", s"$root/ckptA")

    vwapChunks.take(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c$i", 1600000000000L + i * 60000L)
    }
    runVwap(srcB, s"$root/sinkB", s"$root/ckptB")
    vwapChunks.drop(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c${i + 2}", 1600000120000L + i * 60000L)
    }
    runVwap(srcB, s"$root/sinkB", s"$root/ckptB")

    def rows(sink: String) = spark.read.parquet(sink)
      .select("pair", "time", "vwap", "qty")
      .orderBy("pair", "time").collect().map(_.toString).toSeq
    val (a, b) = (rows(s"$root/sinkA"), rows(s"$root/sinkB"))
    assert(a.nonEmpty, "reference run emitted nothing")
    assert(b === a, s"restart diverged:\nref=${a.mkString("\n")}\ncut=${b.mkString("\n")}")
    // the split bucket merged: (20·1 + 30·3 + 40·1) / 5 = 30.0 exactly
    val m1 = spark.read.parquet(s"$root/sinkB")
      .filter(col("pair") === "X" && col("time") === ts("2024-01-01 00:01:00"))
      .collect()
    assert(m1.length === 1, s"X@00:01 did not finalize as one bucket: ${m1.toSeq}")
    assert(m1.head.getDouble(2) === 30.0 && m1.head.getLong(3) === 5L,
      s"pre/post-kill halves not merged exactly: ${m1.head}")
  }

  // --------------------------------------- t17: ingest-dedup hash state

  // The chunk-2 re-crawl of doc 1's TEXT (different doc_id, same
  // normalized content) arrives only after the kill: the restarted run
  // can reject it solely from the checkpoint-restored content-hash set.
  private def docRows(rows: Seq[(Long, String, String)]) =
    rows.map { case (id, txt, t) => (id, txt, ts(t)) }
      .toDF("doc_id", "text", "ts")

  private val ingestChunks = Seq(
    docRows(Seq((1L, "alpha beta gamma", "2024-01-01 00:00:01"),
      (2L, "delta epsilon zeta", "2024-01-01 00:00:02"))),
    docRows(Seq((3L, "eta theta iota", "2024-01-01 00:00:03"))),
    // --- kill point ---
    docRows(Seq((4L, "  Alpha   BETA gamma ", "2024-01-01 00:00:04"), // re-crawl of 1
      (5L, "kappa lambda mu", "2024-01-01 00:00:05"))),
    docRows(Seq((6L, "nu xi omicron", "2024-01-01 00:30:00"))))

  private def runIngest(src: String, sink: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    Streams.docIngestDedup(stream, watermark = "1 hour")
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
  }

  test("t17: the content-hash set survives the kill — a post-restart re-crawl drops") {
    val root = Files.createTempDirectory("graft-t17-restart-").toString
    val (srcA, srcB) = (s"$root/srcA", s"$root/srcB")
    new java.io.File(srcA).mkdirs(); new java.io.File(srcB).mkdirs()

    ingestChunks.zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcA, s"c$i", 1600000000000L + i * 60000L)
    }
    runIngest(srcA, s"$root/sinkA", s"$root/ckptA")

    ingestChunks.take(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c$i", 1600000000000L + i * 60000L)
    }
    runIngest(srcB, s"$root/sinkB", s"$root/ckptB")
    ingestChunks.drop(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c${i + 2}", 1600000120000L + i * 60000L)
    }
    runIngest(srcB, s"$root/sinkB", s"$root/ckptB")

    def rows(sink: String) = spark.read.parquet(sink)
      .select("doc_id", "content_hash")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val (a, b) = (rows(s"$root/sinkA"), rows(s"$root/sinkB"))
    assert(a.nonEmpty, "reference run emitted nothing")
    // doc 4 (the normalized re-crawl of doc 1) must be absent in BOTH —
    // in the restarted run only restored state can reject it
    assert(!a.exists(_.contains("[4,")), s"re-crawl leaked: $a")
    assert(b === a)
  }

  // -------------------------------------------- t11: bounded dedup state

  // The duplicate in chunk 2 arrives AFTER the kill point: only the
  // restored dedup state (the (pair, second) keys seen before the kill,
  // still inside the 60 s watermark horizon) can reject it. Chunk 3
  // advances the watermark far past every earlier key so both runs also
  // agree on state eviction.
  private val dedupChunks = Seq(
    seqTicks(Seq(("X", "2024-01-01 00:00:00", 1L, 10.0),
      ("Y", "2024-01-01 00:00:05", 2L, 5.0))),
    seqTicks(Seq(("X", "2024-01-01 00:00:00", 3L, 99.0), // dup, same run
      ("X", "2024-01-01 00:00:30", 4L, 11.0))),
    // --- kill point ---
    seqTicks(Seq(("X", "2024-01-01 00:00:00", 5L, 88.0), // dup, post-restart
      ("Y", "2024-01-01 00:00:05", 6L, 77.0), // dup, post-restart
      ("Y", "2024-01-01 00:00:45", 7L, 6.0))),
    seqTicks(Seq(("X", "2024-01-01 00:02:00", 8L, 12.0))))

  private def runDedup(src: String, sink: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    Streams.dedupTicksBounded(stream, watermark = "60 seconds")
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
  }

  private def dedupRows(sink: String) =
    spark.read.parquet(sink).select("pair", "time", "seq", "bid")
      .orderBy("pair", "time").collect().toSeq

  test("t11: dedup key state survives the kill — post-restart dups still drop") {
    val root = Files.createTempDirectory("graft-t11-restart-").toString
    val (srcA, srcB) = (s"$root/srcA", s"$root/srcB")
    new java.io.File(srcA).mkdirs(); new java.io.File(srcB).mkdirs()

    dedupChunks.zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcA, s"c$i", 1600000000000L + i * 60000L)
    }
    runDedup(srcA, s"$root/sinkA", s"$root/ckptA")

    dedupChunks.take(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c$i", 1600000000000L + i * 60000L)
    }
    runDedup(srcB, s"$root/sinkB", s"$root/ckptB")
    dedupChunks.drop(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c${i + 2}", 1600000120000L + i * 60000L)
    }
    runDedup(srcB, s"$root/sinkB", s"$root/ckptB")

    val (a, b) = (dedupRows(s"$root/sinkA"), dedupRows(s"$root/sinkB"))
    assert(a.nonEmpty, "reference run emitted nothing")
    // first-arrival rows only: the seq==5/6 duplicates must be absent in
    // BOTH runs — in the restarted run that is only possible if the
    // checkpoint restored the pre-kill key set
    assert(!a.exists(r => r.getLong(2) == 5L || r.getLong(2) == 6L))
    assert(b === a) // bit-equality: same winners, same values
  }

  // ------------------------------------------ t18: SMA-cross signal state

  // shortP=2/longP=3. Closes per minute for X: 10,10,10,10,16,… — the
  // BUY cross fires at minute 00:04 (s2 = 13 > s3 = 12 with both previous
  // SMAs equal), but that minute FINALIZES only after the kill: the
  // emission depends entirely on the checkpoint-restored close ring
  // ([10,10,10]) and previous SMA pair (10,10).
  private val xsigChunks = Seq(
    seqTicks(Seq(("X", "2024-01-01 00:00:00", 1L, 10.0),
      ("X", "2024-01-01 00:01:00", 2L, 10.0),
      ("X", "2024-01-01 00:02:00", 3L, 10.0))),
    seqTicks(Seq(("X", "2024-01-01 00:03:00", 4L, 10.0))),
    // --- kill point: ring [10,10,10], prev SMAs (10,10), minute 3 open ---
    seqTicks(Seq(("X", "2024-01-01 00:04:00", 5L, 16.0))),
    seqTicks(Seq(("X", "2024-01-01 00:05:00", 6L, 10.0))))

  private def runXSig(src: String, sink: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    Streams.crossSignalStream(stream.as[SeqTick], shortP = 2, longP = 3)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
  }

  test("t18: the close ring + prev SMAs survive the kill — the cross fires post-restart") {
    val root = Files.createTempDirectory("graft-t18-restart-").toString
    val (srcA, srcB) = (s"$root/srcA", s"$root/srcB")
    new java.io.File(srcA).mkdirs(); new java.io.File(srcB).mkdirs()

    xsigChunks.zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcA, s"c$i", 1600000000000L + i * 60000L)
    }
    runXSig(srcA, s"$root/sinkA", s"$root/ckptA")

    xsigChunks.take(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c$i", 1600000000000L + i * 60000L)
    }
    runXSig(srcB, s"$root/sinkB", s"$root/ckptB")
    xsigChunks.drop(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c${i + 2}", 1600000120000L + i * 60000L)
    }
    runXSig(srcB, s"$root/sinkB", s"$root/ckptB")

    def rows(sink: String) = spark.read.parquet(sink)
      .select("pair", "time", "event_type", "price", "period")
      .orderBy("pair", "time").collect().toSeq
    val (a, b) = (rows(s"$root/sinkA"), rows(s"$root/sinkB"))
    assert(a.nonEmpty, "reference run emitted nothing")
    assert(b === a, s"restart diverged:\nref=${a.mkString("\n")}\ncut=${b.mkString("\n")}")
    // exactly one BUY, at the post-kill minute, priced at s2 = (10+16)/2
    assert(a.length === 1 && a.head.getString(2) === "BUY", s"signals: $a")
    assert(a.head.getTimestamp(1) === ts("2024-01-01 00:04:00"))
    assert(a.head.getDouble(3) === 13.0)
  }

  // ------------------------------------------- t19: open-position state

  // The BUY cross (minute 00:04, entry 13.0) fires BEFORE the kill; the
  // SELL cross that closes the trade fires only after the restart — the
  // emitted trade's entry time/price exist nowhere but the checkpointed
  // position state.
  private val tradeChunks = Seq(
    seqTicks(Seq(("X", "2024-01-01 00:00:00", 1L, 10.0),
      ("X", "2024-01-01 00:01:00", 2L, 10.0),
      ("X", "2024-01-01 00:02:00", 3L, 10.0))),
    seqTicks(Seq(("X", "2024-01-01 00:03:00", 4L, 10.0),
      ("X", "2024-01-01 00:04:00", 5L, 16.0),
      ("X", "2024-01-01 00:05:00", 6L, 10.0))),
    // --- kill point: position OPEN (entry 13.0 @ 00:04) in state ---
    seqTicks(Seq(("X", "2024-01-01 00:06:00", 7L, 10.0))),
    seqTicks(Seq(("X", "2024-01-01 00:07:00", 8L, 10.0))))

  private def runTrades(src: String, sink: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    Streams.tradeStream(stream.as[SeqTick], shortP = 2, longP = 3)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
  }

  test("t19: the open position survives the kill — the trade closes post-restart") {
    val root = Files.createTempDirectory("graft-t19-restart-").toString
    val (srcA, srcB) = (s"$root/srcA", s"$root/srcB")
    new java.io.File(srcA).mkdirs(); new java.io.File(srcB).mkdirs()

    tradeChunks.zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcA, s"c$i", 1600000000000L + i * 60000L)
    }
    runTrades(srcA, s"$root/sinkA", s"$root/ckptA")

    tradeChunks.take(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c$i", 1600000000000L + i * 60000L)
    }
    runTrades(srcB, s"$root/sinkB", s"$root/ckptB")
    tradeChunks.drop(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c${i + 2}", 1600000120000L + i * 60000L)
    }
    runTrades(srcB, s"$root/sinkB", s"$root/ckptB")

    def rows(sink: String) = spark.read.parquet(sink)
      .select("pair", "trade_no", "entry_time", "entry_price",
        "exit_time", "exit_price", "pnl")
      .orderBy("pair", "trade_no").collect().toSeq
    val (a, b) = (rows(s"$root/sinkA"), rows(s"$root/sinkB"))
    assert(a.nonEmpty, "reference run emitted nothing")
    assert(b === a, s"restart diverged:\nref=${a.mkString("\n")}\ncut=${b.mkString("\n")}")
    // one closed trade: entry 13.0 @ 00:04 (pre-kill state), exit 10.0 @
    // 00:06 (post-restart cross), pnl -3
    assert(a.length === 1, s"trades: $a")
    val t = a.head
    assert(t.getTimestamp(2) === ts("2024-01-01 00:04:00") &&
      t.getDouble(3) === 13.0 &&
      t.getTimestamp(4) === ts("2024-01-01 00:06:00") &&
      t.getDouble(5) === 10.0 && t.getDouble(6) === -3.0, s"trade: $t")
  }

  // ------------------------------------------------ t20: renko reference

  // Bricks 1-3 (up) fire pre-kill; the post-restart reversal must emit
  // bricks 4-6 (down) from the RESTORED (a0=10, m=3, bricks=3) state —
  // a reset reference would renumber from 1 and re-anchor at 9.9.
  private val renkoChunks = Seq(
    seqTicks(Seq(("X", "2024-01-01 00:00:00", 1L, 10.0),
      ("X", "2024-01-01 00:00:01", 2L, 26.0))),
    // --- kill point ---
    seqTicks(Seq(("X", "2024-01-01 00:00:02", 3L, 9.9))))

  private def runRenko(src: String, sink: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    Streams.renkoStream(stream.as[SeqTick], brick = 5.0)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
  }

  test("t20: the renko reference level survives the kill — the reversal numbers on") {
    val root = Files.createTempDirectory("graft-t20-restart-").toString
    val (srcA, srcB) = (s"$root/srcA", s"$root/srcB")
    new java.io.File(srcA).mkdirs(); new java.io.File(srcB).mkdirs()

    renkoChunks.zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcA, s"c$i", 1600000000000L + i * 60000L)
    }
    runRenko(srcA, s"$root/sinkA", s"$root/ckptA")

    renkoChunks.take(1).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c$i", 1600000000000L + i * 60000L)
    }
    runRenko(srcB, s"$root/sinkB", s"$root/ckptB")
    renkoChunks.drop(1).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c${i + 1}", 1600000120000L + i * 60000L)
    }
    runRenko(srcB, s"$root/sinkB", s"$root/ckptB")

    def rows(sink: String) = spark.read.parquet(sink)
      .select("pair", "brick_no", "dir", "open", "close")
      .orderBy("brick_no").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getDouble(3), r.getDouble(4))).toSeq
    val (a, b) = (rows(s"$root/sinkA"), rows(s"$root/sinkB"))
    assert(b === a, s"restart diverged:\nref=${a.mkString("\n")}\ncut=${b.mkString("\n")}")
    assert(a === Seq(
      (1L, "up", 10.0, 15.0), (2L, "up", 15.0, 20.0), (3L, "up", 20.0, 25.0),
      (4L, "down", 25.0, 20.0), (5L, "down", 20.0, 15.0), (6L, "down", 15.0, 10.0)),
      s"bricks: $a")
  }

  // ---------------------------------------------- t22: A/D running sum

  // The kill splits minute 0: its first two second-picks are checkpointed
  // state; chunk 2 adds a DUPLICATE second (must lose to the restored
  // first-wins pick), a third second, then later minutes. The finalized
  // candle must combine picks from both sides of the kill (h=14, l=8,
  // close=8, vol=3 → mfm=−1, ad=−3) and the running decimal sum must
  // carry into minute 1 (flat bar: mfm=0, ad stays −3).
  private val adChunks = Seq(
    seqTicks(Seq(("X", "2024-01-01 00:00:05", 1L, 10.0),
      ("X", "2024-01-01 00:00:20", 2L, 14.0))),
    // --- kill point ---
    seqTicks(Seq(("X", "2024-01-01 00:00:20", 3L, 99.0), // dup second: drops
      ("X", "2024-01-01 00:00:40", 4L, 8.0),
      ("X", "2024-01-01 00:01:10", 5L, 20.0),
      ("X", "2024-01-01 00:02:05", 6L, 30.0))))

  private def runAd(src: String, sink: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    Streams.adLineStream(stream.as[SeqTick])
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
  }

  test("t22: split-minute picks and the decimal A/D sum survive the kill") {
    val root = Files.createTempDirectory("graft-t22-restart-").toString
    val (srcA, srcB) = (s"$root/srcA", s"$root/srcB")
    new java.io.File(srcA).mkdirs(); new java.io.File(srcB).mkdirs()

    adChunks.zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcA, s"c$i", 1600000000000L + i * 60000L)
    }
    runAd(srcA, s"$root/sinkA", s"$root/ckptA")

    adChunks.take(1).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c$i", 1600000000000L + i * 60000L)
    }
    runAd(srcB, s"$root/sinkB", s"$root/ckptB")
    adChunks.drop(1).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c${i + 1}", 1600000120000L + i * 60000L)
    }
    runAd(srcB, s"$root/sinkB", s"$root/ckptB")

    def rows(sink: String) = spark.read.parquet(sink)
      .select("pair", "time", "close", "vol", "ad")
      .orderBy("time").collect()
      .map(r => (r.getTimestamp(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toSeq
    val (a, b) = (rows(s"$root/sinkA"), rows(s"$root/sinkB"))
    assert(b === a, s"restart diverged:\nref=${a.mkString("\n")}\ncut=${b.mkString("\n")}")
    assert(a === Seq(
      (ts("2024-01-01 00:00:00"), 8.0, 3L, -3.0),
      (ts("2024-01-01 00:01:00"), 20.0, 1L, -3.0)), s"points: $a")
  }

  // ------------------------------------------------ t21: zigzag extremes

  // Tick 2 (120) confirms the initial LOW pivot (100 @ t0) pre-kill and
  // leaves the running high (120 @ 00:00:01) only in state; the
  // post-restart tick at 107 retraces >= 10% and must emit that high as
  // pivot #2 — price AND time both come from the restored extreme.
  private val zigChunks = Seq(
    seqTicks(Seq(("X", "2024-01-01 00:00:00", 1L, 100.0),
      ("X", "2024-01-01 00:00:01", 2L, 120.0))),
    // --- kill point ---
    seqTicks(Seq(("X", "2024-01-01 00:00:02", 3L, 107.0))))

  private def runZig(src: String, sink: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    Streams.zigzagStream(stream.as[SeqTick], rev = 0.1)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
  }

  test("t21: the running extreme survives the kill — the pivot it anchors confirms") {
    val root = Files.createTempDirectory("graft-t21-restart-").toString
    val (srcA, srcB) = (s"$root/srcA", s"$root/srcB")
    new java.io.File(srcA).mkdirs(); new java.io.File(srcB).mkdirs()

    zigChunks.zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcA, s"c$i", 1600000000000L + i * 60000L)
    }
    runZig(srcA, s"$root/sinkA", s"$root/ckptA")

    zigChunks.take(1).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c$i", 1600000000000L + i * 60000L)
    }
    runZig(srcB, s"$root/sinkB", s"$root/ckptB")
    zigChunks.drop(1).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c${i + 1}", 1600000120000L + i * 60000L)
    }
    runZig(srcB, s"$root/sinkB", s"$root/ckptB")

    def rows(sink: String) = spark.read.parquet(sink)
      .select("pair", "pivot_no", "time", "kind", "price", "confirm_time")
      .orderBy("pivot_no").collect()
      .map(r => (r.getLong(1), r.getTimestamp(2), r.getString(3),
        r.getDouble(4), r.getTimestamp(5))).toSeq
    val (a, b) = (rows(s"$root/sinkA"), rows(s"$root/sinkB"))
    assert(b === a, s"restart diverged:\nref=${a.mkString("\n")}\ncut=${b.mkString("\n")}")
    assert(a === Seq(
      (1L, ts("2024-01-01 00:00:00"), "low", 100.0, ts("2024-01-01 00:00:01")),
      (2L, ts("2024-01-01 00:00:01"), "high", 120.0, ts("2024-01-01 00:00:02"))),
      s"pivots: $a")
  }

  // ------------------------------------------- t24: chained window resample

  // the kill lands with 5m window [0,5) still OPEN in BOTH stages: stage 1
  // holds the un-finalized 1m bars 02 and 04, stage 2 holds the partial 5m
  // aggregate of bars 00/01 — restart must restore both state stores or the
  // emitted [0,5) bar loses its open/low
  private val resChunks = Seq(
    seqTicks(Seq(("X", "2024-01-01 00:00:05", 1L, 10.0),
      ("X", "2024-01-01 00:01:05", 2L, 11.0),
      ("Y", "2024-01-01 00:00:30", 3L, 5.0))),
    seqTicks(Seq(("X", "2024-01-01 00:02:05", 4L, 12.0),
      ("X", "2024-01-01 00:04:30", 5L, 9.0))),
    seqTicks(Seq(("X", "2024-01-01 00:05:10", 6L, 13.0),
      ("Y", "2024-01-01 00:06:00", 7L, 6.0))),
    seqTicks(Seq(("X", "2024-01-01 00:11:30", 8L, 14.0))))

  private def runResample(src: String, sink: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    Streams.resampleStream(stream)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
  }

  test("t24: chained 1m→5m window state survives a checkpoint restart") {
    val root = Files.createTempDirectory("graft-t24-restart-").toString
    val (srcA, srcB) = (s"$root/srcA", s"$root/srcB")
    new java.io.File(srcA).mkdirs(); new java.io.File(srcB).mkdirs()

    resChunks.zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcA, s"c$i", 1600000000000L + i * 60000L)
    }
    runResample(srcA, s"$root/sinkA", s"$root/ckptA")

    resChunks.take(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c$i", 1600000000000L + i * 60000L)
    }
    runResample(srcB, s"$root/sinkB", s"$root/ckptB")
    resChunks.drop(2).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, srcB, s"c${i + 2}", 1600000120000L + i * 60000L)
    }
    runResample(srcB, s"$root/sinkB", s"$root/ckptB")

    def rows(p: String) = spark.read.parquet(p)
      .select("pair", "time", "open", "high", "low", "close")
      .orderBy("pair", "time").collect().toSeq
    val (a, b) = (rows(s"$root/sinkA"), rows(s"$root/sinkB"))
    assert(a.nonEmpty, "reference run emitted nothing")
    // X's [00:00, 00:05) bar spans the kill: open/high from pre-kill state,
    // low/close from the pre-kill 1m bars finalized only after restart
    val x0 = a.find(r => r.getString(0) == "X"
      && r.getTimestamp(1) == ts("2024-01-01 00:00:00")).get
    assert((x0.getDouble(2), x0.getDouble(3), x0.getDouble(4), x0.getDouble(5))
      === ((10.0, 12.0, 9.0, 9.0)))
    assert(b === a) // bit-equality across the kill/restart
  }

  // ------------------------- t29: streaming fused grid (transformWithState)

  private def candleRows(rows: Seq[(String, String, String, Double)]) =
    rows.map { case (p, tf, t, c) => (p, tf, ts(t), c) }
      .toDF("pair", "timeframe", "time", "close")

  // period=3 and the kill after chunk 2: X@1m has consumed exactly 3
  // candles there, so every machine's state at the kill is the loaded
  // post-seed form — SMA's ring holds (11, 12), EMA's recurrence has just
  // seeded, RSI's averages have just normalized. Chunk 3 continues the
  // recursion immediately: a lost snapshot would emit null (SMA/EMA
  // re-warming) or a re-seeded value, never the reference's numbers.
  private val gridChunks = Seq(
    candleRows(Seq(("X", "1m", "2024-01-01 00:00:00", 10.0),
      ("X", "1m", "2024-01-01 00:01:00", 11.0),
      ("Y", "5m", "2024-01-01 00:00:00", 5.0))),
    candleRows(Seq(("X", "1m", "2024-01-01 00:02:00", 12.0),
      ("Y", "5m", "2024-01-01 00:05:00", 6.0))),
    candleRows(Seq(("X", "1m", "2024-01-01 00:03:00", 9.0),
      ("X", "1m", "2024-01-01 00:04:00", 14.0),
      ("Y", "5m", "2024-01-01 00:10:00", 7.0))),
    candleRows(Seq(("X", "1m", "2024-01-01 00:05:00", 13.0),
      ("Y", "5m", "2024-01-01 00:15:00", 4.0))))

  private def runGrid(src: String, sink: String, ckpt: String): Unit = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(src).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      Streams.gridStream(stream.as[graft.operators.CloseRow],
        Seq("RSI", "SMA", "EMA"), Seq(3))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("t29: every grid cell's FusedMachine resumes from keyed state bit-exactly") {
    val root = Files.createTempDirectory("graft-t29-restart-").toString
    val (srcA, srcB) = (s"$root/srcA", s"$root/srcB")
    new java.io.File(srcA).mkdirs(); new java.io.File(srcB).mkdirs()

    def run(src: String, tag: String, upTo: Int, from: Int = 0): Unit = {
      gridChunks.slice(from, upTo).zipWithIndex.foreach { case (c, i) =>
        stage(c, root, src, s"c${from + i}", 1600000000000L + (from + i) * 60000L)
      }
      runGrid(src, s"$root/sink$tag", s"$root/ckpt$tag")
    }
    run(srcA, "A", gridChunks.length) // uninterrupted reference
    run(srcB, "B", 2)                 // two chunks, then the process "dies"
    run(srcB, "B", gridChunks.length, from = 2) // restart, same checkpoint

    def rows(sink: String) = spark.read.parquet(sink)
      .select("indicator", "pair", "timeframe", "time", "period", "value")
      .orderBy("indicator", "pair", "timeframe", "time").collect().toSeq
    val (a, b) = (rows(s"$root/sinkA"), rows(s"$root/sinkB"))
    assert(a.nonEmpty, "reference run emitted nothing")
    assert(b === a) // bit-equality: same doubles, same rows, every cell
    // the restored ring actually fired: X@1m's FIRST post-kill candle
    // (00:03, close 9) emits SMA(3) = (11+12+9)/3 — two of the three ring
    // slots predate the kill; a fresh machine would emit null here
    val sma = b.find(r => r.getString(0) == "SMA" && r.getString(1) == "X"
      && r.getTimestamp(3) == ts("2024-01-01 00:03:00")).get
    assert(!sma.isNullAt(5) && math.abs(sma.getDouble(5) - 32.0 / 3) < 1e-12,
      s"post-restart SMA lost its ring: $sma")
    // and the restored EMA recurrence: prev = 11.0 at the kill, so 00:03
    // emits (9 - 11) * 0.5 + 11 = 10.0, not a re-seed
    val ema = b.find(r => r.getString(0) == "EMA" && r.getString(1) == "X"
      && r.getTimestamp(3) == ts("2024-01-01 00:03:00")).get
    assert(!ema.isNullAt(5) && math.abs(ema.getDouble(5) - 10.0) < 1e-12,
      s"post-restart EMA lost its recurrence: $ema")
  }
}
