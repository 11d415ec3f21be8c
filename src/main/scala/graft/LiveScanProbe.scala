package graft

import java.nio.file.Files

import graft.model.Timeframe
import graft.operators.Ticks
import graft.serving.{LivePipeline, PathConfig, TickerServer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-horizon live-store scan telemetry (the round-14 verdict's
  * "per-batch scans at 180 batches" rung): drives [[LivePipeline]] for 180
  * equal micro-batches (60 hours of two-pair ticks, compaction every 16
  * batches) and records the rows READ per batch from every store. The
  * O(new data) claim holds when the non-compaction baseline stays FLAT
  * while the stores grow 180×; compaction batches (and their one-batch
  * swap echo) read proportionally to the fragmented partitions they
  * rewrite — amortized maintenance, reported separately. Writes
  * `target/live_scan_probe.json`. */
object LiveScanProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_LIVE_BATCHES", "180").toInt
    // SPARK_GRAFT_RETAIN_DAYS > 0 runs the RETENTION variant: the same
    // chain with dt-partition retirement armed, recording total store
    // bytes per batch — the bounded-store claim is bytes PLATEAUING
    // across simulated days while per-batch scans stay flat
    val retainDays = sys.env.getOrElse("SPARK_GRAFT_RETAIN_DAYS", "0").toInt
    val compactEvery = 16
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def msg(sym: String, t: String, bid: Double, ask: Double) =
      f"""{"symbol":"$sym","timestamp":"$t","bid":"$bid%.3f","ask":"$ask%.3f"}"""
    // 20 minutes x 2 ticks/min x 2 pairs per batch, deterministic walk;
    // timestamps via real date arithmetic so the horizon can extend past
    // any day/month boundary (string-interpolated day fields silently
    // produced unparseable dates past batch 647)
    val wireFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      .withZone(java.time.ZoneOffset.UTC)
    val epoch0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def batchMsgs(b: Int): Seq[String] =
      for (m <- 0 until 20; s <- Seq(0, 30); p <- Seq("USD_JPY", "EUR_JPY"))
        yield {
          val tot = b * 20 + m
          val t = wireFmt.format(epoch0.plusSeconds(tot * 60L + s))
          msg(p, t, 150.0 + (tot % 23) * 0.1, 150.05 + (tot % 23) * 0.1)
        }
    def parseAll(msgs: Seq[String]): DataFrame =
      Ticks.valid(Ticks.fromWireJson(msgs.toDF("value")))

    val srv = new TickerServer(Seq(PathConfig("USD_JPY", "/ws/t")),
      heartbeatMillis = 60000L)
    srv.start()
    val root = Files.createTempDirectory("graft-livescan-").toString
    val st = LivePipeline.Stores(root)
    val tfs = Seq("1m", "5m").map(Timeframe.byCode)
    val recs = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          recs.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    def settled(): Long = {
      var prev = -1L
      var cur = recs.get()
      while (cur != prev) { Thread.sleep(150); prev = cur; cur = recs.get() }
      cur
    }
    val allStores = Seq(st.ticks, st.candles, st.gridFacts, st.signals,
      st.trades, st.tradesStopped)
    def storeBytes(): Long = allStores.map { d =>
      try graft.sources.Compact.dirBytes(spark, d)
      catch { case _: java.io.FileNotFoundException => 0L }
    }.sum
    spark.sparkContext.addSparkListener(listener)
    val bytesPerBatch = Array.ofDim[Long](nBatches)
    val perBatch = try {
      (0 until nBatches).map { b =>
        val before = settled()
        // two periods arm the FULL chain: signals, trades, stopped trades
        LivePipeline.processBatch(parseAll(batchMsgs(b)), b.toLong, st, srv,
          Seq("RSI", "SMA", "EMA"), Seq(2, 3), tfs, compactEvery = compactEvery,
          retainDays = retainDays)
        bytesPerBatch(b) = storeBytes()
        settled() - before
      }
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      srv.close()
    }
    def isCompact(b: Int) = (b + 1) % compactEvery == 0
    def isEcho(b: Int) = b % compactEvery == 0 && b > 0
    val steady = perBatch.zipWithIndex.collect {
      case (r, b) if b >= 3 && !isCompact(b) && !isEcho(b) => r
    }
    val earlySteady = steady.take(5).sum / 5.0
    val lateSteady = steady.takeRight(5).sum / 5.0
    val json =
      s"""{"batches":$nBatches,"compact_every":$compactEvery,""" +
        s""""retain_days":$retainDays,""" +
        s""""early_steady_rows":$earlySteady,"late_steady_rows":$lateSteady,""" +
        s""""late_over_early":${BigDecimal(lateSteady / earlySteady)
          .setScale(3, BigDecimal.RoundingMode.HALF_UP)},""" +
        s""""per_batch":[${perBatch.mkString(",")}],""" +
        s""""bytes_per_batch":[${bytesPerBatch.mkString(",")}]}"""
    val p = java.nio.file.Paths.get(
      if (retainDays > 0) "target/live_scan_probe_retention.json"
      else "target/live_scan_probe.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, json.getBytes("UTF-8"))
    println(json.take(400))
    println(s"[live-scan] steady early=$earlySteady late=$lateSteady " +
      f"(x${lateSteady / earlySteady}%.3f over ${nBatches} batches)")
    spark.stop()
  }
}
