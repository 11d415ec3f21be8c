package graft.serving

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Timeframe
import graft.operators.{Incremental, Indicators, Ohlc, Ticks}

/** The reference's WHOLE deployment as ONE continuously running query:
  * `ws-connection.py` (ingest) → the transform flow's candle + indicator
  * state (E1/E2) → `ws_ticker_server.py` (fan-out) — tick-in over a real
  * socket, json-out over real sockets, one Structured Streaming chain.
  *
  * Shape: the DSv2 socket source feeds parsed ticks into `foreachBatch`,
  * and each micro-batch advances four first-write-wins parquet stores the
  * way the reference's per-poll Prefect run advances its tables — made
  * continuous:
  *
  *  1. E3 serving: [[TickerServer.publishBatch]] fans the batch's latest
  *     tick per pair out to subscribers (edge-sized collect);
  *  2. S2+T4 relay: per-batch second-dedup, anti-join append into the
  *     tick store (idempotent under batch replay);
  *  3. E1 candles: only the tick TAIL past each (pair, timeframe)
  *     watermark is candled (every bar newer than a watermark has all its
  *     ticks in the tail — bar grids align, so `bar > wm ⇒ ticks ≥ wm +
  *     dur ≥ threshold`), and only bars whose window has closed against
  *     the pair's max tick time freeze into the store — per-batch cost
  *     tracks new data, never history;
  *  4. E2 grid: [[Indicators.indicatorFactsFusedResume]] folds the new
  *     final candles into FusedMachines restored from the persisted
  *     snapshot, appends grid facts first-write-wins, then persists the
  *     ADVANCED snapshot ([[Indicators.indicatorGridSnapshotResume]]) as
  *     a new VERSIONED directory — `_SUCCESS`-gated, so a kill mid-write
  *     leaves the previous version authoritative and the replayed batch
  *     reconverges bit-exactly (snapshot(prefix) + fold(tail) ≡
  *     snapshot(prefix ++ tail)).
  *
  * Crash contract per batch: publish (idempotent latest-cache), tick
  * append (anti-join), candle append (anti-join), fact append
  * (anti-join), snapshot version (monotone, `_SUCCESS`-gated) — a kill
  * between ANY two steps replays the batch into stores where every write
  * either dedups out or re-produces the identical bytes. The restart
  * proof is LivePipelineSpec; the gate row is `e2e_live_pipeline`.
  *
  * SCALE SHAPE: stores partition by their keys at deployment; per-batch
  * reads filter by watermark (time predicates push down), the only
  * driver collects are the edge-sized publish and the per-pair max/
  * threshold broadcasts (O(pairs × timeframes)). Store fragmentation is
  * the offline `Compact.compact` job's concern (these stores are
  * first-write-wins sets, NOT merge-absorbing ledgers — compactLedger's
  * append-then-delete protocol does not apply). */
object LivePipeline {

  /** Store layout under one root: the four tables of the deployment. */
  final case class Stores(root: String) {
    val ticks = s"$root/ticks"
    val candles = s"$root/candles"
    val gridFacts = s"$root/grid_facts"
    val gridState = s"$root/grid_state"
    val checkpoint = s"$root/ckpt"
  }

  /** Start the chain against a live endpoint. `maxMessages`/
    * `maxMessagesPerBatch` bound an AvailableNow drain into a
    * deterministic multi-batch run (the gate/spec mode); a production
    * deployment omits both and runs a ProcessingTime trigger. */
  def start(spark: SparkSession, host: String, port: Int, wsPath: String,
            subscribe: String, storeRoot: String, server: TickerServer,
            indicators: Seq[String] = Seq("RSI", "SMA", "EMA"),
            periods: Seq[Int] = Seq(14, 28, 56),
            timeframes: Seq[String] = Seq("1m", "5m", "30m", "1h", "4h"),
            maxMessages: Long = Long.MaxValue,
            maxMessagesPerBatch: Long = Long.MaxValue,
            backoffMs: Long = 25L,
            maxReconnects: Int = 5,
            availableNowTimeoutMs: Long = 30000L,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val stores = Stores(storeRoot)
    val tfs = timeframes.map(c => Timeframe.byCode.getOrElse(c,
      throw new IllegalArgumentException(s"unknown timeframe code: $c")))
    val lines = spark.readStream.format("graft-websocket")
      .option("host", host).option("port", port.toString)
      .option("path", wsPath)
      .option("subscribe", subscribe)
      .option("maxMessages", maxMessages.toString)
      .option("maxMessagesPerBatch", maxMessagesPerBatch.toString)
      .option("backoffMs", backoffMs.toString)
      .option("maxReconnects", maxReconnects.toString)
      .option("availableNowTimeoutMs", availableNowTimeoutMs.toString)
      .load()
    Ticks.valid(Ticks.fromWireJson(lines))
      .writeStream
      .option("checkpointLocation", stores.checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, stores, server, indicators, periods, tfs)
      }
      .start()
  }

  /** One poll of the reference's deployment loop (also driven directly by
    * the spec's kill/restart harness). */
  def processBatch(batch: DataFrame, batchId: Long, stores: Stores,
                   server: TickerServer, indicators: Seq[String],
                   periods: Seq[Int], tfs: Seq[Timeframe]): Unit = {
    val spark = batch.sparkSession
    // wire-order tiebreak for the per-second dedup: (partition, ordinal)
    // is socket order through the source's contiguous chunks, and a
    // crash-replayed batch re-plans the identical offset slice into the
    // identical partitioning — so the SAME survivor wins on replay even
    // when two ticks share a wire timestamp
    val ticks = batch.withColumn("seq", monotonically_increasing_id())
      .localCheckpoint()
    if (ticks.isEmpty) return

    // 1) E3 serving edge: latest tick per pair fans out NOW — the edge
    //    never waits for storage
    server.publishBatch(ticks, batchId)

    // 2) S2+T4 relay into the first-write-wins tick store
    val staged = Ticks.dedupSecond(ticks)
    val prevTicks = readOpt(spark, stores.ticks)
    val novel = prevTicks.map(p => Incremental.newRows(p, staged, Seq("pair", "time")))
      .getOrElse(staged)
      .localCheckpoint() // written below AND screened for stragglers
    novel.write.mode("append").parquet(stores.ticks)

    // 3) E1 candles: candle only the tick tail, freeze only closed bars
    val allTfs = (Timeframe.Base +: tfs.filterNot(_.code == Timeframe.Base.code)).distinct
    val durs = {
      import spark.implicits._
      allTfs.map(t => (t.code, t.durationSeconds.toLong)).toDF("timeframe", "dur")
    }
    val store = spark.read.parquet(stores.ticks)
    val prevCand = readOpt(spark, stores.candles)
    val tailTicks = prevCand match {
      case None => store
      case Some(pc) =>
        // per-pair threshold: the earliest instant any timeframe's next
        // bar can start — ticks below it can only rebuild frozen bars. A
        // timeframe with NO frozen bar yet pins the pair's threshold open
        // (its first bars may still need the oldest ticks).
        val wms = Incremental.watermarks(pc)
        val thr = wms.select("pair").distinct().crossJoin(durs)
          .join(wms, Seq("pair", "timeframe"), "left")
          .groupBy("pair")
          .agg(when(count(col("watermark")) === lit(allTfs.length),
            min(unix_timestamp(col("watermark")) + col("dur"))).as("thr_s"))
        // ordered-socket contract tripwire: a NOVEL tick below the frozen
        // frontier arrived out of order — its bar is already final, so it
        // can never influence a candle. Keep it in the tick store, but
        // say so: silent loss is how a mis-ordered source hides.
        val late = novel.join(broadcast(thr), Seq("pair"), "left")
          .filter(col("thr_s").isNotNull &&
            unix_timestamp(col("time")) < col("thr_s")).count()
        if (late > 0) println(
          s"[live-pipeline] WARN batch $batchId: $late out-of-order ticks " +
          "below the frozen candle frontier (stored, but their bars are " +
          "final — the source violated per-pair time order)")
        store.join(broadcast(thr), Seq("pair"), "left")
          .filter(col("thr_s").isNull || unix_timestamp(col("time")) >= col("thr_s"))
          .drop("thr_s")
    }
    val tail = tailTicks.localCheckpoint() // candled + max'd below
    val mx = tail.groupBy("pair").agg(max(col("time")).as("max_t"))
    val cand = Ohlc.allTimeframes(tail, allTfs)
    val candFinal = cand
      .join(durs, "timeframe")
      .join(broadcast(mx), "pair")
      .filter(unix_timestamp(col("time")) + col("dur") <= unix_timestamp(col("max_t")))
      .select(cand.columns.map(col).toSeq: _*)
    prevCand.map(p => Incremental.newRows(p, candFinal,
        Seq("pair", "timeframe", "time")))
      .getOrElse(candFinal)
      .write.mode("append").parquet(stores.candles)

    // 4) E2 grid: resume machines from the versioned snapshot, fold only
    //    the candle tail, persist facts + the advanced snapshot
    readOpt(spark, stores.candles).foreach { allCand =>
      val snapOpt = readLatestSnapshot(spark, stores.gridState)
      val tailCand = snapOpt match {
        case None => allCand
        case Some(snap) =>
          val wms = snap.select("pair", "timeframe", "wm").distinct()
          allCand.join(broadcast(wms), Seq("pair", "timeframe"), "left")
            .filter(col("wm").isNull || col("time") > col("wm"))
            .drop("wm")
      }
      val tailC = tailCand.localCheckpoint()
      if (!tailC.isEmpty) {
        val stateDf = snapOpt.getOrElse(emptyState(spark))
        val facts = Indicators.indicatorFactsFusedResume(
          tailC, indicators, periods, stateDf)
        readOpt(spark, stores.gridFacts)
          .map(p => Incremental.newRows(p, facts,
            Seq("indicator", "pair", "timeframe", "time", "period")))
          .getOrElse(facts)
          .write.mode("append").parquet(stores.gridFacts)
        val advanced = Indicators.indicatorGridSnapshotResume(
          tailC, indicators, periods, stateDf)
        val newWms = tailC.groupBy("pair", "timeframe")
          .agg(max(col("time")).as("wm_new"))
        val oldWms = snapOpt.map(_.select(col("pair"), col("timeframe"),
            col("wm").as("wm_old")).distinct())
        val wmAll = oldWms match {
          case None => newWms.select(col("pair"), col("timeframe"),
            col("wm_new").as("wm"))
          case Some(o) => newWms.join(o, Seq("pair", "timeframe"), "full")
            .select(col("pair"), col("timeframe"),
              greatest(col("wm_new"), col("wm_old")).as("wm"))
        }
        writeSnapshotVersion(spark, stores.gridState, batchId,
          advanced.join(wmAll, Seq("pair", "timeframe"), "left"))
      }
    }
  }

  private def readOpt(spark: SparkSession, path: String): Option[DataFrame] =
    try {
      val df = spark.read.parquet(path)
      df.schema // force resolution
      Some(df)
    } catch { case _: AnalysisException => None }

  private def emptyState(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[graft.operators.GridState].toDF()
  }

  /** Latest `_SUCCESS`-complete snapshot version (columns: the GridState
    * row + this key's `wm` candle watermark), if any. */
  private def readLatestSnapshot(spark: SparkSession, root: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val versions = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
      .filter(d => d.getName.startsWith("v") &&
        fs.exists(new org.apache.hadoop.fs.Path(d, "_SUCCESS")))
      .flatMap(d => scala.util.Try(
        d.getName.stripPrefix("v").toLong).toOption.map(_ -> d))
    if (versions.isEmpty) None
    else Some(spark.read.parquet(versions.maxBy(_._1)._2.toString))
  }

  /** Persist snapshot version `v<id>` (idempotent under batch replay via
    * overwrite), then GC strictly older versions — the latest complete
    * version is always authoritative, so a kill anywhere here leaves a
    * readable lineage. */
  private def writeSnapshotVersion(spark: SparkSession, root: String,
                                   id: Long, df: DataFrame): Unit = {
    df.write.mode("overwrite").parquet(s"$root/v$id")
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
      .foreach { d =>
        scala.util.Try(d.getName.stripPrefix("v").toLong).toOption
          .filter(_ < id).foreach(_ => fs.delete(d, true))
      }
  }
}
