package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Compact

/** Store retention/GC ([[Compact.retireStore]]): partition-granular `dt`
  * retirement with the compactStore crash-window discipline — drop mode's
  * rename-then-delete recovers from a kill in either window; archive mode
  * is a single atomic rename per partition. */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  /** A (pair, dt)-partitioned store with one row per (pair, day). */
  private def mkStore(days: Seq[String]): String = {
    val root = Files.createTempDirectory("graft-retire-").toString
    val rows = for (p <- Seq("aaa", "bbb"); d <- days)
      yield (p, d, java.sql.Timestamp.valueOf(s"$d 12:00:00"), 1.0)
    rows.toDF("pair", "dt", "time", "v")
      .withColumn("t_s", unix_timestamp(col("time")))
      .write.mode("append").partitionBy("pair", "dt").parquet(root)
    root
  }

  private def dts(root: String): Set[String] =
    spark.read.parquet(root).select("dt").distinct()
      .collect().map(_.get(0).toString).toSet

  private val days =
    Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05")

  test("drop mode retires every dt strictly below the horizon; kept rows intact") {
    val root = mkStore(days)
    val n = Compact.retireStore(spark, root, "dt", "2024-01-03")
    assert(n === 4) // 2 pairs x 2 expired days
    assert(dts(root) === Set("2024-01-03", "2024-01-04", "2024-01-05"))
    assert(spark.read.parquet(root).count() === 6)
    // idempotent: nothing left below the horizon
    assert(Compact.retireStore(spark, root, "dt", "2024-01-03") === 0)
  }

  test("archive mode MOVES partitions; both homes complete, nothing deleted") {
    val root = mkStore(days)
    val arch = Files.createTempDirectory("graft-retire-arch-").toString
    val n = Compact.retireStore(spark, root, "dt", "2024-01-03", Some(arch))
    assert(n === 4)
    assert(dts(root) === Set("2024-01-03", "2024-01-04", "2024-01-05"))
    // the archive holds exactly the retired rows, partition layout intact
    val archived = spark.read.parquet(arch)
    assert(archived.count() === 4)
    assert(archived.select("dt").distinct().collect().map(_.get(0).toString)
      .toSet === Set("2024-01-01", "2024-01-02"))
  }

  test("crash window 1 (after hide, before delete): residue invisible, recovery reaps it") {
    val root = mkStore(days)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the kill: marker up, one leaf hidden, delete never ran
    val leaf = new org.apache.hadoop.fs.Path(s"$root/pair=aaa/dt=2024-01-01")
    val hidden = new org.apache.hadoop.fs.Path(
      s"$root/pair=aaa/_retired.dt~2024-01-01")
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "_retire"))
    require(fs.rename(leaf, hidden))
    // a reader between the crash and recovery NEVER sees a partial
    // partition: the hidden dir is invisible to partition discovery
    assert(!dts(root).contains("2024-01-01") ||
      spark.read.parquet(root).filter(col("dt") === "2024-01-01").count() === 1)
    Compact.recoverRetire(spark, root)
    assert(!fs.exists(hidden))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "_retire")))
    // the other pair's 01-01 partition was untouched
    assert(spark.read.parquet(root).filter(col("dt") === "2024-01-01")
      .select("pair").collect().map(_.getString(0)).toSet === Set("bbb"))
  }

  test("crash window 2 (mid-delete): partial hidden residue re-deleted on recovery") {
    val root = mkStore(days)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaf = new org.apache.hadoop.fs.Path(s"$root/pair=bbb/dt=2024-01-02")
    val hidden = new org.apache.hadoop.fs.Path(
      s"$root/pair=bbb/_retired.dt~2024-01-02")
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "_retire"))
    require(fs.rename(leaf, hidden))
    // delete died mid-way: only some files went
    val inside = fs.listStatus(hidden).filter(_.isFile)
    if (inside.nonEmpty) fs.delete(inside.head.getPath, false)
    Compact.recoverRetire(spark, root)
    assert(!fs.exists(hidden))
    // the NEXT retire still processes the remaining expired partitions
    assert(Compact.retireStore(spark, root, "dt", "2024-01-03") === 3)
    assert(dts(root) === Set("2024-01-03", "2024-01-04", "2024-01-05"))
  }

  test("recoverRetire is O(1) no-op without the marker; retire coexists with compaction") {
    val root = mkStore(days)
    // no marker: recovery must not touch anything (steady-state probe)
    Compact.recoverRetire(spark, root)
    assert(dts(root).size === 5)
    // fragment one kept partition, compact, then retire — both protocols
    // independent, store correct after both
    (1 to 9).foreach { i =>
      Seq(("aaa", "2024-01-05", java.sql.Timestamp.valueOf("2024-01-05 13:00:00"), i.toDouble))
        .toDF("pair", "dt", "time", "v")
        .withColumn("t_s", unix_timestamp(col("time")))
        .write.mode("append").partitionBy("pair", "dt").parquet(root)
    }
    assert(Compact.compactStore(spark, root, maxFragments = 4) >= 1)
    assert(Compact.retireStore(spark, root, "dt", "2024-01-04") === 6)
    assert(dts(root) === Set("2024-01-04", "2024-01-05"))
    assert(spark.read.parquet(root)
      .filter(col("pair") === "aaa" && col("dt") === "2024-01-05")
      .count() === 10)
  }

  test("live pipeline wiring: retainDays bounds the store across simulated days") {
    // drive processBatch directly (the spec harness mode) over 3 days of
    // ticks with retainDays=1 and compactEvery=1: after each day's
    // batch, only the trailing window of dt partitions survives
    val stores = graft.serving.LivePipeline.Stores(
      Files.createTempDirectory("graft-retire-live-").toString)
    val srv = new graft.serving.TickerServer(Seq.empty, heartbeatMillis = 60000L)
    def dayBatch(day: Int) = {
      val base = java.sql.Timestamp.valueOf(f"2024-01-0$day%d 00:00:00").getTime
      (0 until 180).map(i => ("usd_jpy",
        new java.sql.Timestamp(base + i * 1000L), 100.0 + i, 100.1 + i))
        .toDF("pair", "time", "bid", "ask")
        .withColumn("mid", (col("bid") + col("ask")) / 2)
    }
    (1 to 3).foreach { day =>
      graft.serving.LivePipeline.processBatch(dayBatch(day), day.toLong - 1,
        stores, srv, Seq("SMA"), Seq(3, 5),
        Seq(graft.model.Timeframe.byCode("1m")), compactEvery = 1,
        retainDays = 1)
    }
    // horizon after day 3 = 2024-01-02: day 1 retired, days 2-3 kept
    assert(dts(stores.ticks) === Set("2024-01-02", "2024-01-03"))
    assert(dts(stores.candles) === Set("2024-01-02", "2024-01-03"))
  }
}
