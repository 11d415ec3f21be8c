package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Memory-pressure probe (round-12): re-runs a representative query subset
  * with every spillable operator FORCED onto its disk path, proving the
  * engine's answers are spill-invariant — the property a 1000-executor run
  * against 100 TB actually relies on, which the healthy-memory local[32]
  * records (BASELINE.md) could not exercise.
  *
  * Mechanism: Spark's own force-spill thresholds, not heap starvation — a
  * tiny heap makes runs flaky-OOM and proves nothing about WHERE the spill
  * happened; thresholds make every external structure spill deterministically
  * after N elements, on the exact code paths (UnsafeExternalSorter spill
  * files, sort-based ObjectHashAggregate fallback, WindowExec/SMJ buffer
  * spills, HashAggregate sort-fallback) a memory-pressured cluster executor
  * would take:
  *   - spark.shuffle.spill.numElementsForceSpillThreshold — every shuffle /
  *     SQL external sort spills each 20k-element run to disk;
  *   - spark.sql.windowExec.buffer.spill.threshold — window frame buffers;
  *   - spark.sql.sortMergeJoinExec.buffer.spill.threshold — SMJ match
  *     buffers;
  *   - spark.sql.sessionWindow.buffer.spill.threshold — session windows;
  *   - spark.sql.objectHashAggregate.sortBased.fallbackThreshold — typed /
  *     object aggs (collect_list, min_by, sketches) fall back to the
  *     sort-based path after 128 distinct keys per partition;
  *   - spark.sql.TungstenAggregate.testFallbackStartsAt — HashAggregate
  *     switches to its sort-based external fallback mid-build.
  *
  * A stage-metrics listener records memory/disk bytes spilled per query (the
  * proof spills actually happened — a run with zero spill bytes would be
  * vacuous). Output layout is Verify-compatible, so the same DuckDB harness
  * (`tools/check_oracle.py`) hash-compares the spilled runs' results against
  * the oracles. Summary JSON goes to `outDir/spill_probe.json` and stdout.
  *
  * Usage: `runMain graft.SpillProbe <sfDir> <outDir> [names]`
  */
object SpillProbe {

  /** Widest shuffle (q18), scan-heavy agg (q1), iterative CC, banded dedup
    * shuffle, fused 45-branch grid, sorted-group dual-recursion fold, union
    * window as-of, sliding window, two-phase prefix-sum packing, and a real
    * multi-batch streaming gate — one representative per spillable shape. */
  private val Default = Seq(
    "q18_large_orders", "q1_pricing_summary", "llm_dedup_clusters",
    "llm_dedup_minhash", "f3_indicator_grid", "s8h_idempotent_macd",
    "j4_asof_tick_candle", "w5_twap_sliding", "llm_pack_examples",
    "t4_relay_sink")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/spill_probe"
    val names =
      if (args.length > 2) args(2).split(",").toSeq.filter(_.nonEmpty)
      else Default
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      // ---- forced-spill thresholds (see scaladoc) ----
      .config("spark.shuffle.spill.numElementsForceSpillThreshold", "20000")
      .config("spark.sql.windowExec.buffer.spill.threshold", "20000")
      .config("spark.sql.windowExec.buffer.in.memory.threshold", "4096")
      .config("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "20000")
      .config("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", "4096")
      .config("spark.sql.sessionWindow.buffer.spill.threshold", "20000")
      .config("spark.sql.sessionWindow.buffer.in.memory.threshold", "4096")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
      .config("spark.sql.TungstenAggregate.testFallbackStartsAt", "10000,20000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-stage spill accounting; queries run sequentially, so snapshot
    // deltas attribute stage spills to the query that scheduled them
    @volatile var mem = 0L
    @volatile var disk = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) { mem += m.memoryBytesSpilled; disk += m.diskBytesSpilled }
      }
    })

    new java.io.File(outDir).mkdirs()
    val rows = names.map { name =>
      val fn = SparkEntry.queries(name)
      val (m0, d0) = (mem, disk)
      val t0 = System.nanoTime()
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously (the bus is private[spark]);
      // poll until two consecutive snapshots agree before attributing —
      // bounded, so a lingering event trickle (e.g. a streaming query's
      // stages) degrades to approximate attribution instead of a hang
      var prev = (-1L, -1L)
      var settled = 0
      val settleDeadline = System.currentTimeMillis() + 30000
      while (settled < 2 && System.currentTimeMillis() < settleDeadline) {
        val cur = (mem, disk)
        if (cur == prev) settled += 1 else { settled = 0; prev = cur }
        Thread.sleep(100)
      }
      if (settled < 2) println(
        s"[spill] WARN: listener drain did not settle in 30s for $name; " +
        "spill attribution may include trailing stages")
      val r = (name, sec, mem - m0, disk - d0)
      println(f"[spill] $name%-28s ${sec}%8.2f s  spillMem=${(mem - m0) / 1e6}%9.1f MB  spillDisk=${(disk - d0) / 1e6}%9.1f MB")
      r
    }

    def q(s: String) = "\"" + s + "\""
    val json =
      s"""{"metric":"spill_probe","sf":"$sfDir","forced":true,
         |"queries":{${rows.map { case (n, s, m, d) =>
        s"${q(n)}:{\"sec\":${f"$s%.2f"},\"spill_mem_b\":$m,\"spill_disk_b\":$d}"
      }.mkString(",")}},
         |"total_spill_mem_b":${rows.map(_._3).sum},
         |"total_spill_disk_b":${rows.map(_._4).sum}}""".stripMargin
        .replaceAll("\n", "")
    println(json)
    Files.writeString(Paths.get(s"$outDir/spill_probe.json"), json)

    // oracle_sql.json for the subset → tools/check_oracle.py compares the
    // spilled results by hash, same harness as the driver gate
    def esc(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sql = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${esc(k)}: ${esc(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), sql)
    spark.stop()
  }
}
