package graft
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-16 optimization profiler: runs named queries under the SAME
  * session config as [[Bench]] and attributes each cell's wall time to
  * executor compute vs shuffle vs driver/scheduling gap, per guide §1
  * ("decide whether the time is going to shuffle read, shuffle write,
  * executor compute, scheduler delay"). Local mode has no UI here, so a
  * listener stands in for the Stages tab.
  *
  * Output per query (after one untimed warm run):
  *   wall      min wall-clock over SPARK_GRAFT_RUNS timed runs
  *   jobs/stages/tasks  count in the LAST timed run
  *   cpu       sum of executorRunTime (ms) — the parallelizable work
  *   gc        sum of jvmGCTime (ms)
  *   sh_r/sh_w shuffle bytes read/written
  *   in        bytes read from storage
  *   gap       wall − (cpu / cores): driver, planning, scheduling, barriers
  */
object Profile16 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val cpuMs = new AtomicLong; val gcMs = new AtomicLong
    val shR = new AtomicLong; val shW = new AtomicLong; val inB = new AtomicLong
    val fetchMs = new AtomicLong; val serMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          cpuMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
          shR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          inB.addAndGet(m.inputMetrics.bytesRead)
          fetchMs.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
          serMs.addAndGet(m.resultSerializationTime)
        }
      }
    })
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); cpuMs.set(0); gcMs.set(0)
      shR.set(0); shW.set(0); inB.set(0); fetchMs.set(0); serMs.set(0)
    }

    val names =
      if (args.nonEmpty) args.toSeq.flatMap(_.split(",")).filter(_.nonEmpty)
      else SparkEntry.queries.keys.toSeq.sorted
    println(f"${"query"}%-28s ${"wall"}%7s ${"jobs"}%5s ${"stg"}%4s ${"task"}%5s " +
      f"${"cpu_s"}%7s ${"gc"}%5s ${"shR"}%9s ${"shW"}%9s ${"in"}%9s ${"gap_s"}%6s")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => println(s"[profile16] unknown query: $n")
        case Some(fn) =>
          try fn(spark, sfDir).count() catch { case e: Throwable =>
            println(s"[profile16] $n warm run failed: ${e.getMessage}") }
          var best = Double.MaxValue
          (1 to runs).foreach { _ =>
            reset()
            spark.sparkContext.setJobDescription(s"profile16: $n")
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            val t = (System.nanoTime() - t0) / 1e9
            best = math.min(best, t)
          }
          Thread.sleep(200) // let listener drain
          val gap = best - cpuMs.get / 1000.0 / cpus.toDouble
          def mb(x: Long) = f"${x / 1024.0 / 1024.0}%8.1fM"
          println(f"$n%-28s $best%7.2f ${jobs.get}%5d ${stages.get}%4d " +
            f"${tasks.get}%5d ${cpuMs.get / 1000.0}%7.1f ${gcMs.get}%5d " +
            f"${mb(shR.get)} ${mb(shW.get)} ${mb(inB.get)} $gap%6.2f")
      }
    }
    spark.stop()
  }
}
