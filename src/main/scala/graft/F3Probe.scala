package graft

import graft.operators.{Flows, Indicators}
import graft.queries.TradingQueries
import org.apache.spark.sql.SparkSession

/** One-off probe: exchange count + wall time of the F3 grid, fused vs
  * per-branch, at a given SF dir (diagnostic main, not part of the gate). */
object F3Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = new Config(Map("DEFAULT_PERIODS" -> "14,28,56",
      "DEFAULT_TIMEFRAMES" -> "1m,5m,30m,1h,4h"))
    val candles = Flows.candleFlow(TradingQueries.ticks(spark, d), cfg)
    def run(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(plan).length
      df.count() // warm
      val t0 = System.nanoTime()
      val n = df.count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[f3probe] $name rows=$n exchanges=$ex time=$t%.2fs")
    }
    val inds = Seq("RSI", "SMA", "EMA"); val ps = cfg.periods
    run("branch", Indicators.indicatorFacts(candles, inds, ps))
    run("fused ", Indicators.indicatorFactsFused(candles, inds, ps))
    spark.stop()
  }
}
