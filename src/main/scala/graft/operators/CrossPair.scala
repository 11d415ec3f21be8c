package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-series analytics: statistics BETWEEN two aligned price series (the
  * reference computes every indicator within one series; relating two pairs
  * — correlation for diversification, beta for hedge sizing — is the next
  * thing a trading warehouse gets asked for).
  *
  * Scale shape: one output series per (pairA, pairB) combination, bounded
  * like the indicator folds (a year of 1m bars ≈ 525k rows), so the
  * unpartitioned time-ordered window is a deliberate single-task tail on a
  * tiny aligned join — the heavy lifting (candle aggregation) happened
  * upstream, partitioned. Numerics follow the w8 convention: moments are
  * EXACT decimal window sums of exact decimal diffs; floats appear only in
  * the one final correlation/beta expression, spelled identically in the
  * DuckDB oracle.
  */
object CrossPair {

  /** Rolling Pearson correlation and OLS beta of close-to-close changes
    * between two pairs' candle series, joined on the candle timestamp
    * (inner — minutes where either side is missing produce no row, and the
    * diffs are taken over the JOINED grid so both series skip the same
    * gaps). NULL until `n` diffs exist or while either variance term is
    * zero. */
  def rollingCorrelation(candles: DataFrame, pairA: String, pairB: String,
                         n: Int = 30): DataFrame = {
    require(n >= 2, s"window must be >= 2, got $n")
    require(pairA != pairB, "pairs must differ")
    val a = candles.filter(col("pair") === pairA)
      .select(col("time"), col("close").cast("decimal(12,6)").as("ca"))
    val b = candles.filter(col("pair") === pairB)
      .select(col("time"), col("close").cast("decimal(12,6)").as("cb"))
    val w = Window.orderBy(col("time"))
    val frame = w.rowsBetween(-(n - 1), Window.currentRow)
    val nd = lit(n.toDouble)
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val vx = nd * col("sxx").cast("double") - sx * sx
    val vy = nd * col("syy").cast("double") - sy * sy
    val cov = nd * col("sxy").cast("double") - sx * sy
    a.join(b, "time")
      .withColumn("dx", col("ca") - lag(col("ca"), 1).over(w))
      .withColumn("dy", col("cb") - lag(col("cb"), 1).over(w))
      .withColumn("rn", row_number().over(w))
      .withColumn("sx", sum(col("dx")).over(frame))
      .withColumn("sy", sum(col("dy")).over(frame))
      .withColumn("sxy", sum(col("dx") * col("dy")).over(frame))
      .withColumn("sxx", sum(col("dx") * col("dx")).over(frame))
      .withColumn("syy", sum(col("dy") * col("dy")).over(frame))
      .select(col("time"), lit(n).as("n"),
        when(col("rn") >= n + 1 && vx > 0.0 && vy > 0.0,
          cov / sqrt(vx * vy)).as("corr"),
        when(col("rn") >= n + 1 && vx > 0.0, cov / vx).as("beta"))
  }
}
