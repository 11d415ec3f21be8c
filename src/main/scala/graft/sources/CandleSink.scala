package graft.sources

import graft.operators.Incremental
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** S7/S8: persistent partitioned candle/fact store.
  *
  * The reference materializes one physical table per (pair, timeframe)
  * (reference: src/etl/flows/transform_services.py:9-26, 35-50 — dynamic
  * `CREATE TABLE ohlc.<pair>_<tf>`); here the table *family* collapses to
  * one parquet dataset partitioned by the same keys, so
  * `WHERE pair = … AND timeframe = …` prunes to exactly the files the
  * reference would have read from its dedicated table — same I/O, no DDL.
  *
  * Writes are idempotent first-write-wins ([[Incremental.newRows]] against
  * the current sink contents, ON CONFLICT DO NOTHING semantics): re-running
  * a transform appends nothing for already-written keys. The anti-join
  * reads the sink *pruned to the incoming partitions* — at 100 TB an
  * incremental run touches only the (pair, timeframe) directories it is
  * writing into, not the whole history.
  */
object CandleSink {

  val PartitionKeys: Seq[String] = Seq("pair", "timeframe")
  val DedupKeys: Seq[String] = Seq("pair", "timeframe", "time")

  private def exists(spark: SparkSession, path: String): Boolean =
    try { spark.read.parquet(path); true }
    catch { case _: org.apache.spark.sql.AnalysisException => false }

  /** Idempotent partitioned append: writes only rows whose dedup key is not
    * already present. Returns the number of rows appended. */
  def append(spark: SparkSession, candles: DataFrame, path: String): Long = {
    val novel =
      if (!exists(spark, path)) candles
      else {
        // prune the existing side to the partitions being touched
        val touched = candles.select(PartitionKeys.map(col): _*).distinct()
        val existing = spark.read.parquet(path).join(touched, PartitionKeys, "left_semi")
        Incremental.newRows(existing, candles, DedupKeys)
      }
    // count once, write once: cheap vs. a second full read of the sink
    val out = novel.cache()
    try {
      val n = out.count()
      if (n > 0)
        out.write.partitionBy(PartitionKeys: _*).mode("append").parquet(path)
      n
    } finally out.unpersist()
  }

  /** Read back, optionally pruned — filters on the partition keys reach the
    * directory listing (partition pruning), not the row scan. */
  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}
