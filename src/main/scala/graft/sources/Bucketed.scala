package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout: the co-located fact-fact join path at 100 TB.
  *
  * A repeated join between two big facts (orders ⋈ lineitem every run)
  * shuffles both sides every time. Writing both sides bucketed on the join
  * key — same bucket count, sorted within buckets — pins Spark's hash
  * partitioning into the FILE LAYOUT: the scan reports the bucketing as its
  * output partitioning, and the sort-merge join plans with ZERO exchanges
  * and zero sorts (see BucketingSpec's plan tripwire). At scale this turns
  * the dominant recurring shuffle (TBs re-hashed per run) into a one-time
  * layout cost at ingest; it also survives AQE and is the batch analogue of
  * the candle sink's partition pruning (prune what you can, co-locate what
  * you must join).
  *
  * The reference's Postgres schema gets this implicitly from btree indexes
  * on the join keys (reference: alembic DDL — every fact carries a
  * (pair, time)-ish key); bucketing is the Spark-native restatement.
  */
object Bucketed {

  /** Write `df` as an external bucketed+sorted table at `path`. Bucket count
    * is a layout contract: both sides of a co-located join must use the
    * same `buckets` (and Spark only avoids the shuffle when
    * shuffle-partition alignment allows — keep bucket counts a divisor of
    * the cluster's parallelism target). */
  def writeBucketed(df: DataFrame, path: String, table: String,
                    keys: Seq[String], buckets: Int): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key")
    // repartition on the SAME hash the bucketing uses → exactly one file
    // per bucket. One-file-per-bucket is what lets the scan report its
    // sort order (multi-file buckets force a re-sort before a merge join);
    // it caps write parallelism at `buckets`, so at ingest scale pick
    // buckets ≈ the cluster's target parallelism, not a small constant.
    df.repartition(buckets, keys.map(org.apache.spark.sql.functions.col): _*)
      .write
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }
}
