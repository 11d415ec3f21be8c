package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-OVERLAP join — the second time-inequality join Spark lacks
  * natively (the first, point-in-band, is [[RangeJoin]]): all pairs of
  * closed intervals `[start_s, end_s]` with `l.start ≤ r.end ∧
  * r.start ≤ l.end` (concurrent sessions, colliding maintenance windows,
  * position-overlap in genomics-style data).
  *
  * Spark plans the naive inequality join as a BroadcastNestedLoop — O(n·m)
  * comparisons and a broadcast of a scale-growing side. Here each interval
  * replicates to the fixed-width time buckets it covers, pairs meet in an
  * EQUI-join on the bucket, the exact predicate filters, and each
  * surviving pair is ATTRIBUTED to exactly one bucket — the bucket of
  * `max(l.start, r.start)` (the overlap's left edge, which both sides
  * provably cover) — so no `distinct` pass is ever needed.
  *
  * Scale: shuffle keys are buckets (uniform, high-cardinality over time);
  * replication factor per row is `len/bucketSec + 1`, so pick `bucketSec`
  * near the typical interval length. Join output per bucket is
  * (intervals alive in that bucket)² — the same locality bound any
  * interval-tree would give, reached with plain hash-shuffle machinery.
  */
object IntervalJoin {

  /** Overlap-join `left` and `right` (each with BIGINT `start_s`/`end_s`
    * columns, payload columns free-form). Output carries every column of
    * both sides under `lPrefix`/`rPrefix`. */
  def overlapJoin(left: DataFrame, right: DataFrame, bucketSec: Long,
                  lPrefix: String = "l_", rPrefix: String = "r_",
                  maxReplication: Long = 100000L): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be positive, got $bucketSec")
    // fail FAST on degenerate intervals, both kinds: one open-ended/sentinel
    // row (end_s = Long.MaxValue) would otherwise explode into an
    // end/bucketSec-element sequence and OOM an executor or hit Spark's
    // sequence-length ceiling mid-job; and an INVERTED interval
    // (end_s < start_s, e.g. swapped columns upstream) yields _nrep ≤ 0,
    // where sequence(start, stop) with stop < start silently generates a
    // DESCENDING sequence — the same explosion the cap exists to prevent
    def side(df: DataFrame, p: String) = {
      val renamed = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, p + c))
      renamed
        .withColumn("_nrep",
          expr(s"${p}end_s div $bucketSec - ${p}start_s div $bucketSec + 1"))
        .withColumn("_nrep",
          when(col("_nrep") >= 1 && col("_nrep") <= maxReplication, col("_nrep"))
          .otherwise(raise_error(concat(
            lit(s"degenerate interval (inverted, or spanning more than $maxReplication buckets of ${bucketSec}s): ["),
            col(s"${p}start_s"), lit(", "), col(s"${p}end_s"),
            lit("] — fix the interval or raise bucketSec")))))
        .withColumn("bkt", explode(sequence(
          expr(s"${p}start_s div $bucketSec"),
          expr(s"${p}start_s div $bucketSec") + col("_nrep") - 1)))
        .drop("_nrep")
    }
    // both sides are EVENT-scale bucket replicas below a Generate — the
    // size estimate is bogus and a broadcast of either side is the r14
    // trap: pin the shuffled hash join on the bucket key
    side(left, lPrefix).join(side(right, rPrefix).hint("shuffle_hash"), Seq("bkt"))
      .filter(col(s"${lPrefix}start_s") <= col(s"${rPrefix}end_s") &&
        col(s"${rPrefix}start_s") <= col(s"${lPrefix}end_s"))
      // one-bucket attribution: both sides cover the overlap's left edge,
      // so exactly one replica pair survives — dedup without a shuffle
      .filter(expr(s"greatest(${lPrefix}start_s, ${rPrefix}start_s) div $bucketSec") === col("bkt"))
      .drop("bkt")
  }
}
