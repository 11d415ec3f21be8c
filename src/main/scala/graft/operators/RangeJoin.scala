package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band/interval range join: pair each left row with the right rows whose
  * time falls in `[left.time + lowerSec, left.time + upperSec]` within the
  * same key group — "candles in the five minutes after each signal",
  * "quotes around each fill". Spark plans a raw time-inequality join as
  * BroadcastNestedLoop (O(n·m)); this implementation buckets both sides by
  * a window of the band width and equi-joins on (keys, bucket):
  *
  *  - right rows land in 1 bucket: `floor(t / w)`;
  *  - left rows replicate to each bucket their band `[t+lower, t+upper]`
  *    overlaps — at most 2 for `w = band width`;
  *  - the exact band predicate filters the per-bucket pairs; no duplicate
  *    results are possible since each right row has exactly one bucket.
  *
  * One shuffle per side on (keys, bucket) — uniform, high-cardinality,
  * scale-clean. Cost is the true output size plus near-miss pairs inside
  * shared buckets. Output columns: keys, then left columns prefixed `l_`,
  * then right columns prefixed `r_`. */
object RangeJoin {

  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                timeCol: String, lowerSec: Long, upperSec: Long): DataFrame = {
    require(upperSec >= lowerSec, s"empty band: [$lowerSec, $upperSec]")
    val w = math.max(upperSec - lowerSec, 1L)
    def prefixed(df: DataFrame, p: String): DataFrame =
      df.select(keys.map(col) ++
        df.columns.filterNot(keys.contains).map(c => col(c).as(s"$p$c")): _*)
    val lt = unix_timestamp(col(s"l_$timeCol"))
    val rt = unix_timestamp(col(s"r_$timeCol"))
    val leftB = prefixed(left, "l_").withColumn("_bucket",
      explode(sequence(
        floor((lt + lowerSec) / w).cast("long"),
        floor((lt + upperSec) / w).cast("long"))))
    val rightB = prefixed(right, "r_")
      .withColumn("_bucket", floor(rt / w).cast("long"))
    leftB.join(rightB, keys :+ "_bucket")
      .filter(rt.between(lt + lowerSec, lt + upperSec))
      .drop("_bucket")
  }
}
