package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates for cardinality/quantile questions at 100 TB,
  * where exactness costs a full shuffle of the distinct keys:
  *
  *  - `approx_count_distinct` (HyperLogLog++): fixed-size sketch, map-side
  *    partial merge — the only sane way to count distinct users per slice
  *    on a petabyte stream. Deterministic for fixed input (no RNG), but the
  *    estimate differs across engines' sketch implementations, so these are
  *    checked by *error-bound specs* against exact counts, not by the
  *    cross-engine oracle.
  *  - `approx_percentile`: bounded-memory quantiles for latency/value
  *    distributions.
  *
  * Both are Spark built-ins — composing them per slice is the operator;
  * nothing custom needed (and per the design rules, built-ins win). */
object Sketches {

  /** Distinct users per event type: exact vs HLL++ side by side (`rsd` is
    * the target relative standard deviation). */
  def distinctUsersPerType(events: DataFrame, rsd: Double = 0.05): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), rsd).as("approx_users"))

  /** Value quantiles per event type via the approximate percentile sketch. */
  def valueQuantiles(events: DataFrame, probabilities: Seq[Double],
                     accuracy: Int = 10000): DataFrame = {
    val probs = array(probabilities.map(lit): _*)
    events.groupBy(col("event_type"))
      .agg(percentile_approx(col("value"), probs, lit(accuracy)).as("quantiles"))
  }
}
