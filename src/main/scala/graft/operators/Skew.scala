package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) is the first
  * line of defense and needs no code; these helpers cover the two cases
  * AQE cannot fix: a hot GROUP BY key (one reducer owns the whole key) and
  * a shuffled join against a replicable-but-not-broadcastable side.
  *
  * Salts are derived deterministically from the full row (xxhash64 mod
  * salts), not `rand()` — re-runs and retried tasks produce identical
  * partials, keeping jobs idempotent.
  */
object Skew {

  private val SaltCol = "_salt"

  /** Two-phase salted aggregation for algebraic aggregates over skewed
    * keys: partial-agg on (keys + salt) spreads a hot key over `salts`
    * reducers, final agg merges the ≤ `salts` partials per key.
    * `aggs` maps column → op ∈ {sum, count, min, max}. */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                aggs: (String, String)*): DataFrame = {
    require(salts > 0, "salts must be positive")
    val ops = Set("sum", "count", "min", "max")
    aggs.foreach { case (_, op) => require(ops(op), s"unsupported op: $op") }
    val salted = df.withColumn(SaltCol,
      pmod(xxhash64(df.columns.map(col): _*), lit(salts.toLong)))
    val partialAggs = aggs.map { case (c, op) =>
      expr(s"$op($c)").as(s"_p_${op}_$c")
    }
    val partial = salted.groupBy((keys :+ SaltCol).map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = aggs.map { case (c, op) =>
      val merge = if (op == "count") "sum" else op // counts merge by summing
      expr(s"$merge(`_p_${op}_$c`)").as(s"${op}_$c")
    }
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join for a skewed big side: big rows get a deterministic
    * salt, the (small, but above the broadcast threshold) right side is
    * replicated across all `salts` values, and the join key becomes
    * (keys + salt) — the hot key's rows spread over `salts` reducers.
    * Results equal the plain inner join. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val bigS = big.withColumn(SaltCol,
      pmod(xxhash64(big.columns.map(col): _*), lit(salts.toLong)))
    val smallS = small.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    bigS.join(smallS, keys :+ SaltCol).drop(SaltCol)
  }
}
