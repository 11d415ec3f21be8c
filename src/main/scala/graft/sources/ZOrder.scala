package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton space-filling curve) layout for multi-dimensional scan
  * pruning — the lakehouse file-skipping technique for the case bucketing
  * can't serve: range predicates over TWO independent columns.
  *
  * A single-column range layout gives parquet min/max footer stats that
  * prune only that column; any predicate on the second column reads every
  * file. Interleaving the bits of both (rank-normalized) keys and
  * range-partitioning + sorting on the interleaved value makes every file
  * cover a compact RECTANGLE of the 2-D key space, so min/max stats prune
  * on BOTH dimensions (each of F files spans ~1/√F of each dim's range
  * instead of 1 full range). Pure column algebra — the bit-spreading is
  * the classic 4-step mask cascade, whole-stage-codegen'd; the curve key
  * is dropped before write, so the layout costs nothing at read time.
  *
  * At 100 TB: one repartitionByRange shuffle at write time (the same cost
  * any clustered layout pays once) buys every subsequent 2-D-selective
  * scan a ~√F-fold file cut. Normalization uses global min/max (one tiny
  * scalar broadcast) — rank-based normalization would resist skew better
  * but costs a full sort; min/max is the standard engineering trade.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions (Morton): the
    * 4-step shift-or-mask cascade. Input must already be in [0, 65535]. */
  private def spread(c: Column): Column = {
    val m1 = lit(0x00FF00FFL)
    val m2 = lit(0x0F0F0F0FL)
    val m3 = lit(0x33333333L)
    val m4 = lit(0x55555555L)
    val x0 = c.cast("long")
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(m1)
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(m2)
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(m3)
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(m4)
  }

  /** Morton-interleave two 16-bit-normalized columns into a 32-bit curve key. */
  def zValue(a16: Column, b16: Column): Column =
    spread(a16).bitwiseOR(shiftleft(spread(b16), 1))

  /** Min-max scale a numeric column to the 16-bit grid [0, 65535] given its
    * global bounds (pass the bounds in as columns from a broadcast scalar
    * row). Degenerate ranges (min == max) map to 0. */
  def norm16(c: Column, mn: Column, mx: Column): Column =
    when(mx === mn, lit(0L)).otherwise(
      floor((c - mn).cast("double") / (mx - mn).cast("double") * 65535.0)
        .cast("long"))

  /** Write `df` to `path` as `numFiles` parquet files Z-ordered on the two
    * columns: one range shuffle on the curve key, sorted within partitions
    * so row-group stats are tight too; the curve key never hits disk. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    numFiles: Int, path: String): Unit = {
    val bounds = df.agg(
      min(col(colA)).as("_mna"), max(col(colA)).as("_mxa"),
      min(col(colB)).as("_mnb"), max(col(colB)).as("_mxb"))
    df.crossJoin(broadcast(bounds))
      .withColumn("_z", zValue(
        norm16(col(colA), col("_mna"), col("_mxa")),
        norm16(col(colB), col("_mnb"), col("_mxb"))))
      .drop("_mna", "_mxa", "_mnb", "_mxb")
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
