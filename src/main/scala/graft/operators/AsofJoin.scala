package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — attach to each left row the most recent right row with
  * `right.time <= left.time` within the same key group. The canonical
  * time-series operator Spark has no native form for (and the join a
  * trading engine runs constantly: tick → latest candle, order → prevailing
  * quote).
  *
  * Implementation is the single-shuffle union trick, not a join:
  * tag both sides, union, and run `last(col, ignoreNulls)` over a
  * (keys)-partitioned window ordered by (time, side) — each left row reads
  * the running carry of the latest right payload. One shuffle + one sort,
  * no range-join blow-up, no per-key skew beyond the sort itself. At 100 TB
  * both sides shuffle once on the key columns; the window state is O(1) per
  * row (the carried payload), so executor memory is flat.
  *
  * Ties (`right.time == left.time`): the right row sorts first (side 0 <
  * side 1), so an exactly-simultaneous right row IS visible to the left row
  * — matching DuckDB/pandas `ASOF JOIN` `>=` semantics, which the oracle
  * checks.
  */
object AsofJoin {

  /** Inner as-of join: left rows with no prior right row are dropped.
    * `rightCols` are the payload columns to carry from the right side;
    * the right row's own event time arrives as `asof_time`. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               timeCol: String, rightCols: Seq[String]): DataFrame = {
    require(rightCols.nonEmpty, "as-of join needs at least one right payload column")
    val leftCols = left.columns.filterNot(keys.contains).filterNot(_ == timeCol)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(col(timeCol), lit(1).as("_side")) ++
        leftCols.map(col) ++
        Seq(lit(null).cast("timestamp").as("_r_time")) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val taggedRight = right.select(
      keys.map(col) ++ Seq(col(timeCol), lit(0).as("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(timeCol).as("_r_time")) ++
        rightCols.map(c => col(c).as(s"_r_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedLeft.unionByName(taggedRight)
      .withColumn("asof_time", last(col("_r_time"), ignoreNulls = true).over(w))
    val withPayload = rightCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    withPayload
      .filter(col("_side") === 1 && col("asof_time").isNotNull)
      .select(keys.map(col) ++ Seq(col(timeCol)) ++ leftCols.map(col) ++
        Seq(col("asof_time")) ++ rightCols.map(c => col(s"asof_$c")): _*)
  }
}
