package graft

import graft.sources.{Tables, ZOrder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The Z-order layout's claim is measurable from parquet's own pruning
  * metadata: per-FILE min/max spans of each key column (exactly what footer
  * stats expose to the scan planner). A single-column range layout leaves
  * the other column's per-file span at ~the full range (no pruning); the
  * Morton layout must tighten BOTH. */
class ZOrderSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** Mean per-file span of `c`, normalized by the column's global range. */
  private def meanSpan(files: DataFrame, c: String): Double = {
    val g = files.agg((max(col(c)) - min(col(c))).cast("double")).head.getDouble(0)
    val spans = files.withColumn("_f", input_file_name())
      .groupBy(col("_f"))
      .agg(((max(col(c)) - min(col(c))).cast("double") / g).as("s"))
    spans.agg(avg(col("s"))).head.getDouble(0)
  }

  test("morton interleave is the bit-exact 2-D curve") {
    import spark.implicits._
    val got = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (1L, 1L), (2L, 1L))
      .toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // spread(65535) = 0x55555555 (evens); b shifts to odds
    assert(got === Seq(0L, 0x55555555L, 0xAAAAAAAAL, 3L, 0x6L))
  }

  test("z-order tightens per-file min/max spans on BOTH dimensions") {
    val li = Tables.lineitem(spark, d)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))

    val base = java.nio.file.Files.createTempDirectory("graft-zbase-").toString
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(base)

    val zdir = java.nio.file.Files.createTempDirectory("graft-zord-").toString
    ZOrder.writeZOrdered(li, "l_partkey", "l_suppkey", numFiles = 8, zdir)

    // same rows either way
    assert(spark.read.parquet(zdir).count() === li.count())

    val b = spark.read.parquet(base)
    val z = spark.read.parquet(zdir)
    val basePk = meanSpan(b, "l_partkey")
    val baseSk = meanSpan(b, "l_suppkey")
    val zPk = meanSpan(z, "l_partkey")
    val zSk = meanSpan(z, "l_suppkey")

    // the single-column layout nails its own column but leaves the other
    // dimension unprunable (every file spans ~the whole suppkey range)
    assert(basePk < 0.3, s"range layout should cluster partkey, got $basePk")
    assert(baseSk > 0.8, s"baseline suppkey span should be ~full, got $baseSk")
    // 8 z-files over a 2-D curve → each covers ~1/√8 ≈ 0.35 of EACH dim
    assert(zPk < 0.6, s"z-order partkey span too wide: $zPk")
    assert(zSk < 0.6, s"z-order suppkey span too wide: $zSk")
  }
}
