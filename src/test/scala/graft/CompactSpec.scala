package graft

import graft.sources.{Compact, Tables}
import org.apache.spark.sql.functions._

class CompactSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("compaction repacks a fragmented sink to ~targetBytes files, rows intact") {
    val li = Tables.lineitem(spark, d)
    val frag = java.nio.file.Files.createTempDirectory("graft-frag-").toString
    li.repartition(64).write.mode("overwrite").parquet(frag) // micro-batch litter

    val fragFiles = new java.io.File(frag).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(fragFiles === 64)

    val dst = java.nio.file.Files.createTempDirectory("graft-compact-").toString
    val target = Compact.dirBytes(spark, frag) / 4
    val outFiles = Compact.compact(spark, frag, dst, target)

    assert(outFiles <= 6, s"expected ~4-5 compacted files, got $outFiles")
    assert(outFiles >= 3, s"over-compacted to $outFiles files")
    // content identical (multiset — the synthetic fixture has duplicate
    // (orderkey, linenumber) pairs, so no column list totally orders rows)
    val a = spark.read.parquet(dst).collect().map(_.toString).sorted
    val b = li.collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("compaction without sortBy plans no shuffle (narrow coalesce repack)") {
    val li = Tables.lineitem(spark, d)
    val frag = java.nio.file.Files.createTempDirectory("graft-frag2-").toString
    li.repartition(16).write.mode("overwrite").parquet(frag)
    val p = spark.read.parquet(frag).coalesce(2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"coalesce repack must not shuffle:\n$p")
  }

  test("sortBy variant re-clusters while compacting") {
    val li = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_partkey"))
    val frag = java.nio.file.Files.createTempDirectory("graft-frag3-").toString
    li.repartition(16).write.mode("overwrite").parquet(frag)
    val dst = java.nio.file.Files.createTempDirectory("graft-compact3-").toString
    Compact.compact(spark, frag, dst, Compact.dirBytes(spark, frag) / 2,
      sortBy = Some("l_partkey"))
    // per-file partkey spans must be disjoint-ish (range-clustered), which
    // a plain coalesce of hash-scattered files can never produce
    val spans = spark.read.parquet(dst).withColumn("_f", input_file_name())
      .groupBy(col("_f"))
      .agg(min(col("l_partkey")).as("mn"), max(col("l_partkey")).as("mx"))
      .orderBy(col("mn")).collect()
    val sorted = spans.sliding(2).forall {
      case Array(a, b) => a.getLong(2) <= b.getLong(1) + 1 || a.getLong(2) <= b.getLong(2)
      case _ => true
    }
    assert(spans.length >= 2 && sorted, "range re-clustering failed")
  }
}
