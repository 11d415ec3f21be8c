package graft

import java.nio.file.Files

import graft.sources.Bucketed
import org.apache.spark.sql.functions._

/** Plan tripwire for the bucketed co-located join path (Bucketed.scala):
  * two tables bucketed+sorted on the join key must sort-merge join with
  * ZERO shuffle exchanges and zero sorts — the file layout IS the
  * partitioning. If a Spark upgrade or a conf default ever silently
  * reintroduces the shuffle, this suite fails before the bench does. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed co-located join: zero exchanges, zero sorts, right rows") {
    val tmp = Files.createTempDirectory("graft-bucketed-").toString
    val a = (1L to 1000L).map(k => (k, k * 2)).toDF("k", "va")
    val b = (1L to 500L).map(k => (k, k * 3)).toDF("k", "vb")
    Bucketed.writeBucketed(a, s"$tmp/a", "bkt_a", Seq("k"), buckets = 4)
    Bucketed.writeBucketed(b, s"$tmp/b", "bkt_b", Seq("k"), buckets = 4)
    try {
      // disable broadcast (both static and AQE thresholds): the point is
      // the sort-merge path's shuffle, which broadcast would mask
      // outputOrdering: since Spark 3.1 the scan's per-bucket sort order is
      // not propagated by default (multi-file buckets made it unsafe —
      // SPARK-33465); writeBucketed guarantees one file per bucket, which
      // is exactly the case the legacy flag makes sort-free again
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true") {
        val j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        val rows = j.agg(count(lit(1)), sum($"va" + $"vb")).collect().head
        assert(rows.getLong(0) === 500L)
        assert(rows.getLong(1) === (1L to 500L).map(k => k * 5).sum)
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join must not shuffle:\n$plan")
        val sorts = plan.linesIterator
          .count(l => l.trim.stripPrefix("+- ").stripPrefix(":- ").startsWith("Sort ["))
        assert(sorts === 0, s"bucket-sorted scans must not re-sort:\n$plan")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("composite-key bucketing co-locates multi-column joins shuffle-free") {
    val tmp = Files.createTempDirectory("graft-bucketed-").toString
    val a = (1L to 400L).map(k => (k % 7, k, k * 2)).toDF("p", "t", "va")
    val b = (1L to 400L).filter(_ % 2 == 0).map(k => (k % 7, k, k * 3)).toDF("p", "t", "vb")
    Bucketed.writeBucketed(a, s"$tmp/a", "bkt_m_a", Seq("p", "t"), buckets = 4)
    Bucketed.writeBucketed(b, s"$tmp/b", "bkt_m_b", Seq("p", "t"), buckets = 4)
    try {
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true") {
        val j = spark.table("bkt_m_a").join(spark.table("bkt_m_b"), Seq("p", "t"))
        assert(j.count() === 200L)
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"composite-key bucketed join must not shuffle:\n$plan")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_m_a")
      spark.sql("DROP TABLE IF EXISTS bkt_m_b")
    }
  }

  test("bucketed scan still prunes columns and pushes filters") {
    val tmp = Files.createTempDirectory("graft-bucketed-").toString
    val a = (1L to 1000L).map(k => (k, k * 2, s"pad$k")).toDF("k", "va", "pad")
    Bucketed.writeBucketed(a, s"$tmp/a", "bkt_c", Seq("k"), buckets = 4)
    try {
      val q = spark.table("bkt_c").filter($"k" === 7L).select($"va")
      assert(q.collect().map(_.getLong(0)).toSeq === Seq(14L))
      val scan = q.queryExecution.executedPlan.toString
      assert(scan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,7)]"),
        s"filter must reach the bucketed scan:\n$scan")
      assert(scan.contains("ReadSchema: struct<k:bigint,va:bigint>"),
        s"pad column must be pruned:\n$scan")
    } finally spark.sql("DROP TABLE IF EXISTS bkt_c")
  }
}
