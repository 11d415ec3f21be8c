package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Tripwires on the [[ScaleUp]] corpus CONSTRUCTION (the round-8 analogue
  * of ScaleProbeSpec's guards on the round-7 text/embedding replicas): the
  * full-suite sf1 measurements in BASELINE.md are only meaningful if the
  * synthesized corpus scales every table exactly linearly, keeps replica
  * key spaces disjoint, and preserves referential integrity — a broken
  * construction would silently measure the wrong thing. */
class ScaleUpSpec extends SparkSpec {

  private lazy val out = {
    val dir = Files.createTempDirectory("graft-scaleup-").toString
    ScaleUp.generate(spark, "/root/testdata/sf0.001", dir, factor = 2)
    dir
  }
  private def base(n: String) =
    graft.sources.Tables.read(spark, "/root/testdata/sf0.001", n)
  private def big(n: String) = spark.read.parquet(s"$out/$n.parquet")

  test("every scaled table is exactly factor x rows; fixed dims unchanged") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "documents", "embeddings")) {
      assert(big(t).count() === 2 * base(t).count(), s"table $t not 2x")
    }
    assert(big("events").count() ===
      2 * graft.sources.Tables.events(spark, "/root/testdata/sf0.001").count())
    for (t <- Seq("region", "nation")) {
      assert(big(t).count() === base(t).count(), s"fixed dim $t must not scale")
    }
  }

  test("replica key spaces are disjoint (distinct keys scale too)") {
    def distinctN(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(c).distinct().count()
    assert(distinctN(big("orders"), "o_orderkey") ===
      2 * distinctN(base("orders"), "o_orderkey"))
    assert(distinctN(big("customer"), "c_custkey") ===
      2 * distinctN(base("customer"), "c_custkey"))
    // q21 groups by s_name — replica tags must keep names unique
    assert(distinctN(big("supplier"), "s_name") ===
      2 * distinctN(base("supplier"), "s_name"))
  }

  test("referential integrity survives the key shifts") {
    val li = big("lineitem")
    assert(li.join(big("orders"), col("l_orderkey") === col("o_orderkey"),
      "left_anti").count() === 0, "lineitem -> orders broken")
    assert(li.join(big("part"), col("l_partkey") === col("p_partkey"),
      "left_anti").count() === 0, "lineitem -> part broken")
    assert(li.join(big("supplier"), col("l_suppkey") === col("s_suppkey"),
      "left_anti").count() === 0, "lineitem -> supplier broken")
    assert(big("orders").join(big("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count() === 0,
      "orders -> customer broken")
  }

  test("events grow along the time axis: disjoint replica spans, 2x ids") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val bigEv = big("events")
    assert(bigEv.select("event_id").distinct().count() ===
      2 * ev.select("event_id").distinct().count())
    val span0 = ev.agg(min(col("ts")), max(col("ts"))).head()
    val spanN = bigEv.agg(min(col("ts")), max(col("ts"))).head()
    assert(spanN.getTimestamp(0) === span0.getTimestamp(0)) // replica 0 untouched
    assert(spanN.getTimestamp(1).after(span0.getTimestamp(1))) // axis extended
    // per-second first-wins structure preserved: the same count of
    // (pair, second) groups per replica (time shift is a bijection)
    val g0 = ev.select(col("event_type"), date_trunc("second", col("ts"))).distinct().count()
    val gN = bigEv.select(col("event_type"), date_trunc("second", col("ts"))).distinct().count()
    assert(gN === 2 * g0)
  }
}
