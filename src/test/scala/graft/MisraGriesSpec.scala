package graft

import graft.functions.MisraGries
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  /** MG bounds for every distinct item: 0 ≤ est ≤ exact and
    * est ≥ exact − n/(k+1), under real multi-partition merges. */
  private def checkBounds(items: Seq[String], k: Int, parts: Int): Unit = {
    val df = items.toDF("item").repartition(parts)
    val n = items.size.toLong
    val est = df.agg(MisraGries($"item", k).as("mg"))
      .select(explode($"mg").as("e"))
      .select($"e.item".as("item"), $"e.est".as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size <= k, s"summary must keep <= $k counters, got ${est.size}")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (item, ex) =>
      val e = est.getOrElse(item, 0L)
      assert(e <= ex, s"$item overcounted: est=$e exact=$ex")
      assert(e * (k + 1) >= ex * (k + 1) - n,
        s"$item below bound: est=$e exact=$ex n=$n k=$k")
    }
    // anything heavier than n/(k+1) must be tracked
    exact.filter { case (_, ex) => ex * (k + 1) > n }.keys.foreach { item =>
      assert(est.contains(item), s"heavy item $item missing from summary")
    }
  }

  test("skewed stream: heavy items tracked within bounds across merges") {
    val items = Seq.fill(300)("a") ++ Seq.fill(120)("b") ++ Seq.fill(40)("c") ++
      (1 to 80).map(i => s"rare$i")
    checkBounds(items, k = 4, parts = 7)
  }

  test("uniform stream wider than k: bounds hold though nothing is heavy") {
    val items = (1 to 20).flatMap(i => Seq.fill(25)(s"w$i"))
    checkBounds(items, k = 6, parts = 5)
  }

  test("fewer distinct items than k: estimates are exact") {
    val items = Seq.fill(10)("x") ++ Seq.fill(7)("y") ++ Seq.fill(3)("z")
    val est = items.toDF("item").repartition(3)
      .agg(MisraGries($"item", 8).as("mg"))
      .select(explode($"mg").as("e"))
      .select($"e.item", $"e.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("x" -> 10L, "y" -> 7L, "z" -> 3L))
  }

  test("input type contract: atomics implicit-cast, containers fail at analysis") {
    // ints cast to their string form — stable values, exact counts
    val est = Seq(1, 1, 2).toDF("v").agg(MisraGries($"v", 8).as("mg"))
      .select(explode($"mg").as("e")).select($"e.item", $"e.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("1" -> 2L, "2" -> 1L))
    // arrays have no implicit cast to string: analysis error, never a
    // silent aggregation over catalyst-object toStrings
    val bad = Seq(Seq("a"), Seq("b")).toDF("v")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.agg(MisraGries($"v", 8).as("mg")).collect()
    }
  }

  test("output is sorted est desc, item asc") {
    val items = Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(9)("c")
    val arr = items.toDF("item").coalesce(1)
      .agg(MisraGries($"item", 8).as("mg"))
      .select(expr("transform(mg, x -> x.item)")).collect().head
      .getSeq[String](0)
    assert(arr === Seq("c", "a", "b"))
  }
}
