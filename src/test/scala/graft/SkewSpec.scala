package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private val skewed = ((1 to 900).map(i => ("hot", i.toLong, i * 1.5)) ++
    (1 to 100).map(i => (s"k${i % 7}", i.toLong, i * 2.0)))
    .toDF("key", "n", "v")

  test("saltedAgg == direct aggregation on a hot key") {
    val got = Skew.saltedAgg(skewed, Seq("key"), salts = 8,
      "n" -> "sum", "n" -> "count", "v" -> "min", "v" -> "max")
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val exp = skewed.groupBy("key")
      .agg(sum("n").as("s"), count("n").as("c"), min("v").as("mn"), max("v").as("mx"))
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === exp.toSeq)
  }

  test("saltedJoin == plain inner join, including the hot key") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k3", "B"), ("missing", "Z"))
      .toDF("key", "label")
    val got = Skew.saltedJoin(skewed, dim, Seq("key"), salts = 8)
      .orderBy("key", "n").collect().map(_.toString)
    val exp = skewed.join(dim, Seq("key"))
      .orderBy("key", "n").collect().map(_.toString)
    assert(got.toSeq === exp.toSeq)
    assert(got.count(_.contains("hot")) === 900) // every hot row joined exactly once
  }
}
