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

  test("AQE splits a skewed sort-merge join at runtime (and results are unchanged)") {
    // The 100 TB path for skew the engine does NOT pre-salt: AQE's
    // OptimizeSkewedJoin splitting an oversized partition into parallel
    // sub-reads. Thresholds are forced low so the hot key's partition
    // qualifies at test scale; broadcast is disabled to keep the join a
    // shuffled SMJ (the shape skew splitting applies to).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled", "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(Option(conf.get(k))).toOption.flatten).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      val left = spark.range(20000)
        .select(when(col("id") % 10 =!= 0, lit("hot")).otherwise(concat(lit("k"), col("id"))).as("key"),
          col("id").as("n"))
      val right = spark.range(200)
        .select(when(col("id") % 10 =!= 0, lit("hot")).otherwise(concat(lit("r"), col("id"))).as("key"),
          col("id").as("m"))
      val joined = left.join(right, "key")
      // drive THIS plan (df.count() would execute a different QueryExecution
      // and leave the join's adaptive plan unexecuted); RDD count keeps the
      // 3.24M joined rows off the driver
      val qe = joined.queryExecution
      val cnt = qe.executedPlan.execute().count()
      // 18000 hot-left × 180 hot-right; the k*/r* tails never overlap
      assert(cnt === 18000L * 180L)

      val p = qe.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"skew test must exercise a shuffled join:\n$p")
      assert(p.contains("skew=true") || p.contains("skewed"),
        s"OptimizeSkewedJoin did not fire — hot partition runs on one task at scale:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
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
