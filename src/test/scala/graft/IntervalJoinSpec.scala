package graft

import graft.operators.IntervalJoin

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed overlap join == brute force, any bucket width (randomized)") {
    val rnd = new scala.util.Random(11)
    val xs = (1 to 120).map { i =>
      val s = rnd.nextInt(1000)
      (i.toLong, s.toLong, (s + rnd.nextInt(200)).toLong)
    }
    val df = xs.toDF("id", "start_s", "end_s")
    val exp = (for {
      a <- xs; b <- xs if a._2 <= b._3 && b._2 <= a._3
    } yield (a._1, b._1)).toSet
    // widths spanning sub-interval to way-beyond-range prove the
    // replicate + one-bucket-attribution identity is width-independent
    for (w <- Seq(1L, 7L, 100L, 5000L)) {
      val got = IntervalJoin.overlapJoin(df, df, w)
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"width $w emitted duplicate pairs")
      assert(got.toSet === exp, s"width $w diverged from brute force")
    }
  }

  test("degenerate interval fails fast instead of exploding the replication") {
    val df = Seq((1L, 0L, Long.MaxValue / 2)).toDF("id", "start_s", "end_s")
    val ex = intercept[Exception] {
      IntervalJoin.overlapJoin(df, df, bucketSec = 300L).count()
    }
    assert(ex.getMessage.contains("buckets") ||
      Option(ex.getCause).exists(_.getMessage.contains("buckets")),
      s"expected the replication guard, got: $ex")
  }

  test("inverted interval (end < start) fails fast, not a descending-sequence explosion") {
    // sequence(start, stop) with stop < start silently generates a
    // DESCENDING sequence — an inverted row (swapped columns upstream)
    // must hit the guard, not replicate
    val df = Seq((1L, 500L, 100L)).toDF("id", "start_s", "end_s")
    val ex = intercept[Exception] {
      IntervalJoin.overlapJoin(df, df, bucketSec = 10L).count()
    }
    assert(ex.getMessage.contains("degenerate") ||
      Option(ex.getCause).exists(_.getMessage.contains("degenerate")),
      s"expected the degenerate-interval guard, got: $ex")
  }

  test("closed-interval edge cases: touching endpoints overlap, gap of 1 does not") {
    val df = Seq(
      (1L, 0L, 10L),
      (2L, 10L, 20L), // touches 1 at t=10
      (3L, 21L, 30L)  // gap of 1 after 2
    ).toDF("id", "start_s", "end_s")
    val got = IntervalJoin.overlapJoin(df, df, 4L)
      .filter($"l_id" < $"r_id")
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }
}
