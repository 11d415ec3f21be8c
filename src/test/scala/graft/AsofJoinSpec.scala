package graft

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq(
    ("X", ts("2024-01-01 00:00:00"), 100.0),
    ("X", ts("2024-01-01 00:05:00"), 105.0),
    ("X", ts("2024-01-01 00:10:00"), 110.0),
    ("Y", ts("2024-01-01 00:02:00"), 50.0))
    .toDF("pair", "time", "close")

  private val events = Seq(
    ("X", ts("2024-01-01 00:00:00"), "at-tie"),     // == quote time: sees it
    ("X", ts("2024-01-01 00:04:59"), "mid"),        // sees 00:00
    ("X", ts("2024-01-01 00:07:00"), "after-2nd"),  // sees 00:05
    ("X", ts("2024-01-01 00:30:00"), "late"),       // sees 00:10
    ("Y", ts("2024-01-01 00:01:00"), "before-any"), // dropped (inner)
    ("Y", ts("2024-01-01 00:03:00"), "ok"))         // sees 00:02
    .toDF("pair", "time", "label")

  test("asofJoin picks the latest right row at-or-before each left row") {
    val got = AsofJoin.asofJoin(events, quotes, Seq("pair"), "time", Seq("close"))
      .orderBy("pair", "time").collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[String]("label"),
        r.getAs[java.sql.Timestamp]("asof_time"), r.getAs[Double]("asof_close")))
    assert(got.toSeq === Seq(
      ("X", "at-tie", ts("2024-01-01 00:00:00"), 100.0),
      ("X", "mid", ts("2024-01-01 00:00:00"), 100.0),
      ("X", "after-2nd", ts("2024-01-01 00:05:00"), 105.0),
      ("X", "late", ts("2024-01-01 00:10:00"), 110.0),
      ("Y", "ok", ts("2024-01-01 00:02:00"), 50.0)))
  }

  test("left rows with no prior right row are dropped (inner semantics)") {
    val got = AsofJoin.asofJoin(events, quotes, Seq("pair"), "time", Seq("close"))
    assert(got.filter($"label" === "before-any").count() === 0)
  }

  test("forward direction picks the earliest right row at-or-after; tie visible") {
    val got = AsofJoin.asofJoinForward(events, quotes, Seq("pair"), "time", Seq("close"))
      .orderBy("pair", "time").collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[String]("label"),
        r.getAs[java.sql.Timestamp]("asof_time"), r.getAs[Double]("asof_close")))
    assert(got.toSeq === Seq(
      ("X", "at-tie", ts("2024-01-01 00:00:00"), 100.0),  // == time still visible
      ("X", "mid", ts("2024-01-01 00:05:00"), 105.0),
      ("X", "after-2nd", ts("2024-01-01 00:10:00"), 110.0),
      // "late" (X, 00:30) and "ok" (Y, 00:03) have no following quote →
      // dropped (inner, mirrored); "before-any" now matches
      ("Y", "before-any", ts("2024-01-01 00:02:00"), 50.0)))
  }

  test("bucketed variant matches the global window, carrying across empty buckets") {
    // 60 s buckets: the 00:30 event is 20 empty buckets past the last quote
    // (00:10), so its match must arrive via the carry-in row
    val global = AsofJoin.asofJoin(events, quotes, Seq("pair"), "time", Seq("close"))
      .orderBy("pair", "time").collect().toSeq
    val bucketed = AsofJoin.asofJoinBucketed(events, quotes, Seq("pair"), "time",
        Seq("close"), bucketSeconds = 60L)
      .orderBy("pair", "time").collect().toSeq
    assert(bucketed === global)
  }

  test("bucketed ≡ global on randomized data (seeded)") {
    val rnd = new scala.util.Random(7)
    val base = ts("2024-01-01 00:00:00").getTime
    def t(off: Long) = new java.sql.Timestamp(base + off * 1000L)
    val keys = Seq("A", "B", "C")
    val right = Seq.tabulate(120) { i =>
      (keys(rnd.nextInt(3)), t(rnd.nextInt(7200).toLong), rnd.nextDouble())
    }.distinct.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique right times per key
      .toDF("pair", "time", "close")
    val left = Seq.tabulate(300) { i =>
      (keys(rnd.nextInt(3)), t(rnd.nextInt(7200).toLong), i.toLong)
    }.toDF("pair", "time", "seq")
    val global = AsofJoin.asofJoin(left, right, Seq("pair"), "time", Seq("close"))
      .orderBy("pair", "time", "seq").collect().toSeq
    val bucketed = AsofJoin.asofJoinBucketed(left, right, Seq("pair"), "time",
        Seq("close"), bucketSeconds = 600L)
      .orderBy("pair", "time", "seq").collect().toSeq
    assert(bucketed === global)
  }
}
