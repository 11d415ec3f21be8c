package graft

import graft.operators.CrossPair

class CrossPairSpec extends SparkSpec {
  import spark.implicits._

  private def candles(rows: Seq[(String, Int, Double)]) =
    rows.map { case (p, i, c) => (p, "1m", ts(f"2024-01-01 00:$i%02d:00"), c) }
      .toDF("pair", "timeframe", "time", "close")

  test("perfectly co-moving series: corr 1, beta = the scale factor") {
    val a = Seq(10.0, 11.0, 13.0, 12.0, 15.0, 14.0, 16.0)
    val rows = a.zipWithIndex.flatMap { case (c, i) =>
      Seq(("A", i, c), ("B", i, 20.0 + 2.0 * c)) // dy = 2*dx exactly
    }
    val out = CrossPair.rollingCorrelation(candles(rows), "A", "B", n = 3)
      .orderBy("time").select("corr", "beta").collect()
    // rows 0..2: warm-up (need 3 diffs => defined from rn 4)
    assert((0 until 3).forall(i => out(i).isNullAt(0)))
    (3 until a.length).foreach { i =>
      assert(math.abs(out(i).getDouble(0) - 1.0) < 1e-12, s"corr idx $i")
      assert(math.abs(out(i).getDouble(1) - 2.0) < 1e-12, s"beta idx $i")
    }
  }

  test("anti-moving series: corr -1; zero-variance window emits NULL") {
    val a = Seq(10.0, 11.0, 13.0, 12.0, 15.0)
    val rows = a.zipWithIndex.flatMap { case (c, i) =>
      Seq(("A", i, c), ("B", i, 30.0 - c))
    }
    val out = CrossPair.rollingCorrelation(candles(rows), "A", "B", n = 3)
      .orderBy("time").select("corr", "beta").collect()
    (3 until a.length).foreach { i =>
      assert(math.abs(out(i).getDouble(0) + 1.0) < 1e-12)
      assert(math.abs(out(i).getDouble(1) + 1.0) < 1e-12)
    }
    // constant series on one side: every dx = 0 -> vx = 0 -> NULL both stats
    val flat = a.indices.flatMap(i => Seq(("A", i, 5.0), ("B", i, a(i))))
    val outF = CrossPair.rollingCorrelation(candles(flat), "A", "B", n = 3)
      .select("corr", "beta").collect()
    assert(outF.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("inner alignment: a minute missing on one side is skipped by both") {
    val rows = Seq(("A", 0, 10.0), ("A", 1, 11.0), ("A", 2, 12.0), ("A", 3, 13.0),
      ("A", 4, 14.0),
      ("B", 0, 20.0), ("B", 2, 22.0), ("B", 3, 23.0), ("B", 4, 24.0)) // B skips min 1
    val out = CrossPair.rollingCorrelation(candles(rows), "A", "B", n = 2)
      .orderBy("time").collect()
    assert(out.length === 4) // joined grid: minutes 0,2,3,4
    assert(!out(2).isNullAt(2)) // rn 3 >= n+1: corr defined
  }
}
