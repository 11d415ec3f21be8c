package graft

import graft.operators.{Indicators, Ohlc, TextAnalysis, CorpusPrep, TextOps, QualityWeights}
import org.apache.spark.sql.functions._

/** Specs for the late-round-8 additions: Wilder ATR, stochastic %K/%D,
  * on-balance volume, size-weighted VWAP, the model-based quality filter
  * (L37) and deterministic mixture sampling (L38). Each test replays the
  * operator's contract independently (hand fold or brute-force restatement)
  * rather than comparing the operator to itself. */
class VolumeAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // candles with a real high/low range (not the flat h=l=c IndicatorsSpec
  // uses — ATR and stochastic are range indicators, a flat range would
  // leave their interesting branches untested)
  private val hlc = Seq(
    (10.0, 9.0, 9.5), (10.5, 9.4, 10.2), (11.0, 10.0, 10.8), (10.9, 10.1, 10.3),
    (11.5, 10.2, 11.4), (12.0, 11.0, 11.2), (11.8, 10.8, 11.0), (12.5, 11.1, 12.3),
    (13.0, 12.0, 12.1), (12.6, 11.9, 12.5))
  private lazy val candles = {
    val rows = for {
      pair <- Seq("A", "B")
      ((h, l, c), i) <- hlc.zipWithIndex
    } yield (pair, "1m", ts(f"2024-01-01 00:$i%02d:00"), c, h, l, c)
    rows.toDF("pair", "timeframe", "time", "open", "high", "low", "close")
  }

  test("ATR matches an independent Wilder fold, per group") {
    val p = 4
    // independent replay: TR from row 2, simple-mean seed at row p+1,
    // Wilder smoothing after
    val exp = scala.collection.mutable.ArrayBuffer.empty[Option[Double]]
    var prevClose = 0.0; var trSum = 0.0; var atr = 0.0
    hlc.zipWithIndex.foreach { case ((h, l, c), i) =>
      if (i == 0) exp += None
      else {
        val tr = math.max(h - l, math.max(math.abs(h - prevClose), math.abs(l - prevClose)))
        if (i < p) { trSum += tr; exp += None }
        else {
          if (i == p) atr = (trSum + tr) / p else atr = (atr * (p - 1) + tr) / p
          exp += Some(atr)
        }
      }
      prevClose = c
    }
    Seq("A", "B").foreach { pair =>
      val got = Indicators.atr(candles, p).toDF()
        .filter($"pair" === pair).orderBy("time").select("value").collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
      assert(got.length === exp.length)
      got.zip(exp).zipWithIndex.foreach {
        case ((Some(g), Some(e)), i) => assert(math.abs(g - e) < 1e-12, s"idx $i: $g vs $e")
        case ((g, e), i) => assert(g === e, s"idx $i: $g vs $e")
      }
    }
  }

  test("stochastic %K from window extrema; %D needs three %K values") {
    val p = 4
    val rows = Indicators.stochastic(candles, p)
      .filter($"pair" === "A").orderBy("time")
      .select("k", "d").collect()
    // warm-up: k null before row p, d null until k, lag1(k), lag2(k) all exist
    (0 until p - 1).foreach(i => assert(rows(i).isNullAt(0), s"k at $i"))
    (0 until p + 1).foreach(i => assert(rows(i).isNullAt(1), s"d at $i"))
    // row p-1 (first defined): hh/ll over rows 0..3
    val hh = hlc.take(p).map(_._1).max; val ll = hlc.take(p).map(_._2).min
    val expK = (hlc(p - 1)._3 - ll) * 100.0 / (hh - ll)
    assert(math.abs(rows(p - 1).getDouble(0) - expK) < 1e-12)
    // d at row p+1 = mean of k[p-1..p+1]
    val ks = (p - 1 to p + 1).map(rows(_).getDouble(0))
    assert(math.abs(rows(p + 1).getDouble(1) - ks.sum / 3.0) < 1e-12)
  }

  test("stochastic: flat window (hh == ll) yields NULL %K, not a division error") {
    val flat = (0 until 6).map(i => ("A", "1m", ts(f"2024-01-01 00:0$i:00"), 5.0, 5.0, 5.0, 5.0))
      .toDF("pair", "timeframe", "time", "open", "high", "low", "close")
    val out = Indicators.stochastic(flat, 3).select("k").collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("OBV: signed running volume, first row contributes 0, per-pair isolation") {
    val rows = Seq(
      ("A", 0, 10.0, 5L), ("A", 1, 11.0, 3L), ("A", 2, 11.0, 7L),
      ("A", 3, 10.5, 2L), ("A", 4, 12.0, 4L),
      ("B", 0, 1.0, 100L), ("B", 1, 0.5, 50L))
      .map { case (p, i, c, v) => (p, ts(f"2024-01-01 00:0$i:00"), c, v) }
      .toDF("pair", "time", "close", "vol")
    val got = Indicators.obv(rows).orderBy("pair", "time")
      .select("pair", "obv").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // A: 0, +3, +3 (flat adds 0), +3-2=1, 1+4=5 ; B: 0, -50
    assert(got === Seq(("A", 0L), ("A", 3L), ("A", 3L), ("A", 1L), ("A", 5L),
      ("B", 0L), ("B", -50L)))
  }

  test("VWAP: size-weighted mean per bucket; NULL sizes excluded; zero-size bucket NULL") {
    val t0 = 1704067200L // 2024-01-01 00:00:00 UTC, bucket-aligned for 60s
    val ticks = Seq(
      // bucket 1: two sized prints -> vwap = (10*2 + 13*4)/6 = 12.0
      ("A", t0 + 1, 10.0, Some(2)), ("A", t0 + 30, 13.0, Some(4)),
      // NULL size: excluded from both numerator and qty
      ("A", t0 + 40, 99.0, None),
      // bucket 2: only a zero-size print -> qty 0, vwap NULL
      ("A", t0 + 70, 11.0, Some(0)))
      .toDF("pair", "time_s", "mid", "size")
      .withColumn("time", col("time_s").cast("timestamp"))
    val got = Ohlc.vwap(ticks, 60).orderBy("time_s")
      .select("time_s", "vwap", "qty").collect()
    assert(got.length === 2)
    assert(got(0).getLong(0) === t0 && math.abs(got(0).getDouble(1) - 72.0 / 6) < 1e-12
      && got(0).getLong(2) === 6L)
    assert(got(1).getLong(0) === t0 + 60 && got(1).isNullAt(1) && got(1).getLong(2) === 0L)
  }

  test("qualityModel: score replays the linear form; threshold filters; kept set stable") {
    val docs = Seq(
      (1L, ("the quick brown fox jumps over the lazy dog " * 8).trim), // long, 2/9 stopwords
      (2L, "zzz qqq")) // short, stopword-free -> low score
      .toDF("doc_id", "text")
    val w = QualityWeights()
    val out = TextAnalysis.qualityModel(docs, w, threshold = 0.35)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 1 by hand: 72 tokens (fLen=1), 16/72 stopwords, alpha=35*8=280... compute:
    val toks = ("the quick brown fox jumps over the lazy dog " * 8).trim.split(" ")
    val nTok = toks.length
    val fLen = math.min(nTok / 50.0, 1.0)
    val fStop = toks.count(TextAnalysis.StopwordsEn.contains).toDouble / nTok
    val alpha = toks.map(_.length).sum // normalize lowercases; spaces removed
    val fAvg = alpha.toDouble / nTok / 10.0
    val exp = w.w0 + w.w_len * fLen + w.w_stop * fStop + w.w_avg * fAvg
    assert(out.contains(1L) && math.abs(out(1L) - BigDecimal(exp).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(!out.contains(2L)) // below threshold
  }

  test("dataMix: admit set == independent take-while over content-hash order") {
    val docs = (1L to 60L).map { i =>
      val src = if (i % 2 == 0) "even" else "odd"
      (i, s"document body number $i with some filler text", src)
    }.toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("bigint"))
    val budgetTotal = 1000L
    val weights = Map("even" -> 0.4) // odd takes the default
    val got = CorpusPrep.dataMix(docs, weights, defaultWeight = 0.1, totalBudget = budgetTotal)
      .collect().map(_.getAs[Long]("doc_id")).toSet

    // independent restatement: sort each source's docs by (hash60, doc_id),
    // admit while cumulative chars <= floor(weight * budget)
    val hashed = docs
      .withColumn("h", TextOps.hash60(TextOps.normalize(col("text"))))
      .select("doc_id", "source", "n_chars", "h")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val exp = hashed.groupBy(_._2).flatMap { case (src, rows) =>
      val budget = math.floor(weights.getOrElse(src, 0.1) * budgetTotal).toLong
      var cum = 0L
      rows.sortBy(r => (r._4, r._1)).takeWhile { r => cum += r._3; cum <= budget }
        .map(_._1).toSeq
    }.toSet
    assert(got === exp)
    assert(got.nonEmpty && got.size < 60) // the budget actually binds
    // determinism under reshuffle: same admit set from a permuted input
    val got2 = CorpusPrep.dataMix(docs.orderBy(rand(11)), weights, 0.1, budgetTotal)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got2 === got)
  }
}
