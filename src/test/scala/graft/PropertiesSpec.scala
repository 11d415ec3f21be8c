package graft

import graft.operators.{Incremental, Skew, Ticks}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property-based invariants over randomized inputs (fixed ScalaCheck
  * seeds): the structural guarantees the engine's correctness rests on. */
class PropertiesSpec extends SparkSpec {

  private def checkProp(p: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  import spark.implicits._

  private val rowGen = for {
    key <- Gen.oneOf("a", "b", "hot")
    n <- Gen.chooseNum(-1000L, 1000L)
    v <- Gen.chooseNum(-100.0, 100.0)
  } yield (key, n, v)

  test("microHalfUp(micro, d)/1e6 == HALF_UP(micro/d) at the integer grain") {
    // the tie-free mean used by eom/dpo/w22/a13/silhouette/fertility —
    // must equal BigDecimal's HALF_UP for ANY sign and any divisor,
    // including exact .5 ties (the case the float path cannot decide)
    checkProp(forAll(Gen.chooseNum(-2000000L, 2000000L),
        Gen.chooseNum(1, 200)) { (micro, d) =>
      val got = Seq(micro).toDF("micro")
        .select(graft.operators.Indicators.microHalfUp("micro", d).as("q"))
        .collect().head.getLong(0)
      val exp = (BigDecimal(micro) / d)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      (got == exp) :| s"micro=$micro d=$d got=$got exp=$exp"
    }, n = 60)
  }

  test("saltedAgg ≡ direct agg for arbitrary data and salt counts") {
    checkProp(forAll(Gen.listOfN(60, rowGen), Gen.chooseNum(1, 16)) { (rows, salts) =>
      rows.nonEmpty ==> {
        val df = rows.toDF("key", "n", "v")
        val got = Skew.saltedAgg(df, Seq("key"), salts, "n" -> "sum", "v" -> "max")
          .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        val exp = df.groupBy("key").agg(sum("n"), max("v"))
          .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        got.toSeq == exp.toSeq
      }
    })
  }

  test("idempotent sink: appendNew(x, x) adds nothing; append is monotone") {
    checkProp(forAll(Gen.listOfN(40, rowGen)) { rows =>
      rows.nonEmpty ==> {
        val df = rows.toDF("key", "n", "v").dropDuplicates("key", "n")
        val self = Incremental.appendNew(df, df, Seq("key", "n"))
        self.count() == df.count()
      }
    })
  }

  test("tick dedup: exactly one survivor per (pair, second), the earliest") {
    val tsGen = for {
      pair <- Gen.oneOf("X", "Y")
      sec <- Gen.chooseNum(0, 5)
      micros <- Gen.chooseNum(0, 999999)
      bid <- Gen.chooseNum(1.0, 100.0)
    } yield (pair, new java.sql.Timestamp(1700000000000L + sec * 1000L + micros / 1000), bid)
    checkProp(forAll(Gen.listOfN(50, tsGen)) { rows =>
      rows.nonEmpty ==> {
        val df = rows.zipWithIndex
          .map { case ((p, t, b), i) => (p, t, b, b + 0.01, i.toLong) }
          .toDF("pair", "time", "bid", "ask", "seq")
        val out = Ticks.dedupSecond(df).collect()
        val perKey = out.groupBy(r =>
          (r.getAs[String]("pair"), r.getAs[java.sql.Timestamp]("time")))
        perKey.forall(_._2.length == 1) && {
          // each survivor's bid equals the earliest (time, seq) row's bid
          val expected = rows.zipWithIndex
            .groupBy { case ((p, t, _), _) =>
              (p, new java.sql.Timestamp(t.getTime / 1000 * 1000)) }
            .map { case (k, g) =>
              k -> g.minBy { case ((_, t, _), i) => (t.getTime, i) }._1._3 }
          out.forall { r =>
            expected((r.getAs[String]("pair"), r.getAs[java.sql.Timestamp]("time"))) ==
              r.getAs[Double]("bid")
          }
        }
      }
    })
  }

  test("decontaminate ≡ brute-force shared-shingle count for random corpora") {
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val docGen = Gen.listOfN(8, Gen.oneOf(vocab)).map(_.mkString(" "))
    checkProp(forAll(Gen.listOfN(10, docGen), Gen.listOfN(4, docGen),
        Gen.chooseNum(1L, 3L)) { (trainTexts, evalTexts, minShared) =>
      val train = trainTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val ev = evalTexts.zipWithIndex.map { case (t, i) => (100L + i, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup.decontaminate(train, ev, n = 3,
          minShared = minShared)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      def shingles(t: String): Set[String] = {
        val w = t.trim.toLowerCase.split("\\s+").toSeq
        if (w.length < 3) Set.empty
        else w.sliding(3).map(_.mkString(" ")).toSet
      }
      val exp = (for {
        (et, ei) <- evalTexts.zipWithIndex
        (tt, ti) <- trainTexts.zipWithIndex
        shared = (shingles(et) & shingles(tt)).size.toLong
        if shared >= minShared
      } yield (100L + ei, ti.toLong, shared)).toSet
      got == exp
    }, n = 8)
  }

  test("TopKByScore ≡ sort-take for arbitrary scored sets") {
    val sGen = for {
      q <- Gen.chooseNum(0L, 2L)
      c <- Gen.chooseNum(0L, 30L)
      s <- Gen.chooseNum(-10.0, 10.0)
    } yield (q, c, s)
    checkProp(forAll(Gen.listOfN(60, sGen), Gen.chooseNum(1, 8)) { (rows, k) =>
      rows.nonEmpty ==> {
        val dedup = rows.distinctBy(r => (r._1, r._2))
        val df = dedup.toDF("qid", "cid", "score")
        val got = graft.operators.Similarity.topKPerQuery(df, k)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        val exp = dedup.groupBy(_._1).flatMap { case (q, g) =>
          g.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex
            .map { case ((_, c, _), i) => (q, c, i + 1) }
        }.toSet
        got == exp
      }
    })
  }

  test("dedupSpans ≡ in-memory first-occurrence model for random corpora") {
    val docGen = for {
      n <- Gen.chooseNum(1, 30)
      ws <- Gen.listOfN(n, Gen.oneOf("p", "q", "r", "s"))
    } yield ws.mkString(" ")
    checkProp(forAll(Gen.listOfN(6, docGen), Gen.chooseNum(1, 7)) { (texts, span) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup.dedupSpans(docs, span).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      // reference model: enumerate segments in (doc_id, position) order,
      // keep the first occurrence of each segment string
      val seen = scala.collection.mutable.Set.empty[String]
      val exp = texts.zipWithIndex.map { case (t, i) =>
        val toks = t.split(" ").toSeq
        val segs = toks.grouped(span).map(_.mkString(" ")).toSeq
        val kept = segs.filter(seg => seen.add(seg))
        i.toLong -> ((segs.size.toLong, kept.size.toLong, kept.mkString(" ")))
      }.toMap
      got == exp
    })
  }

  test("dedupSubstr ≡ in-memory any-offset coverage model for random corpora") {
    // tiny alphabet + short runs force dense overlapping duplicates —
    // the adversarial case for interval bookkeeping (self-overlap,
    // nested covers, runs crossing each other)
    val docGen = for {
      n <- Gen.chooseNum(1, 30)
      ws <- Gen.listOfN(n, Gen.oneOf("p", "q"))
    } yield ws.mkString(" ")
    checkProp(forAll(Gen.listOfN(5, docGen), Gen.chooseNum(2, 6)) { (texts, k) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup.dedupSubstr(docs, k).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      // model: first occurrence of each k-gram by global (doc, pos);
      // later occurrences cover [pos, pos+k); kept = uncovered tokens
      val seen = scala.collection.mutable.Set.empty[String]
      val exp = texts.zipWithIndex.map { case (t, i) =>
        val toks = t.split(" ").toSeq
        val cover = Array.fill(toks.length)(false)
        for (p <- 0 to toks.length - k) {
          val gram = toks.slice(p, p + k).mkString(" ")
          if (!seen.add(gram)) (p until p + k).foreach(cover(_) = true)
        }
        val kept = toks.indices.filterNot(cover).map(toks)
        i.toLong -> ((toks.length.toLong, kept.size.toLong, kept.mkString(" ")))
      }.toMap
      (got == exp) :| s"k=$k got=$got exp=$exp"
    })
  }

  test("chunkWindows reconstructs the corpus: stride prefixes concatenate to the tokens") {
    val docGen = for {
      n <- Gen.chooseNum(1, 40)
      ws <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd"))
    } yield ws.mkString(" ")
    checkProp(forAll(Gen.listOfN(5, docGen), Gen.chooseNum(1, 8), Gen.chooseNum(1, 8)) {
      (texts, sz, st) =>
        val (size, stride) = (math.max(sz, st), math.min(sz, st))
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val chunks = graft.operators.CorpusPrep.chunkWindows(docs, size, stride)
          .collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
          .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
        texts.zipWithIndex.forall { case (t, i) =>
          val toks = t.trim.toLowerCase.split("\\s+").toSeq
          val cs = chunks(i.toLong)
          // chunk_no dense from 0; starts at k*stride; n_tokens consistent
          val structural = cs.zipWithIndex.forall { case ((_, no, start, n, text), k) =>
            no == k && start == k * stride &&
              n == math.min(toks.length - start, size) &&
              text == toks.slice(start, start + size).mkString(" ")
          }
          // every chunk's stride-prefix (last chunk whole) rebuilds the doc
          val rebuilt = cs.dropRight(1).flatMap(_._5.split(" ").take(stride)) ++
            cs.last._5.split(" ")
          structural && rebuilt.toSeq == toks
        }
    }, n = 8)
  }

  test("winnowing guarantee: a shared >= w+k-1-word run always shares a fingerprint") {
    // k=3, w=4: ANY two documents sharing a contiguous run of >= 6 words
    // must share at least one selected fingerprint — the SIGMOD'03
    // guarantee the MOSS overlap join's recall rests on. Random host
    // texts, random shared-run content and insert positions; the run is
    // padded to w+k-1 exactly (the minimum the guarantee covers).
    val word = Gen.oneOf((1 to 40).map(i => s"w$i"))
    val gen = for {
      run <- Gen.listOfN(6, word) // w + k - 1 = 6 shared words
      hostA <- Gen.listOfN(12, word)
      hostB <- Gen.listOfN(12, word)
      ia <- Gen.chooseNum(0, 12)
      ib <- Gen.chooseNum(0, 12)
    } yield (
      (hostA.take(ia) ++ run ++ hostA.drop(ia)).mkString(" "),
      (hostB.take(ib) ++ run ++ hostB.drop(ib)).mkString(" "))
    checkProp(forAll(gen) { case (ta, tb) =>
      val docs = Seq((1L, ta), (2L, tb)).toDF("doc_id", "text")
      val fps = graft.operators.TextAnalysis.winnow(docs, k = 3, w = 4)
        .select("doc_id", "fp").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      fps.getOrElse(1L, Set.empty).intersect(fps.getOrElse(2L, Set.empty)).nonEmpty
    }, n = 12)
  }

  test("property: fused SMA step == fresh oldest-to-newest frame mean (any series, any period)") {
    // the fused grid's SMA ring must replay WindowExec's sliding AVG
    // exactly: a FRESH left-to-right sum of the trailing p closes per row
    // (Spark has no retractable double aggregates). Pure-JVM check of the
    // ring arithmetic (indexing off-by-ones, warm-up gate) against the
    // spec written directly from the definition.
    val series = Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))
    val periods = Gen.chooseNum(2, 9)
    checkProp(Prop.forAll(series, periods) { (xs, p) =>
      val step = graft.operators.Indicators.fusedStep("SMA", p)
      val got = xs.map(step)
      val want = xs.indices.map { i =>
        if (i < p - 1) None
        else {
          var s = 0.0
          var j = i - p + 1
          while (j <= i) { s += xs(j); j += 1 }
          Some(s / p)
        }
      }
      got == want // exact double equality — same adds in the same order
    }, n = 40)
  }

  test("property: fused EMA step == seed-mean + recurrence (any series, any period)") {
    // spec written straight from the TA definition: mean of the first p
    // closes seeds the series, then prev' = (c - prev)·k + prev with
    // k = 2/(p+1). Same op order as the closure → exact double equality.
    val series = Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))
    val periods = Gen.chooseNum(2, 9)
    checkProp(Prop.forAll(series, periods) { (xs, p) =>
      val step = graft.operators.Indicators.fusedStep("EMA", p)
      val got = xs.map(step)
      val k = 2.0 / (p + 1)
      var prev = 0.0
      val want = xs.indices.map { i =>
        if (i < p - 1) None
        else if (i == p - 1) {
          var s = 0.0
          var j = 0
          while (j <= i) { s += xs(j); j += 1 }
          prev = s / p
          Some(prev)
        } else { prev = (xs(i) - prev) * k + prev; Some(prev) }
      }
      got == want
    }, n = 40)
  }

  test("property: fused RSI step == Wilder smoothing (any series, any period)") {
    // spec from the definition: diffs start at the 2nd close; the first p
    // diffs seed avgGain/avgLoss as plain means, after that Wilder's
    // (avg·(p−1) + x)/p smoothing; RSI = 100·g/(g+l), 0 when flat.
    // Integer-valued closes so gain/loss sums are exact and the flat
    // (denom == 0) branch is actually generated.
    val series = Gen.nonEmptyListOf(Gen.chooseNum(-50, 50).map(_.toDouble))
    val periods = Gen.chooseNum(2, 9)
    checkProp(Prop.forAll(series, periods) { (xs, p) =>
      val step = graft.operators.Indicators.fusedStep("RSI", p)
      val got = xs.map(step)
      var g = 0.0
      var l = 0.0
      val want = xs.indices.map { i =>
        if (i == 0) None
        else {
          val d = xs(i) - xs(i - 1)
          val (gain, loss) = (math.max(d, 0.0), math.max(-d, 0.0))
          if (i < p) { g += gain; l += loss; None }
          else {
            if (i == p) { g = (g + gain) / p; l = (l + loss) / p }
            else { g = (g * (p - 1) + gain) / p; l = (l * (p - 1) + loss) / p }
            Some(if (g + l == 0.0) 0.0 else 100.0 * g / (g + l))
          }
        }
      }
      got == want
    }, n = 40)
  }

  test("corpusShuffle rank == global (md5, id) order for ARBITRARY id sets") {
    // the bucketed two-phase rank must compose to the true global hash
    // order for any id population — sparse, negative, adversarially
    // clustered — and shard/pos must stay consistent with it
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    checkProp(forAll(
        Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)),
        Gen.chooseNum(1, 9)) { (rawIds, nShards) =>
      val ids = rawIds.distinct
      val docs = ids.map(i => (i, "x")).toDF("doc_id", "text")
      val got = graft.operators.CorpusPrep.corpusShuffle(docs, nShards)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"),
          r.getAs[Int]("shard"), r.getAs[Long]("pos")))
      val want = ids.map(i => (md5hex("42" + i), i)).sorted.map(_._2)
      val ranks = got.sortBy(_._2)
      (ranks.map(_._1).toSeq == want.toSeq &&
        got.forall(t => t._3 == (t._2 % nShards).toInt && t._4 == t._2 / nShards)) :|
        s"ids=${ids.take(8)}... nShards=$nShards"
    }, n = 12)
  }

  test("corpusShuffle rank composition is bucket-width-independent (256 ≡ 4096 ≡ global)") {
    // the 100 TB valve: widening the bucket key must not move a single
    // rank — the leading-hex buckets are order-aligned prefixes of the
    // same hash at ANY width
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    checkProp(forAll(
        Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))) {
      rawIds =>
        val ids = rawIds.distinct
        val docs = ids.map(i => (i, "x")).toDF("doc_id", "text")
        def ranks(hexChars: Int): Seq[(Long, Long)] =
          graft.operators.CorpusPrep.corpusShuffle(docs, 8,
              bucketHexChars = hexChars)
            .select("doc_id", "rank").collect()
            .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
        val want = ids.map(i => (md5hex("42" + i), i)).sorted
          .map(_._2).zipWithIndex.map { case (id, r) => (id, r.toLong) }
          .sortBy(_._1)
        (ranks(2) == want && ranks(3) == want) :| s"n=${ids.length}"
    }, n = 8)
  }

  test("bpeTrain: driver fast path ≡ distributed round loop (merges AND state)") {
    // the bounded-vocabulary collect + pair-delta loop must replay the
    // distributed explode+agg+fold rounds EXACTLY — same rules, same
    // tie-breaks, same post-merge symbol strings — for arbitrary corpora.
    // The alphabet deliberately mixes a supplementary-plane symbol (UTF-8
    // binary order ≠ Java UTF-16 compareTo there) with U+FFFD to exercise
    // the tie-break order the two paths must share
    val wordGen = for {
      len <- Gen.chooseNum(1, 6)
      cs <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "�", "😀"))
    } yield cs.mkString
    val docGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    checkProp(forAll(Gen.chooseNum(1L, 12L).flatMap(n =>
        Gen.listOfN(n.toInt, docGen)), Gen.chooseNum(1, 5)) { (texts, k) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val (fastState, fastMerges) =
        graft.operators.TextAnalysis.bpeTrain(docs, k) // measured: driver path
      val (distState, distMerges) =
        graft.operators.TextAnalysis.bpeTrain(docs, k, maxDriverVocab = -1L)
      def st(df: org.apache.spark.sql.DataFrame) =
        df.select("word", "cnt", "sym").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
      (fastMerges == distMerges && st(fastState) == st(distState)) :|
        s"k=$k fast=$fastMerges dist=$distMerges"
    }, n = 8)
  }
}
