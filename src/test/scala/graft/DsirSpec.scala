package graft

import graft.operators.{Dsir, TextOps}
import org.apache.spark.sql.functions._

/** DSIR importance resampling ([[Dsir]]) vs a driver-side textbook
  * reference (hashed uni+bigram multinomials, the identical exact-IEEE
  * (mant, exp2) product fold in plain Scala), plus the semantic claim the
  * math is FOR (target-like docs outrank the rest), partitioning
  * invariance of the bit pattern, the log-weight consistency of the
  * normalized form, and the short-doc/empty-doc edges. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  /** Driver-side textbook replay: same features, same smoothing, same
    * clamp, same one-rounded-multiply-per-feature fold. */
  private def reference(rows: Seq[(Long, String, String)], target: String,
                        buckets: Int): Map[Long, (Long, Long, Double)] = {
    def toks(t: String): Seq[String] =
      t.replaceAll("\\s+", " ").trim.toLowerCase.split(" ", -1).toSeq
    def h(f: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.take(15), 16) % buckets).toInt
    }
    val feats = rows.map { case (id, t, lang) =>
      val w = toks(t)
      (id, lang == target, (w ++ w.zip(w.drop(1)).map(p => p._1 + " " + p._2)).map(h))
    }
    val cq = scala.collection.mutable.Map.empty[Int, Long]
    val ct = scala.collection.mutable.Map.empty[Int, Long]
    feats.foreach { case (_, tgt, bs) =>
      bs.foreach { b =>
        cq(b) = cq.getOrElse(b, 0L) + 1
        if (tgt) ct(b) = ct.getOrElse(b, 0L) + 1
      }
    }
    val rt = cq.values.sum
    val tt = ct.values.sum
    val rat = cq.map { case (b, q) =>
      val r = ((ct.getOrElse(b, 0L) + 1).toDouble / (tt + buckets).toDouble) /
        ((q + 1).toDouble / (rt + buckets).toDouble)
      b -> math.min(math.max(r, math.pow(2, -32)), math.pow(2, 32))
    }
    feats.map { case (id, _, bs) =>
      var m = 1.0
      var e = 0L
      bs.foreach { b =>
        val m2 = m * rat(b)
        val k = Math.getExponent(m2)
        m = Math.scalb(m2, -k)
        e += k
      }
      id -> ((bs.size.toLong, e, m))
    }.toMap
  }

  test("distributed weights == textbook reference on random corpora, bit-exact") {
    for (seed <- Seq(3, 17, 99)) {
      val rnd = new scala.util.Random(seed)
      val langs = Seq("de", "en", "fr")
      def word() = Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(8)).toChar).mkString
      val rows = (1L to 60L).map { i =>
        (i, Seq.fill(rnd.nextInt(25))(word()).mkString(" "), langs(rnd.nextInt(3)))
      }
      val got = Dsir.weights(docs(rows: _*), col("lang") === "de", buckets = 64)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      val exp = reference(rows, "de", buckets = 64)
      assert(got === exp, s"mismatch at seed $seed")
    }
  }

  test("mant stays in [1, 2) and (e2, mant) ordering equals log-weight ordering") {
    val rnd = new scala.util.Random(5)
    val rows = (1L to 40L).map { i =>
      (i, Seq.fill(5 + rnd.nextInt(20))("w" + rnd.nextInt(30)).mkString(" "),
        if (i % 3 == 0) "de" else "en")
    }
    val ws = Dsir.weights(docs(rows: _*), col("lang") === "de")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(ws.forall { case (_, _, m) => m >= 1.0 && m < 2.0 })
    // log2(weight) = e2 + log2(mant): the pair ordering IS the log ordering
    val byPair = ws.sortBy { case (id, e, m) => (-e, -m, id) }.map(_._1).toSeq
    val byLog = ws.sortBy { case (id, e, m) => (-(e + math.log(m) / math.log(2)), id.toDouble) }
      .map(_._1).toSeq
    assert(byPair === byLog)
  }

  test("target-like documents outrank the rest (the DSIR selection claim)") {
    // two disjoint vocabularies: target docs speak A; half the raw pool
    // speaks A (should be selected), half speaks B (should not)
    val vocabA = (0 until 20).map(i => s"alpha$i")
    val vocabB = (0 until 20).map(i => s"beta$i")
    val rnd = new scala.util.Random(11)
    def speak(v: Seq[String]) = Seq.fill(15)(v(rnd.nextInt(v.size))).mkString(" ")
    val target = (1L to 10L).map(i => (i, speak(vocabA), "de"))
    val rawA = (11L to 20L).map(i => (i, speak(vocabA), "en"))
    val rawB = (21L to 30L).map(i => (i, speak(vocabB), "en"))
    val sel = Dsir.select(docs(target ++ rawA ++ rawB: _*),
      col("lang") === "de", k = 20).collect().map(_.getLong(0)).toSet
    assert(rawA.map(_._1).forall(sel), "every A-speaking raw doc selected")
    assert(rawB.map(_._1).forall(id => !sel(id)), "no B-speaking raw doc selected")
  }

  test("bit pattern is partitioning-invariant") {
    val rnd = new scala.util.Random(23)
    val rows = (1L to 50L).map { i =>
      (i, Seq.fill(10 + rnd.nextInt(10))("t" + rnd.nextInt(40)).mkString(" "),
        if (i % 4 == 0) "de" else "en")
    }
    val base = docs(rows: _*)
    val a = Dsir.weights(base.repartition(1), col("lang") === "de")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    val b = Dsir.weights(base.repartition(7, col("text")), col("lang") === "de")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(a === b.toSeq.toArray)
  }

  test("edges: single-token and empty-text docs fold cleanly") {
    val d = docs((1L, "solo", "de"), (2L, "", "en"), (3L, "a b", "en"))
    val got = Dsir.weights(d, col("lang") === "de")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L)._1 === 1L) // one unigram, no bigram
    assert(got(2L)._1 === 1L) // the empty token is still one feature
    assert(got(3L)._1 === 3L) // two unigrams + one bigram
    assert(got.values.forall { case (_, m) => m >= 1.0 && m < 2.0 })
  }

  test("feature stream order matches the oracle convention (unigrams then bigrams)") {
    // a doc where order matters if ratios differ: verify n_feats = 2n-1
    val d = docs((1L, "x y z", "de"), (2L, "x y z w", "en"))
    val got = Dsir.weights(d, col("lang") === "de")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 5L && got(2L) === 7L)
    // and the hash is TextOps.hash60 mod buckets: spot-check one bucket id
    val b = spark.range(1).select((TextOps.hash60(lit("x y")) % 256).as("b"))
      .head().getLong(0)
    assert(b >= 0 && b < 256)
  }
}
