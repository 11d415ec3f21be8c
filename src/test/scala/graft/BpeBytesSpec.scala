package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.operators.TextAnalysis

/** Byte-level BPE (L79, the GPT-2/tiktoken family): ScalaCheck equivalence
  * against an INDEPENDENT driver-side textbook reference over byte arrays
  * (not the engine's hex-string plumbing), the driver≡distributed trainer
  * property at the byte alphabet, and the totality/reconstruction
  * properties byte fallback exists for — including supplementary-plane and
  * unpaired-surrogate fixtures. */
class BpeBytesSpec extends SparkSpec {
  import spark.implicits._

  private def checkProp(p: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // ---- textbook reference: byte arrays -> uppercase hex symbols --------

  private def refTokens(text: String): Seq[String] =
    text.toLowerCase.trim.replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty).toSeq

  private def hexSeed(word: String): Vector[String] =
    word.getBytes(StandardCharsets.UTF_8).toVector.map(b => f"${b & 0xff}%02X")

  /** Exhaustive left-to-right non-overlapping fuse of one rule. */
  private def fuse(s: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < s.length) {
      if (j + 1 < s.length && s(j) == l && s(j + 1) == r) { out += (l + r); j += 2 }
      else { out += s(j); j += 1 }
    }
    out.result()
  }

  /** Textbook trainer: per round, the (count DESC, lhs, rhs) best adjacent
    * pair over the word-frequency table, fused corpus-wide. Hex symbols
    * are pure ASCII so natural string order IS bytewise order. */
  private def refTrain(words: Map[String, Long], k: Int)
      : Seq[(Int, String, String, Long)] = {
    var syms = words.map { case (w, _) => w -> hexSeed(w) }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var done = false
    for (i <- 1 to k if !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, s) <- syms; j <- 0 until s.length - 1) {
        val p = (s(j), s(j + 1))
        counts(p) = counts.getOrElse(p, 0L) + words(w)
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((i, l, r, c))
        syms = syms.map { case (w, s) => w -> fuse(s, l, r) }
      }
    }
    merges.result()
  }

  /** Textbook encoder: rules applied in learned order, each exhaustively. */
  private def refEncode(word: String,
                        merges: Seq[(Int, String, String, Long)]): Vector[String] =
    merges.sortBy(_._1).foldLeft(hexSeed(word)) {
      case (s, (_, l, r, _)) => fuse(s, l, r)
    }

  private def refDocRollup(texts: Seq[(Long, String)],
                           merges: Seq[(Int, String, String, Long)])
      : Map[Long, (Long, Long, Long)] =
    texts.flatMap { case (id, t) =>
      val ws = refTokens(t)
      if (ws.isEmpty) None
      else Some(id -> ((ws.size.toLong,
        ws.map(_.getBytes(StandardCharsets.UTF_8).length.toLong).sum,
        ws.map(w => refEncode(w, merges).size.toLong).sum)))
    }.toMap

  // alphabet mixing ASCII, a 2-byte char, U+FFFD (3 bytes) and a
  // supplementary-plane emoji (4 bytes) — all lowercase-stable, so the
  // reference's toLowerCase and Spark's lower() agree by construction
  private val wordGen = for {
    len <- Gen.chooseNum(1, 5)
    cs <- Gen.listOfN(len, Gen.oneOf("a", "b", "é", "�", "😀"))
  } yield cs.mkString
  private val docGen = Gen.chooseNum(1, 8).flatMap(n =>
    Gen.listOfN(n, wordGen).map(_.mkString(" ")))
  private val corpusGen = Gen.chooseNum(1, 10).flatMap(n =>
    Gen.listOfN(n, docGen).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) }))

  test("byte-level merges ≡ textbook byte-array reference on exotic corpora") {
    checkProp(forAll(corpusGen, Gen.chooseNum(1, 5)) { (texts, k) =>
      val docs = texts.toDF("doc_id", "text")
      val got = TextAnalysis.bpeMergesBytes(docs, k)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3))).sortBy(_._1).toSeq
      val wordFreq = texts.flatMap(t => refTokens(t._2))
        .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      val want = refTrain(wordFreq, k)
      (got == want) :| s"k=$k got=$got want=$want"
    })
  }

  test("byte-level trainer: driver fast path ≡ distributed round loop") {
    checkProp(forAll(corpusGen, Gen.chooseNum(1, 4)) { (texts, k) =>
      val docs = texts.toDF("doc_id", "text")
      val (fs, fm) = TextAnalysis.bpeTrain(docs, k, byteLevel = true)
      val (ds, dm) = TextAnalysis.bpeTrain(docs, k, byteLevel = true,
        maxDriverVocab = -1L)
      def st(df: org.apache.spark.sql.DataFrame) =
        df.select("word", "cnt", "sym").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
      (fm == dm && st(fs) == st(ds)) :| s"k=$k fast=$fm dist=$dm"
    }, n = 6)
  }

  test("cross-corpus encode ≡ reference; OOV words still merge (no unknown path)") {
    checkProp(forAll(corpusGen, Gen.chooseNum(1, 5)) { (texts, k) =>
      (texts.size >= 2) ==> {
        // train on the first half only, encode EVERYTHING: unseen words
        // must flow through the same rule application, not a fallback
        val trainTexts = texts.take(texts.size / 2)
        val docs = texts.toDF("doc_id", "text")
        val merges = TextAnalysis.bpeTrain(
          trainTexts.toDF("doc_id", "text"), k, byteLevel = true)._2
        val got = TextAnalysis.bpeEncodeBytes(docs, merges)
          .collect().map(r => r.getLong(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
        val want = refDocRollup(texts, merges)
        (got == want) :| s"k=$k got=$got want=$want"
      }
    })
  }

  test("mapPartitions replay ≡ expression-tree fold (the retired plan shape)") {
    // the query path now replays merges in a typed map; the original
    // byteSymSeed + chained-aggregate expression form is the spec
    // reference — identical rollups on arbitrary corpora and rule counts
    checkProp(forAll(corpusGen, Gen.chooseNum(0, 5)) { (texts, k) =>
      val docs = texts.toDF("doc_id", "text")
      val merges =
        if (k == 0) Seq.empty
        else TextAnalysis.bpeTrain(docs, k, byteLevel = true)._2
      def roll(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val neu = roll(TextAnalysis.bpeEncodeBytes(docs, merges))
      val old = roll(TextAnalysis.bpeEncodeBytesExpr(docs, merges))
      (neu == old) :| s"k=$k neu=$neu old=$old"
    }, n = 6)
  }

  test("totality: every symbol sequence reconstructs the word's exact UTF-8 bytes") {
    // the byte-fallback property: NO byte is ever lost or substituted by
    // encoding, for any input and any rule set — concatenating the
    // symbols' hex is the seed's hex, always
    checkProp(forAll(corpusGen, Gen.chooseNum(1, 6)) { (texts, k) =>
      val wordFreq = texts.flatMap(t => refTokens(t._2))
        .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      val merges = refTrain(wordFreq, k)
      wordFreq.keys.forall { w =>
        val enc = refEncode(w, merges)
        enc.nonEmpty && enc.mkString == hexSeed(w).mkString
      } :| s"k=$k"
    })
  }

  test("unpaired surrogates and astral text encode totally and match the reference") {
    // a lone high surrogate is not valid UTF-8; both engines' String→UTF-8
    // conversion substitutes '?' (Java CharsetEncoder REPLACE) — the
    // encoder must stay total and agree with the reference built on the
    // same conversion
    val texts = Seq(
      (1L, "ab\ud800cd ab"),              // unpaired high surrogate mid-word
      (2L, "😀😀 a"), // astral pair (4-byte UTF-8)
      (3L, "\udc00"),                     // lone low surrogate, whole word
      (4L, "plain words here"))
    val docs = texts.toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, 4, byteLevel = true)._2
    val got = TextAnalysis.bpeEncodeBytes(docs, merges)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === refDocRollup(texts, merges))
    // and the surrogate really took the 1-byte '?' route in both
    assert(got(3L)._2 === 1L)
  }

  test("zero rules: unit count is exactly the UTF-8 byte count (the seed)") {
    val w = "héllo😀" // 1+2+1+1+1 codepoint bytes + 4 = 10 UTF-8 bytes
    val nb = hexSeed(w).size.toLong
    val got = TextAnalysis.bpeEncodeBytes(
        Seq((1L, w)).toDF("doc_id", "text"), Seq.empty)
      .collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) === ((1L, nb, nb)))
  }
}
