package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("BPE pre-token counts match the RE2 (DuckDB) golden values") {
    // goldens computed with DuckDB regexp_extract_all on the same pattern —
    // pins Java-regex ↔ RE2 parity on contractions, unicode letters,
    // currency/punctuation runs, digit runs, and whitespace runs
    val cases = Seq(
      ("it's 2024, we're going—naïve £3.14 test", 14L),
      ("a  b\tc\nd", 7L),
      ("don't CAN'T 'll x86_64", 11L),
      ("…", 1L),
      ("  leading and trailing  ", 5L))
    val got = TextAnalysis.tokenCounts(
        cases.zipWithIndex.map { case ((t, _), i) => (i.toLong, t) }
          .toDF("doc_id", "text"))
      .orderBy("doc_id").collect().map(_.getAs[Long]("n_bpe")).toSeq
    assert(got === cases.map(_._2))
  }

  test("fertility is n_bpe over whitespace tokens at 6 dp") {
    val df = TextAnalysis.tokenCounts(Seq((1L, "it's a test")).toDF("doc_id", "text"))
      .collect().head
    // ws tokens of normalized text: ["it's", "a", "test"]; bpe: it|'s| a| test
    assert(df.getAs[Long]("n_ws") === 3L)
    assert(df.getAs[Long]("n_bpe") === 4L)
    assert(df.getAs[Double]("fertility") === math.round(4.0 / 3.0 * 1e6) / 1e6)
  }

  test("vocab ranks by frequency with lexical tie-break, cuts at topV") {
    val docs = Seq((1L, "b b b a a c c d"), (2L, "a d")).toDF("doc_id", "text")
    // freqs: a=3, b=3, c=2, d=2 → rank: a,b (tie on 3), c,d (tie on 2)
    val got = TextAnalysis.vocab(docs, topV = 3).orderBy("rank").collect()
      .map(r => (r.getAs[String]("tok"), r.getAs[Long]("freq"), r.getAs[Int]("rank")))
    assert(got.toSeq === Seq(("a", 3L, 1), ("b", 3L, 2), ("c", 2L, 3)))
  }

  test("tfidf top terms: rare term outranks common, cut at k per doc") {
    val docs = Seq((1L, "apple banana apple"), (2L, "banana cherry"),
      (3L, "cherry date")).toDF("doc_id", "text")
    // N=3; df: apple=1, banana=2, cherry=2, date=1
    val got = TextAnalysis.tfidfTopTerms(docs, k = 1).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
        r.getAs[Long]("tf"), r.getAs[Double]("score")))
    assert(got.length === 3)
    assert(got(0)._2 === "apple" && got(0)._3 === 2L)
    assert(math.abs(got(0)._4 - 2.0 * ((3.0 - 1.0 + 0.5) / 1.5)) < 1e-12)
    // doc 2: banana and cherry tie on score (same tf, same df) → lexical
    assert(got(1)._2 === "banana")
    assert(got(2)._2 === "date") // df 1 beats cherry's df 2
  }

  test("PMI collocations: bound pair tops the list, min-count floor cuts") {
    val docs = Seq((1L, "a a new york a new york b")).toDF("doc_id", "text")
    // tokens: a,a,new,york,a,new,york,b → U=8; c(a)=3, c(new)=c(york)=2
    // bigrams (B=7): (a,a) (a,new)x2 (new,york)x2 (york,a) (york,b)
    val got = TextAnalysis.pmiCollocations(docs, minCount = 2, k = 5).collect()
      .map(r => (r.getAs[String]("t1"), r.getAs[String]("t2"),
        r.getAs[Long]("cab"), r.getAs[Double]("pmi")))
    assert(got.length === 2) // singletons dropped by the floor
    assert((got(0)._1, got(0)._2) === ("new", "york"))
    assert(math.abs(got(0)._4 - 2.0 * 64.0 / (7.0 * 2.0 * 2.0)) < 1e-12)
    assert((got(1)._1, got(1)._2) === ("a", "new"))
    assert(math.abs(got(1)._4 - 2.0 * 64.0 / (7.0 * 3.0 * 2.0)) < 1e-12)
  }
}
