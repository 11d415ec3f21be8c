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
}
