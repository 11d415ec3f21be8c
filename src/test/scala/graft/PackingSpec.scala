package graft

import graft.operators.CorpusPrep
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("concat-and-chop packing: spans, offsets, and bucket-boundary continuity") {
    // budget 10; cumulative: 4, 12, 22, 23, 40 — docs 2 and 5 span blocks
    val docs = Seq((0L, 4L), (1L, 8L), (2L, 10L), (3L, 1L), (4L, 17L))
      .toDF("doc_id", "n_tokens")
    // buckets=2 forces the two-phase prefix sum across a bucket boundary
    val got = CorpusPrep.packSequences(docs, budget = 10L, buckets = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seq_first"),
        r.getAs[Long]("seq_last"), r.getAs[Long]("seq_offset")))
    assert(got.toSeq === Seq(
      (0L, 0L, 0L, 0L),  // tokens [0,4)
      (1L, 0L, 1L, 4L),  // [4,12) spans blocks 0-1
      (2L, 1L, 2L, 2L),  // [12,22) spans 1-2
      (3L, 2L, 2L, 2L),  // [22,23)
      (4L, 2L, 3L, 3L))) // [23,40) spans 2-3
  }

  test("bucketed prefix sum equals a single global cumsum on random sizes") {
    val rnd = new scala.util.Random(11)
    val docs = Seq.tabulate(200)(i => (i.toLong, (rnd.nextInt(50) + 1).toLong))
      .toDF("doc_id", "n_tokens")
    val bucketed = CorpusPrep.packSequences(docs, budget = 64L, buckets = 7)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val global = CorpusPrep.packSequences(docs, budget = 64L, buckets = 1)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(bucketed === global)
  }

  test("packExamples round-trips: blocks re-concatenate to the corpus token stream; labels shift left") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "e f g h i j"), (3L, "k"), (4L, "l m n o p q r s")
    ).toDF("doc_id", "text") // 4+6+1+8 = 19 tokens, budget 5 → blocks 0..3
    val blocks = CorpusPrep.packExamples(docs, budget = 5L)
      .orderBy("block_id").collect()
    assert(blocks.length === 4)
    // stream round-trip: flatten(blocks) == hashed tokens in doc_id order
    val stream = blocks.flatMap(_.getSeq[Long](2))
    val expected = docs.orderBy("doc_id")
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("t"))
      .select(graft.operators.TextOps.hash60(col("t")))
      .as[Long].collect()
    assert(stream.toSeq === expected.toSeq)
    // every full block holds exactly budget tokens; the tail holds the rest
    assert(blocks.init.forall(_.getLong(1) === 5L) && blocks.last.getLong(1) === 4L)
    // labels law: labels[i] == input[i+1], last masked with -100
    blocks.foreach { b =>
      val in = b.getSeq[Long](2); val lab = b.getSeq[Long](3)
      assert(lab.size === in.size)
      assert(lab.init === in.tail && lab.last === -100L)
    }
  }

  test("packExamples round-trip holds for arbitrary corpora and budgets") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.{forAll, propBoolean}
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val docGen = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word))
    val corpusGen = Gen.nonEmptyListOf(docGen).map(_.take(12))
    val prop = forAll(corpusGen, Gen.chooseNum(2, 9)) { (corpus, budget) =>
      val docs = corpus.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val blocks = graft.operators.CorpusPrep.packExamples(docs, budget.toLong)
        .orderBy("block_id").collect()
      val stream = blocks.flatMap(_.getSeq[Long](2)).toList
      val expectedHashes = docs.orderBy("doc_id")
        .select(explode(graft.operators.TextOps.tokens(col("text"))).as("t"))
        .select(graft.operators.TextOps.hash60(col("t")))
        .as[Long].collect().toList
      val sizesOk = blocks.init.forall(_.getLong(1) == budget.toLong) &&
        blocks.last.getLong(1) == (expectedHashes.size - 1) % budget + 1
      val labelsOk = blocks.forall { b =>
        val in = b.getSeq[Long](2); val lab = b.getSeq[Long](3)
        lab.size == in.size && lab.init == in.tail && lab.last == -100L
      }
      (stream == expectedHashes && sizesOk && labelsOk) :|
        s"budget=$budget docs=${corpus.size} toks=${expectedHashes.size}"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("packing an empty corpus yields an empty result, not an NPE") {
    val docs = Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens")
    val got = CorpusPrep.packSequences(docs, budget = 10L)
    assert(got.columns.toSeq ===
      Seq("doc_id", "n_tokens", "seq_first", "seq_last", "seq_offset"))
    assert(got.count() === 0L)
  }
}
