package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Embedding-space cross-corpus decontamination (L80,
  * [[Similarity.embedDecontaminate]]): the paraphrase pair the n-gram gate
  * provably misses is caught; candidates never pair corpus with corpus;
  * exact-cosine verification matches brute force. */
class EmbedDecontamSpec extends SparkSpec {
  import spark.implicits._

  private def embs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  private def bruteCross(corpus: Seq[(Long, Seq[Float])],
                         bench: Seq[(Long, Seq[Float])],
                         thr: Double): Set[(Long, Long)] = {
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    (for ((ci, cv) <- corpus; (bi, bv) <- bench if cos(cv, bv) >= thr)
      yield (ci, bi)).toSet
  }

  test("a paraphrase pair the shared-trigram gate misses is caught in embedding space") {
    // zero shared trigrams (different words entirely) -> the L25 n-gram
    // decontamination gate at minShared=2 structurally CANNOT flag it...
    val train = Seq((1L, "the cat sat on the mat and purred softly"),
      (2L, "stock prices rose sharply in early trading"))
      .toDF("doc_id", "text")
    val eval_ = Seq((100L, "a feline rested upon a rug while humming quietly"))
      .toDF("doc_id", "text")
    assert(Dedup.decontaminate(train, eval_, n = 3, minShared = 2L).isEmpty)
    // ...but the paraphrase sits next to its source in embedding space
    val vCat = Seq.fill(8)(0.9f) :+ 0.1f
    val vFeline = Seq.fill(8)(0.88f) :+ 0.15f // cosine vs vCat ~ 0.999
    val vStocks = (1 to 9).map(i => if (i % 2 == 0) 1.0f else -1.0f)
    val got = Similarity.embedDecontaminate(
        embs(1L -> vCat, 2L -> vStocks), embs(100L -> vFeline),
        threshold = 0.9, bands = 8, bitsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 100L)))
  }

  test("candidates never pair corpus with corpus — even exact corpus duplicates") {
    // two IDENTICAL corpus vectors share every bucket; the output must
    // still only couple corpus ids with the benchmark id
    val v = Seq(1.0f, 0.5f, -0.25f, 0.75f)
    val got = Similarity.embedDecontaminate(
        embs(1L -> v, 2L -> v, 3L -> v.map(-_)), embs(50L -> v),
        threshold = 0.5, bands = 6, bitsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 50L), (2L, 50L)))
  }

  test("verified pairs == brute-force cross cosine on a random mixed corpus") {
    val rnd = new scala.util.Random(7)
    def vec(base: Array[Float], jitter: Float): Seq[Float] =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * jitter).toSeq
    val centers = Array.fill(3)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val corpus = (0L until 40L).map(i =>
      i -> vec(centers((i % 3).toInt), 0.3f))
    val bench = (100L until 110L).map(i =>
      i -> vec(centers((i % 3).toInt), 0.3f))
    val got = Similarity.embedDecontaminate(
        embs(corpus: _*), embs(bench: _*),
        threshold = 0.8, bands = 48, bitsPerBand = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === bruteCross(corpus, bench, 0.8))
  }

  test("an empty benchmark side decontaminates nothing") {
    val got = Similarity.embedDecontaminate(
      embs(1L -> Seq(1.0f, 0.0f)), embs(), bands = 4, bitsPerBand = 2)
    assert(got.isEmpty)
  }
}
