package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("exact dedup: normalization variants share a hash, min id is canonical") {
    val d = Dedup.exact(docs(
      1L -> "Hello  World foo",
      2L -> "hello world   FOO",  // same after normalize
      3L -> "something else entirely"))
      .orderBy("doc_id").collect()
    assert(d(0).getAs[String]("content_hash") === d(1).getAs[String]("content_hash"))
    assert(d(0).getAs[Long]("canonical_id") === 1L)
    assert(d(1).getAs[Long]("canonical_id") === 1L)
    assert(!d(1).getAs[Boolean]("is_canonical"))
    assert(d(2).getAs[Boolean]("is_canonical"))
  }

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon"

  test("minhash near-dup finds a planted high-Jaccard pair, skips unrelated docs") {
    val d = docs(
      1L -> base,
      2L -> (base + " phi"),   // near-identical: one extra word
      3L -> "one two three four five six seven eight nine ten eleven twelve")
    val pairs = Dedup.nearDupMinhash(d, threshold = 0.8).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
    // 20 tokens -> 18 shingles; adding 1 word adds 1 shingle: J = 18/19
    assert(math.abs(pairs(0).getDouble(2) - 18.0 / 19.0) < 1e-9)
  }

  test("ngram prefix-filter join == brute-force Jaccard (exact recall)") {
    // overlapping word soup from a 3-word vocabulary → many mid-Jaccard pairs
    val rnd = new scala.util.Random(7)
    val vocab = Vector("xx", "yy", "zz")
    val d = docs((1L to 30L).map { i =>
      i -> Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }: _*)
    val shs = Dedup.shingleSets(d, 3)
    val allPairs = shs.select($"doc_id".as("i"))
      .crossJoin(shs.select($"doc_id".as("j"))).filter($"i" < $"j")
    val brute = Dedup.verifyJaccard(allPairs, shs, 0.3)
      .orderBy("i", "j").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pp = Dedup.nearDupNgram(d, threshold = 0.3)
      .orderBy("i", "j").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(brute.nonEmpty) // the test must actually exercise pairs
    assert(pp.toSeq === brute.toSeq)
  }

  test("containment: a full quote inside a long host scores 1.0 where Jaccard ≈ 0") {
    val host = base + " " + "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen " +
      "nineteen twenty " + "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp"
    val quote = "one two three four five six seven eight nine ten"
    val d = docs(1L -> host, 2L -> quote)
    // the quote's 8 shingles all appear in the host → containment exactly 1.0
    val c = Dedup.containmentNgram(d, threshold = 0.9).collect()
    assert(c.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ===
      Seq((1L, 2L, 1.0)))
    // the same pair is invisible to Jaccard at any usable threshold
    assert(Dedup.nearDupNgram(d, threshold = 0.3).isEmpty)
  }

  test("containment == brute force, and containment >= jaccard pairwise") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("xx", "yy", "zz", "ww")
    val d = docs((1L to 30L).map { i =>
      i -> Seq.fill(10 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }: _*)
    // brute force over materialized shingle sets
    val shs = Dedup.shingleSets(d, 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val brute = (for {
      i <- shs.keys; j <- shs.keys if i < j
      inter = (shs(i) intersect shs(j)).size
      c = inter.toDouble / math.min(shs(i).size, shs(j).size) if c >= 0.3
    } yield (i, j, c)).toSeq.sorted
    val got = Dedup.containmentNgram(d, threshold = 0.3).orderBy("i", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(brute.nonEmpty)
    assert(got === brute)
    // dominance: every Jaccard-qualifying pair also qualifies on containment
    val jac = Dedup.nearDupNgram(d, threshold = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val con = got.map { case (i, j, c) => ((i, j), c) }.toMap
    jac.foreach { case (k, jv) =>
      assert(con.contains(k) && con(k) >= jv - 1e-12,
        s"pair $k: containment ${con.get(k)} < jaccard $jv")
    }
  }

  test("simhash banding == brute-force hamming (pigeonhole exact recall)") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "pink", "gold")
    val d = docs((1L to 25L).map { i =>
      i -> Seq.fill(10)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }: _*)
    val sh = Dedup.simhash(d)
    val brute = sh.as("a").crossJoin(sh.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("i"), $"b.doc_id".as("j"),
        bit_count($"a.simhash".bitwiseXOR($"b.simhash")).as("hamming"))
      .filter($"hamming" <= 3)
      .orderBy("i", "j").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val banded = Dedup.nearDupSimhash(d, maxHamming = 3)
      .orderBy("i", "j").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(banded.toSeq === brute.toSeq)
  }

  test("identical docs have simhash hamming 0 and minhash Jaccard 1") {
    val d = docs(1L -> base, 2L -> base)
    val sim = Dedup.nearDupSimhash(d).collect()
    assert(sim.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq === Seq((1L, 2L, 0)))
    val mh = Dedup.nearDupMinhash(d).collect()
    assert(mh.length === 1 && mh(0).getDouble(2) === 1.0)
  }

  test("connected components: chains collapse transitively, clusters stay disjoint") {
    // chain 1-2-3-4 (diameter 3 — needs >1 propagation round) + pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("i", "j")
    val got = Dedup.connectedComponents(pairs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connected components refuses to emit partial clusters at the iteration cap") {
    val chain = Seq.tabulate(6)(k => (k.toLong, k + 1L)).toDF("i", "j")
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain, maxIter = 1)
    }
  }

  test("ngram maxDf drops over-cap shingles before postings materialize") {
    // "aa bb cc" appears in all 3 docs (df=3 > cap) → excluded before
    // collect_list; the duplicate pair keeps its 2 rare shared shingles
    val d = docs(
      1L -> "aa bb cc dd ee",
      2L -> "aa bb cc dd ee",
      3L -> "aa bb cc zz ww")
    val capped = Dedup.nearDupNgram(d, threshold = 0.3, maxDf = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // J(1,2) = 2 shared eligible shingles / (3 + 3 - 2) = 0.5; (·,3) pairs
    // lose their only shared shingle and vanish entirely
    assert(capped === Set((1L, 2L, 0.5)))
    val uncapped = Dedup.nearDupNgram(d, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(uncapped === Set((1L, 2L, 1.0)))
  }

  test("decontaminate maxDf drops over-cap shingles before pair expansion") {
    // "aa bb cc" appears in every train doc (df=3) and the eval doc; the
    // unique tail shingles appear once each. With cap=2 the common shingle
    // must not contribute, so only the doc sharing 2 rare shingles survives.
    val train = docs(
      1L -> "aa bb cc dd ee",   // shares "aa bb cc","bb cc dd","cc dd ee" w/ eval
      2L -> "aa bb cc xx yy",
      3L -> "aa bb cc zz ww")
    val ev = docs(100L -> "aa bb cc dd ee")
    val capped = Dedup.decontaminate(train, ev, n = 3, minShared = 2L,
        maxDf = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // "aa bb cc" has train-df 3 > cap → excluded; doc 1 still shares
    // "bb cc dd" + "cc dd ee" (df 1 each); docs 2/3 drop to 0 shared.
    assert(capped === Set((100L, 1L, 2L)))
    val uncapped = Dedup.decontaminate(train, ev, n = 3, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(uncapped === Set((100L, 1L, 3L), (100L, 2L, 1L), (100L, 3L, 1L)))
  }

  test("span dedup: repeated segments drop, first occurrence wins, order kept") {
    // span=2: doc 1 = [ab][cd][ef]; doc 2 repeats [ab] and [cd] grid-aligned
    // plus its own tail; doc 3 duplicates doc 1 entirely
    val d = Dedup.dedupSpans(docs(
      1L -> "a b c d e f",
      2L -> "a b c d x y",
      3L -> "a b c d e f"), span = 2)
      .orderBy("doc_id").collect()
    assert(d.map(_.getAs[Long]("n_spans")).toSeq === Seq(3L, 3L, 3L))
    assert(d.map(_.getAs[Long]("n_kept")).toSeq === Seq(3L, 1L, 0L))
    assert(d.map(_.getAs[String]("clean_text")).toSeq ===
      Seq("a b c d e f", "x y", ""))
  }

  test("span dedup: within-doc repeats collapse; ragged tail is its own span") {
    val d = Dedup.dedupSpans(docs(1L -> "p q p q r"), span = 2)
      .collect().head
    // segments: [p q], [p q], [r] → second [p q] drops
    assert(d.getAs[Long]("n_spans") === 3L)
    assert(d.getAs[Long]("n_kept") === 2L)
    assert(d.getAs[String]("clean_text") === "p q r")
  }

  test("boilerplate scrub: df>=3 segments removed from EVERY doc, df=2 survives") {
    // span=2 grid: [h h] appears in docs 1,2,3 (df=3 → boilerplate,
    // removed everywhere incl. the first); [u v] appears in docs 1,2
    // (df=2 → kept in both — first-wins dedup would drop the second)
    val d = Dedup.boilerplateScrub(docs(
      1L -> "h h u v a b",
      2L -> "h h u v c d",
      3L -> "h h e f"), span = 2, minDf = 3)
      .orderBy("doc_id").collect()
    assert(d.map(_.getAs[Long]("n_spans")).toSeq === Seq(3L, 3L, 2L))
    assert(d.map(_.getAs[Long]("n_kept")).toSeq === Seq(2L, 2L, 1L))
    assert(d.map(_.getAs[String]("clean_text")).toSeq ===
      Seq("u v a b", "u v c d", "e f"))
  }

  test("boilerplate scrub: within-doc repetition counts ONE doc toward df") {
    // [x y] three times in doc 1 but only 2 distinct docs → NOT boilerplate
    val d = Dedup.boilerplateScrub(docs(
      1L -> "x y x y x y",
      2L -> "x y q r"), span = 2, minDf = 3)
      .orderBy("doc_id").collect()
    assert(d.map(_.getAs[Long]("n_kept")).toSeq === Seq(3L, 2L))
    assert(d(0).getAs[String]("clean_text") === "x y x y x y")
  }

  test("dedupSubstr removes the NON-grid-aligned repeated passage dedupSpans misses") {
    // P = a 15-token passage; doc 1 carries it at offset 0, doc 2 at
    // offset 3 — not a multiple of the 10-token grid, so no 10-token
    // SEGMENT of doc 2 equals any segment of doc 1
    val p = (1 to 15).map(i => s"p$i").mkString(" ")
    val d1 = p + " " + (1 to 5).map(i => s"x$i").mkString(" ")   // 20 toks
    val d2 = "j1 j2 j3 " + p + " " + (1 to 2).map(i => s"y$i").mkString(" ") // 20 toks
    val in = docs(1L -> d1, 2L -> d2)
    // the grid scrub is blind to the shift: every segment survives
    val spans = Dedup.dedupSpans(in, span = 10).orderBy("doc_id").collect()
    assert(spans.map(_.getAs[Long]("n_kept")).toSeq === Seq(2L, 2L),
      "fixture invalid: dedupSpans caught the shifted passage")
    // the any-offset scrub removes exactly doc 2's copy of P
    val sub = Dedup.dedupSubstr(in, minRun = 10).orderBy("doc_id").collect()
    assert(sub(0).getAs[Long]("n_kept") === 20L, "first occurrence must survive")
    assert(sub(0).getAs[String]("clean_text") === d1)
    assert(sub(1).getAs[Long]("n_tokens") === 20L)
    assert(sub(1).getAs[Long]("n_kept") === 5L)
    assert(sub(1).getAs[String]("clean_text") === "j1 j2 j3 y1 y2")
  }

  test("dedupSubstr: runs shorter than minRun survive; within-doc repeats scrub") {
    // 9-token repeat < minRun=10: kept everywhere
    val q = (1 to 9).map(i => s"q$i").mkString(" ")
    val short = docs(1L -> (q + " a b"), 2L -> ("c " + q + " d"))
    val gotShort = Dedup.dedupSubstr(short, minRun = 10).orderBy("doc_id").collect()
    assert(gotShort.map(_.getAs[Long]("n_kept")).toSeq === Seq(11L, 11L))
    // a doc repeating its own 12-token run back-to-back scrubs the echo
    val r = (1 to 12).map(i => s"r$i").mkString(" ")
    val self = docs(7L -> (r + " " + r))
    val gotSelf = Dedup.dedupSubstr(self, minRun = 10).collect()(0)
    assert(gotSelf.getAs[Long]("n_tokens") === 24L)
    assert(gotSelf.getAs[Long]("n_kept") === 12L)
    assert(gotSelf.getAs[String]("clean_text") === r)
  }

  test("dedupSubstrAgainst ≡ full dedupSubstr on new docs when the corpus is globally first") {
    // with corpus ids strictly below batch ids, the union's global
    // (doc_id, pos) first-wins order makes every corpus occurrence
    // "earlier" — exactly the incremental contract, so the two paths
    // must agree on the batch rows bit-for-bit
    val p = (1 to 12).map(i => s"p$i").mkString(" ")
    val corpus = docs(
      1L -> (p + " a b c"),
      2L -> "u v w x y z u v w x y z") // self-repeat inside the corpus
    val batch = docs(
      100L -> ("k1 k2 " + p + " tail"),          // shifted corpus passage
      101L -> ("fresh f1 f2 f3 " + p),            // another copy, later id
      102L -> ("k1 k2 " + p + " tail"))           // identical to 100: within-batch dup
    val k = 5
    val full = Dedup.dedupSubstr(corpus.unionByName(batch), minRun = k)
      .filter(col("doc_id") >= 100L).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val inc = Dedup.dedupSubstrAgainst(
        Dedup.substrGramIndex(corpus, minRun = k), batch, minRun = k)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(inc === full, s"incremental diverged from the one-shot union")
    // and the corpus passage really was scrubbed from every batch doc
    assert(inc.forall(r => !r._4.contains("p3 p4 p5 p6 p7")), inc.toString)
  }

  test("prefix dedup: same k-token head groups regardless of tail; short docs skip") {
    val d = Dedup.prefixDedup(docs(
      1L -> "a b c tail one",
      2L -> "a b c completely different continuation",
      3L -> "a b x tail one",
      4L -> "a b"), // < 3 tokens: cannot assert a prefix
      k = 3).orderBy("doc_id").collect()
    assert(d.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L, 3L))
    assert(d.map(_.getAs[Long]("canonical_id")).toSeq === Seq(1L, 1L, 3L))
    assert(d.map(_.getAs[Boolean]("is_canonical")).toSeq === Seq(true, false, true))
    assert(d.map(_.getAs[Long]("group_size")).toSeq === Seq(2L, 2L, 1L))
  }
}
