package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def embs(rows: (Long, Seq[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("cosine: known geometry") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0)), (Seq(1.0, 2.0), Seq(2.0, 4.0)),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0)))
      .toDF("a", "b")
      .select(Similarity.cosine($"a", $"b").as("c")).collect().map(_.getDouble(0))
    assert(math.abs(df(0)) < 1e-12)
    assert(math.abs(df(1) - 1.0) < 1e-12)
    assert(math.abs(df(2) + 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak, excludes self") {
    val d = embs(
      (0L, Seq(1f, 0f, 0f), 0),
      (1L, Seq(0.9f, 0.1f, 0f), 0),
      (2L, Seq(0f, 1f, 0f), 1),
      (3L, Seq(1f, 0.01f, 0f), 0),
      (4L, Seq(-1f, 0f, 0f), 2)
    ).select($"vec_id", $"embedding".cast("array<float>").as("embedding"), $"label")
    val top = Similarity.bruteForceTopK(d, d.filter($"vec_id" === 0), k = 3)
      .orderBy("rank").collect().map(r => (r.getAs[Long]("cid"), r.getAs[Int]("rank")))
    assert(top.toSeq === Seq((3L, 1), (1L, 2), (2L, 3)))
  }

  test("topKPerQuery two-phase prune matches a plain window over all scores") {
    val rnd = new scala.util.Random(3)
    val scored = (for { q <- 0L until 4L; c <- 0L until 200L }
      yield (q, c, rnd.nextDouble())).toDF("qid", "cid", "score").repartition(8)
    val got = Similarity.topKPerQuery(scored, 7)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"), r.getAs[Int]("rank")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"score".desc, $"cid")
    val exp = scored.withColumn("rank", row_number().over(w)).filter($"rank" <= 7)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"), r.getAs[Int]("rank")))
    assert(got.toSeq === exp.toSeq)
  }

  test("embedNearDup finds near-parallel vectors via LSH banding") {
    val d = embs(
      (1L, Seq(1f, 0.01f, 0.02f, 0f), 0),
      (2L, Seq(0.99f, 0.012f, 0.021f, 0.001f), 0), // ~parallel to 1
      (3L, Seq(0f, 1f, 0f, 0f), 1),
      (4L, Seq(0f, 0f, -1f, 0.2f), 2)
    ).select($"vec_id", $"embedding".cast("array<float>").as("embedding"), $"label")
    val pairs = Similarity.embedNearDup(d, threshold = 0.99, bands = 16, bitsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("embedNearDup star-pairs oversized buckets instead of dropping them") {
    // five exact duplicates land in the same bucket in EVERY band; with
    // maxBucket = 3 that bucket is always oversized, so without the star
    // fallback the cluster would vanish from the candidate set entirely
    val dup = Seq(0.3f, -0.7f, 0.5f, 0.1f)
    val d = embs(
      ((1L to 5L).map(i => (i, dup, 0)) ++ Seq(
        (6L, Seq(0f, 1f, 0f, 0f), 1),
        (7L, Seq(-1f, 0f, 0.2f, 0f), 2))): _*)
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"), $"label")
    val pairs = Similarity.embedNearDup(d, threshold = 0.999, bands = 8,
        bitsPerBand = 2, maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === (2L to 5L).map(j => (1L, j)).toSet)
  }

  test("embedNearDup join-verify path matches the broadcast-verify path") {
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(8)(rnd.nextGaussian().toFloat)
    val d = embs((0L until 30L).map { i =>
      val v = if (i % 3 == 0) base.map(x => x + rnd.nextGaussian().toFloat * 0.01f)
              else Seq.fill(8)(rnd.nextGaussian().toFloat)
      (i, v, 0)
    }: _*).select($"vec_id", $"embedding".cast("array<float>").as("embedding"), $"label")
    def run(maxRows: Long) =
      Similarity.embedNearDup(d, threshold = 0.9, bands = 24, bitsPerBand = 2,
          broadcastVerifyMaxRows = maxRows)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).toSet
    // 30 rows: maxRows=1 forces the shuffle-join verify, 1<<19 broadcasts
    assert(run(1L) === run(1L << 19))
    assert(run(1L << 19).nonEmpty)
  }

  test("quantizeInt8: values in [-127,127], dequant error bounded by scale/2") {
    val rnd = new scala.util.Random(9)
    val d = embs((0L until 20L).map { i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat), 0)
    }: _*).select($"vec_id", $"embedding".cast("array<float>").as("embedding"), $"label")
    val q = graft.operators.Similarity.quantizeInt8(d)
      .join(d.select($"vec_id", $"embedding".cast("array<double>").as("v")), "vec_id")
      .collect()
    q.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val qs = r.getAs[scala.collection.Seq[Int]]("q")
      val vs = r.getAs[scala.collection.Seq[Double]]("v")
      assert(qs.forall(x => x >= -127 && x <= 127))
      assert(qs.exists(x => math.abs(x) == 127)) // absmax component saturates
      qs.zip(vs).foreach { case (qi, vi) =>
        assert(math.abs(vi - qi * scale) <= scale / 2 + 1e-12)
      }
    }
  }

  test("lshTopK with generous banding equals brute force") {
    val rnd = new scala.util.Random(5)
    val d = embs((0L until 60L).map { i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat), 0)
    }: _*).select($"vec_id", $"embedding".cast("array<float>").as("embedding"), $"label")
    val q = d.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(d, q, k = 4)
      .orderBy("qid", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val lsh = Similarity.lshTopK(d, q, k = 4, bands = 96, bitsPerBand = 2)
      .orderBy("qid", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(lsh.toSeq === exact.toSeq)
  }

  test("pqTopK equals brute force on a clustered corpus at a modest candFactor") {
    // 3 well-separated clusters in 16 dims — the regime PQ is built for:
    // codes carry the cluster signal, so a small candidate margin recalls
    // every true neighbor before the exact re-rank
    val rnd = new scala.util.Random(7)
    val centers = Seq(
      Array.tabulate(16)(i => if (i < 5) 1.0 else 0.0),
      Array.tabulate(16)(i => if (i >= 5 && i < 10) 1.0 else 0.0),
      Array.tabulate(16)(i => if (i >= 10) 1.0 else 0.0))
    val d = embs((0L until 60L).map { i =>
      val c = centers((i % 3).toInt)
      (i, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq, (i % 3).toInt)
    }: _*).select($"vec_id", $"embedding".cast("array<float>").as("embedding"), $"label")
    val q = d.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(d, q, k = 4)
      .orderBy("qid", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // candFactor·k must cover a full 20-member cluster: same-cluster codes
    // coincide, so ADC scores TIE and the candidate cut among ties is by
    // cid — a margin below the tie-group size can drop a true neighbor
    val pq = Similarity.pqTopK(d, q, k = 4, m = 4, kCent = 8, candFactor = 5)
      .orderBy("qid", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pq.toSeq === exact.toSeq)
  }

  test("ivfPqTopK (IVFADC) equals brute force on a clustered corpus") {
    // same 3-cluster regime as the pqTopK test: coarse lists align with
    // clusters, residual codes carry the within-cluster signal
    val rnd = new scala.util.Random(11)
    val centers = Seq(
      Array.tabulate(16)(i => if (i < 5) 1.0 else 0.0),
      Array.tabulate(16)(i => if (i >= 5 && i < 10) 1.0 else 0.0),
      Array.tabulate(16)(i => if (i >= 10) 1.0 else 0.0))
    val d = embs((0L until 60L).map { i =>
      val c = centers((i % 3).toInt)
      (i, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq, (i % 3).toInt)
    }: _*).select($"vec_id", $"embedding".cast("array<float>").as("embedding"), $"label")
    val q = d.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(d, q, k = 4)
      .orderBy("qid", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // probing every list + a cluster-sized candidate margin makes the
    // composition exhaustive: parity must be exact, not approximate
    val got = Similarity.ivfPqTopK(d, q, k = 4, nLists = 6, nprobe = 6,
        m = 4, kCent = 8, candFactor = 5)
      .orderBy("qid", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq === exact.toSeq)
    // and the residual advantage is real: with ONE probed list per query
    // the candidates stay within the query's own cluster — top-4 of a
    // 20-member cluster is still the exact top-4 (neighbors ARE in-cluster)
    val oneProbe = Similarity.ivfPqTopK(d, q, k = 4, nLists = 3, nprobe = 1,
        m = 4, kCent = 8, candFactor = 5)
      .orderBy("qid", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(oneProbe.toSeq === exact.toSeq)
  }

  test("pqEncode is deterministic under repartition and codes stay in range") {
    val rnd = new scala.util.Random(9)
    val d = embs((0L until 40L).map { i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat), 0)
    }: _*).select($"vec_id", $"embedding".cast("array<float>").as("embedding"), $"label")
    val books = Similarity.pqCodebooks(d, m = 4, k = 8)
    val once = Similarity.pqEncode(d, books)
      .orderBy("cid").collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq))
    val again = Similarity.pqEncode(d.repartition(7), books)
      .orderBy("cid").collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq))
    assert(once.toSeq === again.toSeq)
    assert(once.forall(_._2.forall(c => c >= 0 && c < 8)))
    assert(once.forall(_._2.size === 4))
  }

  test("powerIteration recovers a planted dominant direction") {
    // 64-dim corpus dominated by ±e3 (power iteration is sign-blind to
    // the DATA's sign — the planted axis dominates ΣxxT either way),
    // plus small noise on other dims
    val rnd = new scala.util.Random(13)
    val rows = (0L until 50L).map { i =>
      val v = Array.fill(64)(rnd.nextGaussian().toFloat * 0.05f)
      v(3) = (if (i % 2 == 0) 1f else -1f) * (2f + rnd.nextInt(10) / 10f)
      (i, v.toSeq)
    }
    val out = Similarity.powerIteration(rows.toDF("vec_id", "embedding"), iters = 5)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out.size === 64)
    assert(math.abs(math.abs(out(3)) - 1.0) < 0.05, s"dominant loading: ${out(3)}")
    (0 until 64).filter(_ != 3).foreach { d =>
      assert(math.abs(out(d)) < 0.3, s"dim $d loading ${out(d)}")
    }
    // unit norm
    val n2 = out.values.map(x => x * x).sum
    assert(math.abs(n2 - 1.0) < 1e-6, s"norm^2 $n2")
  }

  test("standardize: hand-checked dims — zero-mean unit-variance, sd=0 dim → 0") {
    // dim 0: values 1,3 → mean 2, sd 1 → z = ∓1; dim 1: constant → z = 0
    val d = embs((1L, Seq(1f, 7f), 0), (2L, Seq(3f, 7f), 0))
    val out = Similarity.standardize(d)
      .orderBy("vec_id", "dim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 0, -1.0), (1L, 1, 0.0), (2L, 0, 1.0), (2L, 1, 0.0)))
  }

  test("knnGraph: mutual edges only, a<b once, scores symmetric") {
    val rnd = new scala.util.Random(11)
    val d = embs((0L until 40L).map { i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat), 0)
    }: _*).select($"vec_id", $"embedding".cast("array<float>").as("embedding"), $"label")
    val got = Similarity.knnGraph(d, k = 3, bands = 96, bitsPerBand = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force mutual 3-NN
    val vecs = d.select($"vec_id", $"embedding".cast("array<double>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val knn = vecs.keys.map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .sortBy(c => (-cos(vecs(q), vecs(c)), c)).take(3).toSet
    }.toMap
    val exp = (for {
      a <- vecs.keys; b <- knn(a) if a < b && knn(b).contains(a)
    } yield (a, b)).toSet
    assert(got === exp)
    // every emitted edge is ordered and unique
    assert(got.forall { case (a, b) => a < b })
  }

  test("bandPairBound prices the banded self-join exactly; budgetBits honors the budget") {
    val rnd = new scala.util.Random(31)
    val d = embs((0L until 60L).map { i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat), 0)
    }: _*).select($"vec_id", $"embedding".cast("array<float>").as("embedding"), $"label")
    val cb = Similarity.lshBands(d, bands = 8, bitsPerBand = 2, seed = 7)
    // ground truth: count the actual (unordered) join rows per bucket
    val actual = cb.as[(Long, Int, Int)].collect()
      .groupBy(t => (t._2, t._3)).values.map { g =>
        g.length.toLong * (g.length - 1) / 2
      }.sum
    assert(Similarity.bandPairBound(cb) === actual)
    // the valve walks until the measured bound fits the budget
    val (bits, bound) = Similarity.budgetBits(d, bands = 8, seed = 7,
      budget = actual / 4, startBits = 2)
    assert(bits > 2 && bound <= actual / 4 || bits == 30)
    // and a generous budget stays at the starting width
    val (b2, _) = Similarity.budgetBits(d, bands = 8, seed = 7,
      budget = actual + 1, startBits = 2)
    assert(b2 === 2)
  }

  test("knnGraph under a pair budget keeps exact recall on a clustered corpus") {
    // clusters separated in cosine: the metric gap that makes banded kNN
    // recall survive width — the valve must not break it while cutting
    // the candidate mass
    val rnd = new scala.util.Random(13)
    val centers = Seq.fill(5)(Array.fill(16)(rnd.nextGaussian()))
    val d = embs((0L until 50L).map { i =>
      val c = centers((i % 5).toInt)
      (i, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq, 0)
    }: _*).select($"vec_id", $"embedding".cast("array<float>").as("embedding"), $"label")
    val free = Similarity.knnGraph(d, k = 3, bands = 96, bitsPerBand = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val valved = Similarity.knnGraph(d, k = 3, bands = 96, bitsPerBand = Some(2),
      pairBudget = Some(5000L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(valved === free)
  }

  test("hardNegatives: banded == exact on a clustered corpus; labels always differ") {
    val rnd = new scala.util.Random(13)
    val centers = Seq(
      Array.tabulate(16)(i => if (i < 8) 1.0 else 0.0),
      Array.tabulate(16)(i => if (i >= 8) 1.0 else 0.0))
    val d = embs((0L until 40L).map { i =>
      val c = centers((i % 2).toInt)
      (i, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq, (i % 2).toInt)
    }: _*).select($"vec_id", $"embedding".cast("array<float>").as("embedding"), $"label")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("qid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val exact = rows(Similarity.hardNegatives(d, k = 3, exact = true))
    val banded = rows(Similarity.hardNegatives(d, k = 3, bitsPerBand = Some(3)))
    assert(exact.size === 40 * 3)
    assert(banded === exact)
    // no same-label row can ever appear
    val lbl = (0L until 40L).map(i => i -> (i % 2).toInt).toMap
    assert(exact.forall { case (q, c, _) => lbl(q) != lbl(c) })
  }

  test("bitextMargin: hub suppressed, forward argmax honors the margin not raw cosine") {
    // side A anchor x0 has raw-cosine argmax = the HUB (close to
    // everything on side B); the margin denominator (the hub's dense
    // neighborhood) demotes it below the genuine partner
    def v(parts: Double*): Seq[Float] = parts.map(_.toFloat)
    val a = embs(
      (0L, v(1.0, 0.05, 0.0, 0.0), 0),   // x0: true partner y10
      (1L, v(0.0, 0.0, 1.0, 0.08), 0))   // x1: true partner y12
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val b = embs(
      (10L, v(1.0, 0.0, 0.0, 0.0), 1),   // y10: aligned with x0
      (11L, v(0.55, 0.5, 0.55, 0.5), 1), // y11: the hub — mid-distance to all
      (12L, v(0.0, 0.0, 1.0, 0.0), 1),   // y12: aligned with x1
      (13L, v(0.0, 1.0, 0.0, 0.05), 1))
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val got = Similarity.bitextMargin(a, b, k = 2, threshold = 0.0, exact = true)
      .orderBy("src_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(p => (p._1, p._2)).toSeq === Seq((0L, 10L), (1L, 12L)))
    assert(got.forall(_._3 > 1.0), "true pairs stand above their neighborhoods")
  }

  test("bitextMargin: banded == exact on a clustered bilingual corpus") {
    val rnd = new scala.util.Random(29)
    val centers = Seq(
      Array.tabulate(16)(i => if (i < 8) 1.0 else 0.0),
      Array.tabulate(16)(i => if (i >= 8) 1.0 else 0.0))
    def side(off: Long, n: Int) = embs((0 until n).map { i =>
      val c = centers(i % 2)
      (off + i, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq, i % 2)
    }: _*).select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val a = side(0L, 20); val b = side(100L, 24)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("src_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val exact = rows(Similarity.bitextMargin(a, b, k = 3, threshold = 0.9, exact = true))
    val banded = rows(Similarity.bitextMargin(a, b, k = 3, threshold = 0.9,
      bitsPerBand = Some(3)))
    assert(exact.nonEmpty)
    assert(banded === exact)
  }
}
