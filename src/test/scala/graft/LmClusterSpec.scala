package graft

import graft.operators.{Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Specs for the L39 distributed k-means and the L40 bigram-LM scorer. */
class LmClusterSpec extends SparkSpec {
  import spark.implicits._

  test("kmeansAssign recovers two orthogonal groups; cid order = hash-order init") {
    // md5-hash order of ids 0..5 is [4, 1, 2, 0, 5, 3] → k=2 seeds are id 4
    // (cid 0) and id 1 (cid 1). Group X = {4, 0, 2} near e1, group Y =
    // {1, 3, 5} near e2 — one seed per group, so Lloyd separates them.
    val groupX = Seq(4L, 0L, 2L)
    val groupY = Seq(1L, 3L, 5L)
    val rows =
      groupX.zipWithIndex.map { case (id, i) =>
        (id, Array(1.0f, 0.0f, 0.02f * (i + 1), 0.0f)) } ++
      groupY.zipWithIndex.map { case (id, i) =>
        (id, Array(0.0f, 1.0f, 0.0f, 0.02f * (i + 1))) }
    val embs = rows.toDF("vec_id", "embedding")

    val got = Similarity.kmeansAssign(embs, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.keySet === (groupX ++ groupY).toSet) // total partition
    groupX.foreach(id => assert(got(id) === 0, s"id $id"))
    groupY.foreach(id => assert(got(id) === 1, s"id $id"))

    // determinism under input permutation (hash-order init, no RNG)
    val got2 = Similarity.kmeansAssign(embs.orderBy(rand(5)), k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got2 === got)
  }

  test("kmeansAssign: scores are valid cosines and every doc appears once") {
    val embs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 7 + d * 3) % 11 - 5).toFloat / 5f))
    }.toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssign(embs, k = 4, iters = 2).collect()
    assert(out.length === 40)
    assert(out.map(_.getLong(0)).distinct.length === 40)
    out.foreach { r =>
      assert(r.getInt(1) >= 0 && r.getInt(1) < 4)
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
  }

  test("silhouette: near-orthogonal groups score ~1; counts cover the corpus") {
    // the kmeansAssign fixture: X near e1, Y near e2 → own-centroid cosine
    // ~1, other-centroid cosine ~0 → s = (best−second)/(1−second) ~ 1
    val rows =
      Seq(4L, 0L, 2L).zipWithIndex.map { case (id, i) =>
        (id, Array(1.0f, 0.0f, 0.02f * (i + 1), 0.0f)) } ++
      Seq(1L, 3L, 5L).zipWithIndex.map { case (id, i) =>
        (id, Array(0.0f, 1.0f, 0.0f, 0.02f * (i + 1))) }
    val out = Similarity.silhouette(rows.toDF("vec_id", "embedding"), k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._2).sum === 6L) // every vector counted once
    out.foreach { case (c, n, s) =>
      assert(n === 3L, s"cluster $c size")
      assert(s > 0.95 && s <= 1.0, s"cluster $c mean_sil $s")
    }
  }

  test("semanticDedup: later near-dup dropped within cluster; first-wins; total output") {
    // same two orthogonal groups as above (seeds 4 and 1) plus id 5 an exact
    // copy of id 3's vector: both land in cluster 1, id 5 is later -> dropped.
    // id 2 is a near-copy of id 0 (cos ~ 1) in cluster 0 -> dropped too.
    // within-group non-duplicates differ by a 0.3-weight axis swap
    // (cos ~ 0.917, below the 0.999 threshold); copies are exact (cos = 1)
    val rows = Seq(
      (4L, Array(1.0f, 0.0f, 0.3f, 0.0f)),
      (0L, Array(1.0f, 0.0f, 0.0f, 0.3f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.3f)), // = id 0 -> dropped (0 < 2)
      (1L, Array(0.0f, 1.0f, 0.3f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.3f)),
      (5L, Array(0.0f, 1.0f, 0.0f, 0.3f))) // = id 3 -> dropped (3 < 5)
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(rows, k = 2, iters = 2, threshold = 0.999)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L, 4L, 5L)) // every doc present
    assert(got(2L)._2 === false && got(5L)._2 === false)
    assert(Seq(0L, 1L, 3L, 4L).forall(got(_)._2), s"unexpected drops: $got")
    // the dropped docs' survivors sit in the SAME cluster (cluster-bounded
    // candidate generation is the SemDeDup contract)
    assert(got(2L)._1 === got(0L)._1 && got(5L)._1 === got(3L)._1)
  }

  test("semanticDedup: oversized cluster fails fast instead of pairing quadratically") {
    val rows = (0L until 30L).map(i => (i, Array(1.0f, 0.0f + i * 1e-4f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.semanticDedup(rows, k = 2, iters = 1, threshold = 0.9,
        maxClusterSize = 10L).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("cluster larger"))
  }

  test("clusterSample caps each cluster, ranks 1..m, deterministic under permutation") {
    val embs = (0L until 60L).map { i =>
      // two orthogonal groups of 30
      val v = if (i % 2 == 0) Array(1.0f, 0.0f, (i % 7) * 0.01f)
              else Array(0.0f, 1.0f, (i % 7) * 0.01f)
      (i, v)
    }.toDF("vec_id", "embedding")
    val out = Similarity.clusterSample(embs, k = 2, iters = 2, maxPerCluster = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val byCluster = out.groupBy(_._1)
    assert(byCluster.size === 2)
    byCluster.foreach { case (c, rows) =>
      assert(rows.length === 10, s"cluster $c kept ${rows.length}") // cap bites (30 > 10)
      assert(rows.map(_._2).sorted.toSeq === (1 to 10)) // dense ranks
    }
    val out2 = Similarity.clusterSample(embs.orderBy(rand(13)), 2, 2, 10)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(out2.sorted.toSeq === out.sorted.toSeq)
  }

  test("lmScore: hand-computed bigram means; sub-2-token docs dropped") {
    val docs = Seq(
      (1L, "a b a b"), // pairs (a,b),(b,a),(a,b)
      (2L, "a c"),     // pair  (a,c)
      (3L, "z"))       // no bigram -> not emitted
      .toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // corpus counts: cab(a,b)=2, cab(b,a)=1, cab(a,c)=1; ca(a)=3, ca(b)=1
    // p(a,b)=2/3 -> 0.666667 (rounded), p(b,a)=1, p(a,c)=1/3 -> 0.333333
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L)._1 === 3L)
    assert(math.abs(got(1L)._2 - (0.666667 * 2 + 1.0) / 3) < 1e-12)
    assert(got(2L)._1 === 1L)
    assert(math.abs(got(2L)._2 - 0.333333) < 1e-12)
  }

  test("lmScore is invariant to doc order and partitioning (exact decimal sums)") {
    val docs = (1L to 120L).map { i =>
      (i, Seq.tabulate(12)(j => s"w${(i * 5 + j * 3) % 9}").mkString(" "))
    }.toDF("doc_id", "text")
    val a = TextAnalysis.lmScore(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val b = TextAnalysis.lmScore(docs.repartition(7, col("doc_id")).orderBy(rand(3)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(a === b) // bit-equal, not approximately equal
  }
}
