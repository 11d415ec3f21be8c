package graft

/** Tripwires on the scale-probe corpus generator and the linearity claims it
  * measures (BASELINE.md "scale probe" section):
  *
  *  - the replica construction must be contamination-free — token-prefix
  *    bijection for text (zero cross-replica shingle overlap, within-replica
  *    dup structure preserved exactly) and hash-sign flips for embeddings
  *    (within-replica cosine exact, same-vector cross-replica images must
  *    NOT look like near-dups — the modular-pattern bug this replaces
  *    produced cos ≈ 0.64 between a vector and its own replica);
  *  - under that construction the inverted-index join-row count and the
  *    LSH candidate count must scale EXACTLY linearly in the factor (the
  *    empirical backbone of the 100 TB banded-growth claim).
  */
class ScaleProbeSpec extends SparkSpec {

  private val base = "/root/testdata/sf0.001"

  test("replica generation scales candidate-stage counts exactly linearly") {
    val out = java.nio.file.Files.createTempDirectory("scaleprobe").toString
    ScaleProbe.generate(spark, base, out, factor = 3)
    val c1 = ScaleProbe.candidates(spark, base)
    val c3 = ScaleProbe.candidates(spark, out)
    // shingle dfs are preserved per replica (token bijection) and replicas
    // are shingle-disjoint (prefix), so Σ df·(df−1)/2 must triple exactly
    assert(c3("ngram_joinrows") === 3 * c1("ngram_joinrows"))
    assert(c3("ngram_capped_joinrows") === 3 * c1("ngram_capped_joinrows"))
    // this corpus's minhash pairs are exact-dup groups (J = 1 ⇒ identical
    // signatures under any renaming ⇒ band collisions deterministic)
    assert(c3("minhash_cands") === 3 * c1("minhash_cands"))
  }

  test("same-vector cross-replica embeddings do not masquerade as near-dups") {
    val out = java.nio.file.Files.createTempDirectory("scaleprobe_e").toString
    ScaleProbe.generate(spark, base, out, factor = 3)
    val rows = spark.read.parquet(s"$out/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id") % 1000000L < 20)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Float]]("embedding").toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / math.sqrt(na * nb)
    }
    val byBase = rows.groupBy(_._1 % 1000000L).values
    val worst = byBase.flatMap { g =>
      for (Seq((i1, v1), (i2, v2)) <- g.sortBy(_._1).toSeq.combinations(2)
           if i1 / 1000000L != i2 / 1000000L) yield cos(v1, v2)
    }.maxOption.getOrElse(0.0)
    assert(math.abs(worst) < 0.45,
      s"cross-replica image of the same vector reads as a near-dup (cos=$worst)")
  }
}
