package graft

import graft.operators.CorpusPrep
import org.apache.spark.sql.functions._

class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(17)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta")
  private val docs = (1L to 400L).map { i =>
    (i, Seq.fill(20)(vocab(rnd.nextInt(vocab.size))).mkString(" "),
      if (i % 3 == 0) "de" else "en")
  }.toDF("doc_id", "text", "lang")

  test("assignSplit is a pure function of content: stable and disjoint") {
    val a = CorpusPrep.assignSplit(docs).select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val b = CorpusPrep.assignSplit(docs.orderBy(rand(7))).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split"))).toMap
    assert(a === b) // row order must not matter
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 400.0).toMap
    assert(math.abs(frac("train") - 0.9) < 0.06)
    assert(frac.keySet === Set("train", "val", "test"))
  }

  test("sampleStrata keeps ~rate per stratum, deterministically") {
    val s1 = CorpusPrep.sampleStrata(docs, "lang", Map("en" -> 0.5, "de" -> 0.1))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val s2 = CorpusPrep.sampleStrata(docs, "lang", Map("en" -> 0.5, "de" -> 0.1))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(s1 === s2)
    val byLang = CorpusPrep.sampleStrata(docs, "lang", Map("en" -> 0.5, "de" -> 0.1))
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val enTotal = docs.filter($"lang" === "en").count().toDouble
    assert(math.abs(byLang.getOrElse("en", 0L) / enTotal - 0.5) < 0.12)
    // a rate-0 stratum (unlisted) keeps nothing
    assert(CorpusPrep.sampleStrata(docs, "lang", Map("en" -> 0.5))
      .filter($"lang" === "de").count() === 0)
  }

  test("clean keeps canonical, non-near-dup, quality docs") {
    val withDup = docs.unionByName(
      Seq((9001L, docs.filter($"doc_id" === 1L).head.getString(1), "en"))
        .toDF("doc_id", "text", "lang"))
      .withColumn("source", lit("s"))
    val kept = CorpusPrep.clean(withDup, nearDupThreshold = 0.9, minQuality = 0.0)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(9001L)) // exact dup loses
  }
}
