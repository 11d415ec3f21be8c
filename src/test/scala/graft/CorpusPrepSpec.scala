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

  test("release report balances: splits + removed account for every raw doc") {
    // force all three removal classes: an exact dup, and junk below the
    // quality floor (one whitespace-heavy word repeated = max stopword-
    // free shortness penalty)
    val d = docs.unionByName(Seq(
        (9001L, docs.filter($"doc_id" === 1L).head.getString(1), "en"),
        (9002L, "the the the", "en"))
        .toDF("doc_id", "text", "lang"))
      .withColumn("source", lit("s"))
    val cleaned = CorpusPrep.clean(d, nearDupThreshold = 0.8, minQuality = 0.2)
    val stats = CorpusPrep.splitStats(CorpusPrep.assignSplit(cleaned))
      .select($"split", $"n_docs", $"total_tokens")
    val removedN = d.count() - cleaned.count()
    assert(removedN > 0, "fixture must drop something or the test is vacuous")
    val splitN = stats.agg(sum($"n_docs")).head().getLong(0)
    assert(splitN + removedN === d.count(),
      s"release accounting must balance: $splitN kept + $removedN removed")
    // token mass balances too: kept tokens == stats total
    val keptTokens = graft.operators.TextAnalysis.stats(cleaned)
      .agg(sum($"n_tokens")).head().getLong(0)
    assert(stats.agg(sum($"total_tokens")).head().getLong(0) === keptTokens)
  }

  test("cleanClustered collapses hub-connected transitive near-dups that clean keeps") {
    // hub topology: docs 1 and 2 are each ≥0.8-similar to hub 3 but <0.8
    // to each other — pair-loser removal drops only the hub; cluster-exact
    // removal keeps just the cluster minimum
    // 56 tokens, 54 shingles; two-token interior edits touch 4 shingles
    // each: J(1,3)=J(2,3)=50/58≈0.862 ≥ 0.8, J(1,2)=46/62≈0.742 < 0.8
    val base = (0 until 56).map(i => f"w$i%02d")
    val d3 = base.mkString(" ")
    val d1 = base.updated(52, "z0").updated(53, "z1").mkString(" ")
    val d2 = base.updated(2, "x0").updated(3, "x1").mkString(" ")
    val hub = Seq((1L, d1, "en"), (2L, d2, "en"), (3L, d3, "en"))
      .toDF("doc_id", "text", "lang")
    val pairs = graft.operators.Dedup.nearDupMinhash(hub, threshold = 0.8)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 3L), (2L, 3L))) // hub edges only, no (1,2)
    val pairKept = CorpusPrep.clean(hub, minQuality = 0.0)
      .select("doc_id").as[Long].collect().toSet
    val ccKept = CorpusPrep.cleanClustered(hub, minQuality = 0.0)
      .select("doc_id").as[Long].collect().toSet
    assert(pairKept === Set(1L, 2L)) // transitive dup 2 survives pair policy
    assert(ccKept === Set(1L))       // cluster-exact keeps only the minimum
  }

  test("sourceQuota caps each group deterministically, heap-agg not window-sort") {
    val docs = (1L to 30L).map(i => (i, s"doc body ${i * 37}", if (i <= 25) "big" else "small"))
      .toDF("doc_id", "text", "source")
    val got = CorpusPrep.sourceQuota(docs, maxPerGroup = 8)
    val bySrc = got.collect().groupBy(_.getAs[String]("source"))
    assert(bySrc("big").length === 8)   // capped
    assert(bySrc("small").length === 5) // under quota, all kept
    assert(bySrc("big").map(_.getAs[Int]("rk")).sorted.toSeq === (1 to 8))
    // deterministic: a second run picks identical survivors
    assert(got.collect().map(_.getAs[Long]("doc_id")).sorted.toSeq ===
      CorpusPrep.sourceQuota(docs, maxPerGroup = 8)
        .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq)
    // skew-safety tripwire: selection is the bounded top-k AGGREGATE
    // (partial heaps, map-side merge), never a per-group Window sort of
    // the full corpus on one task
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("top_k_by_score"), s"top-k aggregate missing:\n$plan")
    assert(!plan.contains("Window"), s"per-group window sort crept in:\n$plan")
  }

  test("scrubPii replaces emails, IPs, and phone runs with typed tokens") {
    val docs = Seq(
      (1L, "mail me at a.b+c@ex-ample.org today"),
      (2L, "server 192.168.001.4 is up, call +81 90-1234-5678 now"),
      (3L, "no pii here at all"),
      (4L, "bare digits 123456789012 also scrub")).toDF("doc_id", "text")
    val got = CorpusPrep.scrubPii(docs).orderBy("doc_id")
      .collect().map(_.getAs[String]("text"))
    assert(got(0) === "mail me at <EMAIL> today")
    assert(got(1) === "server <IP> is up, call <PHONE> now")
    assert(got(2) === "no pii here at all")
    assert(got(3) === "bare digits <PHONE> also scrub")
  }

  test("chunkWindows: strided windows cover every token, trailing chunk runs short") {
    // 10 tokens, size 4, stride 3 → starts 0,3,6,9
    val doc = Seq((7L, (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = CorpusPrep.chunkWindows(doc, chunkSize = 4, stride = 3)
      .orderBy("chunk_no").collect()
      .map(r => (r.getAs[Int]("chunk_no"), r.getAs[Int]("start_tok"),
        r.getAs[Int]("n_tokens"), r.getAs[String]("chunk_text")))
    assert(got.toSeq === Seq(
      (0, 0, 4, "t0 t1 t2 t3"),
      (1, 3, 4, "t3 t4 t5 t6"),
      (2, 6, 4, "t6 t7 t8 t9"),
      (3, 9, 1, "t9")))
    // overlap = size - stride tokens between consecutive chunks
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._4.split(" ").takeRight(1).head === b._4.split(" ").head ||
        a._3 < 4) // last short chunk exempt
    }
  }

  test("incrementalIngest: corpus wins, batch first-write-wins, corpus pairs never generated") {
    // 56-token docs (see cleanClustered's shingle math): a two-token edit
    // keeps J ≈ 0.86 ≥ 0.8; a fresh vocabulary is J = 0
    val base = (0 until 56).map(i => f"w$i%02d")
    val exact = base.mkString(" ")
    val near = base.updated(10, "xx").updated(30, "yy").mkString(" ")
    val novel = (0 until 56).map(i => f"v$i%02d").mkString(" ")
    val nearNovel = (0 until 56).map(i => f"v$i%02d")
      .updated(20, "zz").updated(40, "qq").mkString(" ")
    val existing = Seq(
      (1L, exact, "en", "s"),
      (2L, exact, "en", "s")) // corpus-internal duplicate — must NOT matter
      .toDF("doc_id", "text", "lang", "source")
    val incoming = Seq(
      (10L, exact, "en", "s"),     // exact dup of corpus → rejected
      (11L, near, "en", "s"),      // near-dup of corpus → rejected
      (12L, novel, "en", "s"),     // novel → accepted
      (13L, nearNovel, "en", "s"), // near-dup of lower-id batch doc → rejected
      (14L, "ab", "en", "s"))      // 1 token: quality 0.02 < 0.2 → rejected
      .toDF("doc_id", "text", "lang", "source")
    val accepted = CorpusPrep.incrementalIngest(existing, incoming)
      .select("doc_id").as[Long].collect().toSet
    assert(accepted === Set(12L))
    // the scale contract: no corpus×corpus candidate pair, even though docs
    // 1 and 2 are identical (they share every band bucket)
    val sigs = graft.operators.Dedup.minhashSignatures(
      graft.operators.Dedup.shingleSets(existing, 3), 128)
    val sigsNew = graft.operators.Dedup.minhashSignatures(
      graft.operators.Dedup.shingleSets(incoming, 3), 128)
    val cands = graft.operators.Dedup.crossCandidates(sigs, sigsNew, 16, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!cands.contains((1L, 2L)),
      "corpus-internal pair materialized — breaks the incremental cost bound")
    assert(cands.exists { case (i, j) => i <= 2 && j >= 10 },
      "no corpus-batch candidate at all — banding broken")
  }

  test("corpusShuffle: bucketed rank == global hash order, shards balanced, order-invariant") {
    val out = CorpusPrep.corpusShuffle(docs, nShards = 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"),
        r.getAs[Int]("shard"), r.getAs[Long]("pos")))
    // ranks are exactly the permutation 0..n-1
    assert(out.map(_._2).sorted.toSeq === (0L until 400L))
    // the two-phase bucketed rank composes to the TRUE global hash order
    val direct = docs.select(col("doc_id"),
        md5(concat(lit("42"), col("doc_id").cast("string")).cast("binary")).as("h"))
      .orderBy(col("h"), col("doc_id")).collect().map(_.getLong(0))
    assert(out.sortBy(_._2).map(_._1).toSeq === direct.toSeq)
    // round-robin shards balance to +-1 and pos is the in-shard index
    val byShard = out.groupBy(_._3)
    assert(byShard.keySet === (0 until 8).toSet)
    assert(byShard.values.map(_.size).max - byShard.values.map(_.size).min <= 1)
    byShard.values.foreach { s =>
      assert(s.sortBy(_._2).map(_._4).toSeq === (0L until s.size.toLong))
    }
    // seeded hash = pure function of doc_id: input row order cannot matter
    val reord = CorpusPrep.corpusShuffle(docs.orderBy(rand(7)).repartition(5), 8)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"))).toMap
    assert(out.map(t => (t._1, t._2)).toMap === reord)
    // a different seed is a different permutation (the shuffle actually mixes)
    val other = CorpusPrep.corpusShuffle(docs, 8, seed = 43L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"))).toMap
    assert(other !== out.map(t => (t._1, t._2)).toMap)
  }

  test("corpusDiff: all four statuses; changed docs attribute to v2's source") {
    import spark.implicits._
    val v1 = Seq(
      (1L, "stays the same", "srcA"),
      (2L, "will change", "srcA"),
      (3L, "will be removed", "srcB"),
      (4L, "also unchanged", "srcB")).toDF("doc_id", "text", "source")
    val v2 = Seq(
      (1L, "stays the same", "srcA"),
      (2L, "has changed", "srcC"),      // content AND source moved
      (4L, "also unchanged", "srcB"),
      (5L, "brand new doc", "srcC")).toDF("doc_id", "text", "source")
    val got = CorpusPrep.corpusDiff(v1, v2).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      ("srcA", 0L, 0L, 0L, 1L),   // doc 1 unchanged
      ("srcB", 0L, 1L, 0L, 1L),   // doc 3 removed (v1 source), doc 4 unchanged
      ("srcC", 1L, 0L, 1L, 0L)))  // doc 5 added, doc 2 changed → v2's source
  }
}
