package graft

import graft.sources.{Compact, Tables}
import org.apache.spark.sql.functions._

class CompactSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("compaction repacks a fragmented sink to ~targetBytes files, rows intact") {
    val li = Tables.lineitem(spark, d)
    val frag = java.nio.file.Files.createTempDirectory("graft-frag-").toString
    li.repartition(64).write.mode("overwrite").parquet(frag) // micro-batch litter

    val fragFiles = new java.io.File(frag).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(fragFiles === 64)

    val dst = java.nio.file.Files.createTempDirectory("graft-compact-").toString
    val target = Compact.dirBytes(spark, frag) / 4
    val outFiles = Compact.compact(spark, frag, dst, target)

    assert(outFiles <= 6, s"expected ~4-5 compacted files, got $outFiles")
    assert(outFiles >= 3, s"over-compacted to $outFiles files")
    // content identical (multiset — the synthetic fixture has duplicate
    // (orderkey, linenumber) pairs, so no column list totally orders rows)
    val a = spark.read.parquet(dst).collect().map(_.toString).sorted
    val b = li.collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("compaction without sortBy plans no shuffle (narrow coalesce repack)") {
    val li = Tables.lineitem(spark, d)
    val frag = java.nio.file.Files.createTempDirectory("graft-frag2-").toString
    li.repartition(16).write.mode("overwrite").parquet(frag)
    val p = spark.read.parquet(frag).coalesce(2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"coalesce repack must not shuffle:\n$p")
  }

  test("sortBy variant re-clusters while compacting") {
    val li = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_partkey"))
    val frag = java.nio.file.Files.createTempDirectory("graft-frag3-").toString
    li.repartition(16).write.mode("overwrite").parquet(frag)
    val dst = java.nio.file.Files.createTempDirectory("graft-compact3-").toString
    Compact.compact(spark, frag, dst, Compact.dirBytes(spark, frag) / 2,
      sortBy = Some("l_partkey"))
    // per-file partkey spans must be disjoint-ish (range-clustered), which
    // a plain coalesce of hash-scattered files can never produce
    val spans = spark.read.parquet(dst).withColumn("_f", input_file_name())
      .groupBy(col("_f"))
      .agg(min(col("l_partkey")).as("mn"), max(col("l_partkey")).as("mx"))
      .orderBy(col("mn")).collect()
    val sorted = spans.sliding(2).forall {
      case Array(a, b) => a.getLong(2) <= b.getLong(1) + 1 || a.getLong(2) <= b.getLong(2)
      case _ => true
    }
    assert(spans.length >= 2 && sorted, "range re-clustering failed")
  }

  // ---- append-only ledger compaction (t26/t27/t28 housekeeping) ----------

  import spark.implicits._

  private def docBatch(ids: Range, src: String) =
    ids.map(i => (i.toLong, s"alpha tok$i beta ${"pad " * (i % 7)}gamma", src))
      .toDF("doc_id", "text", "source")

  private def fragments(dir: String): Int =
    new java.io.File(dir).listFiles().count(_.getName.startsWith("part-"))

  test("ledger compaction: min-partial ledger (t27) — roll-up invariant, crash-tolerant") {
    val ledger = java.nio.file.Files.createTempDirectory("graft-lc27-").toString
    val batches = Seq(docBatch(0 until 10, "a"), docBatch(5 until 20, "a"),
      docBatch(15 until 30, "b"))
    batches.foreach(b => graft.operators.TextAnalysis.firstOccurrence(b)
      .write.mode("append").parquet(ledger))
    def rollup() = spark.read.parquet(ledger)
      .groupBy(col("tok")).agg(min(col("first_doc")).as("first_doc"))
      .orderBy("tok").collect().toSeq
    val before = rollup()
    val merge = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy(col("tok")).agg(min(col("first_doc")).as("first_doc"))
    // grace-cycle GC: call 1 appends the merged fragment and TOMBSTONES
    // the originals (they survive one cycle for concurrent readers — the
    // roll-up absorbs them as duplicates); call 2 reaps them
    val (nb1, na1) = Compact.compactLedger(spark, ledger, merge)
    assert(na1 > nb1, s"originals should survive the grace cycle: $nb1 -> $na1")
    assert(rollup() === before, "compaction changed the roll-up")
    val (_, na2) = Compact.compactLedger(spark, ledger, merge)
    assert(na2 <= 2, s"tombstoned originals not reaped: $na2 fragments")
    assert(rollup() === before, "reap changed the roll-up")
    // crash simulation: merged fragment appended but originals NOT deleted
    // (a kill mid-compactLedger) — the idempotent roll-up must not move
    merge(spark.read.parquet(ledger)).write.mode("append").parquet(ledger)
    assert(rollup() === before, "duplicate merged fragment changed the roll-up")
  }

  test("ledger compaction: KMV sketch ledger (t26) — union algebra absorbs the repack") {
    val ledger = java.nio.file.Files.createTempDirectory("graft-lc26-").toString
    Seq(docBatch(0 until 15, "a").union(docBatch(100 until 110, "b")),
      docBatch(10 until 30, "a").union(docBatch(105 until 125, "b")),
      docBatch(25 until 40, "b"))
      .foreach(b => graft.operators.Sketches.sourceSketch(b, 3, 64)
        .write.mode("append").parquet(ledger))
    def rollup() = graft.operators.Sketches.kmvMatrix(
      graft.operators.Sketches.mergeSketches(spark.read.parquet(ledger), 64), 64)
      .orderBy("src_a", "src_b").collect().toSeq
    val before = rollup()
    val m = (df: org.apache.spark.sql.DataFrame) =>
      graft.operators.Sketches.mergeSketches(df, 64)
    Compact.compactLedger(spark, ledger, m)
    assert(rollup() === before, "compaction changed the sketch roll-up")
    val (_, na2) = Compact.compactLedger(spark, ledger, m)
    assert(na2 <= 2, s"tombstoned originals not reaped: $na2 fragments")
    assert(rollup() === before, "reap changed the sketch roll-up")
  }

  test("ledger compaction: counter ledger (t28) — batch_id preserved, replay still absorbed") {
    val ledger = java.nio.file.Files.createTempDirectory("graft-lc28-").toString
    val batches = Seq(docBatch(0 until 12, "a"), docBatch(12 until 25, "a"),
      docBatch(25 until 40, "b"))
    batches.zipWithIndex.foreach { case (b, i) =>
      graft.operators.TextAnalysis.lengthBuckets(b, 4, 64)
        .select(lit(i.toLong).as("batch_id"), col("bucket"), col("n_docs"),
          col("sum_tokens"))
        .write.mode("append").parquet(ledger)
    }
    // a crash-replayed batch: batch 1's rows appended a second time under
    // the SAME batch_id — the ledger's own at-least-once hazard
    graft.operators.TextAnalysis.lengthBuckets(batches(1), 4, 64)
      .select(lit(1L).as("batch_id"), col("bucket"), col("n_docs"),
        col("sum_tokens"))
      .write.mode("append").parquet(ledger)
    def rollup() = graft.streaming.Streams
      .rollupLengthLedger(spark.read.parquet(ledger))
      .orderBy("bucket").collect().toSeq
    val before = rollup()
    val merge = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy(col("batch_id"), col("bucket"))
        .agg(max(col("n_docs")).as("n_docs"), max(col("sum_tokens")).as("sum_tokens"))
        .select(col("batch_id"), col("bucket"), col("n_docs"), col("sum_tokens"))
    Compact.compactLedger(spark, ledger, merge)
    assert(rollup() === before, "compaction changed the counter roll-up")
    val (_, na2) = Compact.compactLedger(spark, ledger, merge)
    assert(na2 <= 2, s"tombstoned originals not reaped: $na2 fragments")
    assert(rollup() === before, "reap changed the counter roll-up")
    // post-compaction replay of batch 2 (its batch_id survived the repack,
    // so the reader's per-(batch_id, bucket) collapse still screens it)
    graft.operators.TextAnalysis.lengthBuckets(batches(2), 4, 64)
      .select(lit(2L).as("batch_id"), col("bucket"), col("n_docs"),
        col("sum_tokens"))
      .write.mode("append").parquet(ledger)
    assert(rollup() === before, "post-compaction replay double-counted")
  }

  test("lengthStream with compactEvery holds ledger fragments bounded, roll-up exact") {
    val root = java.nio.file.Files.createTempDirectory("graft-lcstream-").toString
    val src = s"$root/src"; new java.io.File(src).mkdirs()
    val all = docBatch(0 until 48, "a")
    // four ascending doc_id chunks, one micro-batch each
    (0 until 4).foreach { i =>
      val tmp = s"$root/tmp-$i"
      all.filter(col("doc_id") >= i * 12 && col("doc_id") < (i + 1) * 12)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.startsWith("part-")).get
      val dst = new java.io.File(src, s"c$i.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(1600000000000L + i * 60000L)
    }
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .select("doc_id", "text")
    graft.streaming.Streams.lengthStream(stream, s"$root/seen", s"$root/ledger",
      s"$root/ckpt", step = 4, maxLen = 64, compactEvery = 2)
      .awaitTermination()
    // roll-up ≡ the one-shot batch report
    val got = graft.streaming.Streams
      .rollupLengthLedger(spark.read.parquet(s"$root/ledger"))
      .orderBy("bucket").collect().toSeq
    val want = graft.operators.TextAnalysis.lengthBuckets(all, 4, 64)
      .orderBy("bucket").collect().toSeq
    assert(got === want, "compacted streaming ledger diverged from batch report")
    // 4 batches compact at 2 and 4; the grace cycle keeps each pass's
    // tombstoned originals alive one more pass, so the bound is
    // O(compactEvery + grace), not per-batch growth
    assert(fragments(s"$root/ledger") <= 6,
      s"ledger not bounded: ${fragments(s"$root/ledger")} fragments")
    // one more offline pass reaps the last tombstones down to the merged set
    val merge = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy(col("batch_id"), col("bucket"))
        .agg(max(col("n_docs")).as("n_docs"), max(col("sum_tokens")).as("sum_tokens"))
        .select(col("batch_id"), col("bucket"), col("n_docs"), col("sum_tokens"))
    Compact.compactLedger(spark, s"$root/ledger", merge)
    Compact.compactLedger(spark, s"$root/ledger", merge)
    assert(fragments(s"$root/ledger") <= 2,
      s"offline reap left ${fragments(s"$root/ledger")} fragments")
    assert(graft.streaming.Streams
      .rollupLengthLedger(spark.read.parquet(s"$root/ledger"))
      .orderBy("bucket").collect().toSeq === want,
      "offline reap changed the roll-up")
  }
}
