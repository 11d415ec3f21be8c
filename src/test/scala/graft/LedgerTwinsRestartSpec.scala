package graft

import java.nio.file.Files

import graft.operators.TextAnalysis
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Crash contracts of the round-12 ledger twins:
  *  - t27 heaps ledger: min-merge absorbs both a kill-and-restart and a
  *    forged replayed append (idempotent algebra, same class as t26);
  *  - t28 length ledger: counters are NOT idempotent — the proof covers
  *    the two distinct guards: batch_id-keyed dedup absorbs a replayed
  *    append, and the seen store screens redelivered DOCS after a
  *    restart. Converged roll-up must equal the one-shot batch op. */
class LedgerTwinsRestartSpec extends SparkSpec {
  import spark.implicits._

  private val c1 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "pack my box with five dozen liquor jugs again"))
  private val c2 = Seq(
    (3L, "the quick brown fox jumps over the lazy dog tonight"),
    (4L, "sphinx of black quartz judge my vow right now ok"))
  // doc 2 re-delivered verbatim alongside a novel doc
  private val c3 = Seq(
    (2L, "pack my box with five dozen liquor jugs again"),
    (5L, "how vexingly quick daft zebras jump in the fog"))

  private def fixture(prefix: String): (String, String) = {
    val root = Files.createTempDirectory(prefix).toString
    new java.io.File(s"$root/src").mkdirs()
    (root, s"$root/src")
  }

  private def stage(root: String, src: String, rows: Seq[(Long, String)],
                    name: String, mtime: Long): Unit = {
    val tmp = s"$root/tmp-$name"
    rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.startsWith("part-")).get
    val dst = new java.io.File(src, s"$name.parquet")
    Files.copy(part.toPath, dst.toPath)
    dst.setLastModified(mtime)
  }

  private def docStream(src: String) = {
    val schema = spark.read.parquet(src).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
  }

  test("t27 heaps ledger survives a kill-and-restart and a replayed append") {
    val (root, src) = fixture("graft-t27-restart-")
    val (ledger, ckpt) = (s"$root/ledger", s"$root/ckpt")
    def run(): Unit =
      Streams.heapsStream(docStream(src), ledger, ckpt).awaitTermination()

    stage(root, src, c1, "c1", 1600000000000L)
    run() // the process "dies" here
    // forge the kill-after-append-before-commit replay
    val replay = spark.read.parquet(ledger)
    replay.write.mode("append").parquet(ledger)

    stage(root, src, c2, "c2", 1600000060000L)
    run() // restart: same checkpoint — only c2 is new work

    val rolled = TextAnalysis.heapsCurveFromFirstOcc(
      spark.read.parquet(ledger)
        .groupBy(col("tok")).agg(min(col("first_doc")).as("first_doc")),
      step = 1L).orderBy("checkpoint").collect().toSeq
    val oneShot = TextAnalysis.heapsCurve(
      (c1 ++ c2).toDF("doc_id", "text"), step = 1L)
      .orderBy("checkpoint").collect().toSeq
    assert(rolled === oneShot)
  }

  test("t30 boilerplate ledger survives a kill-and-restart and a replayed append") {
    val (root, src) = fixture("graft-t30-restart-")
    val (ledger, ckpt) = (s"$root/ledger", s"$root/ckpt")
    def run(): Unit =
      Streams.boilerplateStream(docStream(src), ledger, ckpt, span = 3)
        .awaitTermination()

    stage(root, src, c1, "c1", 1600000000000L)
    run() // the process "dies" here
    // forge the kill-after-append-before-commit replay
    val replay = spark.read.parquet(ledger)
    replay.write.mode("append").parquet(ledger)

    // restart delivers a redelivered doc (2, verbatim) plus novel docs —
    // doc 3 repeats doc 1's text so a segment reaches df >= 2
    stage(root, src, c2 ++ c3, "c2", 1600000060000L)
    run()

    val rolled = graft.operators.Dedup.boilerplateFromSegments(
        spark.read.parquet(ledger), minDf = 2)
      .orderBy("doc_id").collect().toSeq
    val oneShot = graft.operators.Dedup.boilerplateScrub(
        (c1 ++ c2 ++ c3).distinct.toDF("doc_id", "text"), span = 3, minDf = 2)
      .orderBy("doc_id").collect().toSeq
    assert(rolled === oneShot)
    // the scrub must actually bite: docs 1 and 3 share every segment
    val d1 = rolled.find(_.getLong(0) == 1L).get
    assert(d1.getAs[Long]("n_kept") < d1.getAs[Long]("n_spans"))
  }

  test("t32 unigram ledger: frozen-model encode survives kill/restart and replayed append") {
    val (root, src) = fixture("graft-t32-restart-")
    val (ledger, ckpt) = (s"$root/ledger", s"$root/ckpt")
    val all = (c1 ++ c2 ++ c3).distinct
    // frozen model: trained ONCE, an input to the stream — never
    // re-trained per batch (the production tokenizer contract)
    val model = graft.operators.Unigram.train(
      all.toDF("doc_id", "text"), topV = 40, maxPiece = 4, keepV = 10)
      .localCheckpoint(true)
    def run(): Unit =
      Streams.unigramEncodeStream(docStream(src), model, ledger, ckpt,
        maxPiece = 4).awaitTermination()

    stage(root, src, c1, "c1", 1600000000000L)
    run() // the process "dies" here
    // forge the kill-after-append-before-commit replay
    val replay = spark.read.parquet(ledger)
    replay.write.mode("append").parquet(ledger)

    // restart delivers doc 2 REDELIVERED verbatim plus novel docs
    stage(root, src, c2 ++ c3, "c2", 1600000060000L)
    run()

    val rolled = spark.read.parquet(ledger).distinct()
      .orderBy("doc_id").collect().toSeq
    val oneShot = graft.operators.Unigram.encode(
        all.toDF("doc_id", "text"), model, maxPiece = 4)
      .orderBy("doc_id").collect().toSeq
    assert(rolled === oneShot)
    // the segmentation really fired: some word fused into a multi-piece
    assert(rolled.exists(r => r.getLong(2) < r.getLong(1) * 10))
  }

  test("t33 byte-BPE ledger: frozen-rules encode survives kill/restart and replayed append") {
    val (root, src) = fixture("graft-t33-restart-")
    val (ledger, ckpt) = (s"$root/ledger", s"$root/ckpt")
    val all = (c1 ++ c2 ++ c3).distinct
    // frozen rules: trained ONCE, an input to the stream — never
    // re-trained per batch (the production tokenizer contract)
    val rules = TextAnalysis.bpeTrain(
      all.toDF("doc_id", "text"), k = 4, byteLevel = true)._2
    def run(): Unit =
      Streams.bpeBytesEncodeStream(docStream(src), rules, ledger, ckpt)
        .awaitTermination()

    stage(root, src, c1, "c1", 1600000000000L)
    run() // the process "dies" here
    // forge the kill-after-append-before-commit replay
    val replay = spark.read.parquet(ledger)
    replay.write.mode("append").parquet(ledger)

    // restart delivers doc 2 REDELIVERED verbatim plus novel docs
    stage(root, src, c2 ++ c3, "c2", 1600000060000L)
    run()

    val rolled = spark.read.parquet(ledger).distinct()
      .orderBy("doc_id").collect().toSeq
    val oneShot = TextAnalysis.bpeEncodeBytes(
        all.toDF("doc_id", "text"), rules)
      .orderBy("doc_id").collect().toSeq
    assert(rolled === oneShot)
    // the rules really fired: some word fused below one unit per byte
    assert(rolled.exists(r =>
      r.getAs[Long]("n_units") < r.getAs[Long]("n_bytes")))
  }

  test("t31 substr stream: replay self-excludes via batch_id, redelivered doc screened") {
    val (root, src) = fixture("graft-t31-restart-")
    val (seen, grams, out, ckpt) =
      (s"$root/seen", s"$root/grams", s"$root/out", s"$root/ckpt")
    def run(): Unit =
      Streams.substrStream(docStream(src), seen, grams, out, ckpt, minRun = 3)
        .awaitTermination()

    stage(root, src, c1, "c1", 1600000000000L)
    run() // dies here
    // forge the kill-after-appends-before-commit replay: out AND gram
    // rows appended twice (the replayed batch recomputes identical rows
    // because its index view excludes its own batch_id)
    spark.read.parquet(out).write.mode("append").parquet(out)
    spark.read.parquet(grams).write.mode("append").parquet(grams)

    // restart: doc 2 re-delivered verbatim (must be screened — scrubbing
    // it against the now-larger index would over-scrub), docs 3-5 novel;
    // doc 3 repeats doc 1's text so the cross-batch index actually bites
    stage(root, src, c2 ++ c3, "c2", 1600000060000L)
    run()

    val rolled = spark.read.parquet(out).distinct()
      .orderBy("doc_id").collect().toSeq
    val oneShot = graft.operators.Dedup.dedupSubstr(
        (c1 ++ c2 ++ c3).distinct.toDF("doc_id", "text"), minRun = 3)
      .orderBy("doc_id").collect().toSeq
    assert(rolled === oneShot)
    // the cross-batch scrub must actually bite: doc 3 loses its copy of
    // doc 1's passage
    val d3 = rolled.find(_.getLong(0) == 3L).get
    assert(d3.getAs[Long]("n_kept") < d3.getAs[Long]("n_tokens"))
  }

  test("t28 length ledger: batch replay deduped, redelivered doc screened") {
    val (root, src) = fixture("graft-t28-restart-")
    val (seen, ledger, ckpt) = (s"$root/seen", s"$root/ledger", s"$root/ckpt")
    def run(): Unit =
      Streams.lengthStream(docStream(src), seen, ledger, ckpt,
        step = 4, maxLen = 16).awaitTermination()

    stage(root, src, c1, "c1", 1600000000000L)
    run() // dies after committing c1
    // forge the replayed append: same batch_id rows appended twice
    val replay = spark.read.parquet(ledger)
    replay.write.mode("append").parquet(ledger)

    // restart delivers one redelivered doc (2) and one novel doc (5)
    stage(root, src, c3, "c3", 1600000060000L)
    run()

    val rolled = Streams.rollupLengthLedger(spark.read.parquet(ledger))
      .orderBy("bucket").collect().toSeq
    // doc 2 counted ONCE: one-shot over the distinct doc set
    val oneShot = TextAnalysis.lengthBuckets(
      (c1 ++ c3).distinct.toDF("doc_id", "text"), step = 4, maxLen = 16)
      .orderBy("bucket").collect().toSeq
    assert(rolled === oneShot)
    // and the forged duplicate batch really is in the ledger (absorbed,
    // not absent)
    val perBatch = spark.read.parquet(ledger)
      .groupBy("batch_id", "bucket").count()
      .filter(col("count") > 1).count()
    assert(perBatch > 0, "replay forge did not take — proof is vacuous")
  }
}
