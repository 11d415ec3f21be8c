package graft

import java.nio.file.Files

import graft.operators.Ticks
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Crash-recovery semantics of the CDC relay (reference: the poll loop's
  * `last_time` cursor survives restarts): a second run against the SAME
  * checkpoint must resume from the committed source offsets — reprocessing
  * nothing, losing nothing — and the first-write-wins sink must converge to
  * exactly the batch dedup of all data ever staged. */
class RelayRestartSpec extends SparkSpec {
  import spark.implicits._

  private def ticksDf(rows: Seq[(String, String, Double, Long)]) =
    rows.map { case (p, t, b, q) => (p, ts(t), b, b + 0.01, q) }
      .toDF("pair", "time", "bid", "ask", "seq")

  test("relay resumes from checkpoint offsets and converges to batch dedup") {
    val root = Files.createTempDirectory("graft-restart-").toString
    val (src, sink, ckpt) = (s"$root/src", s"$root/sink", s"$root/ckpt")
    new java.io.File(src).mkdirs()

    // chunk 1: includes an intra-chunk duplicate second (X@:00, seq 1 wins)
    val c1 = ticksDf(Seq(
      ("X", "2024-01-01 00:00:00.2", 101.0, 2L),
      ("X", "2024-01-01 00:00:00.1", 100.0, 1L),
      ("X", "2024-01-01 00:00:01.0", 102.0, 3L),
      ("Y", "2024-01-01 00:00:00.5", 50.0, 4L)))
    // chunk 2: a (pair, second) group whose (time, seq)-minimum lives here
    // while a later arrival of the same second comes in chunk 3
    val c2 = ticksDf(Seq(
      ("X", "2024-01-01 00:00:02.3", 103.0, 5L),
      ("Y", "2024-01-01 00:00:02.1", 51.0, 6L)))
    val c3 = ticksDf(Seq(
      ("Y", "2024-01-01 00:00:02.9", 52.0, 7L), // loses to seq 6 via sink merge
      ("X", "2024-01-01 00:00:03.0", 104.0, 8L)))

    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = s"$root/tmp-$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.startsWith("part-")).get
      val dst = new java.io.File(src, s"$name.parquet")
      Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    def run(): Unit = {
      val schema = spark.read.parquet(src).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      Streams.relayToParquet(stream, sink, ckpt,
        keys = Seq("pair", "time"), perBatch = Ticks.dedupSecond)
        .awaitTermination()
    }

    stage(c1, "c1", 1600000000000L)
    run() // first run: only chunk 1 exists, then the process "dies"

    val afterFirst = spark.read.parquet(sink).count()
    assert(afterFirst === 3) // X@:00 (seq 1), X@:01, Y@:00

    stage(c2, "c2", 1600000060000L)
    stage(c3, "c3", 1600000120000L)
    run() // restart: same checkpoint — resumes at the committed offset

    val all = c1.unionByName(c2).unionByName(c3)
    val expected = Ticks.dedupSecond(all)
      .select(col("pair"), col("time"), col("bid"), col("ask"))
      .orderBy("pair", "time").collect().toSeq
    val got = spark.read.parquet(sink)
      .select(col("pair"), col("time"), col("bid"), col("ask"))
      .orderBy("pair", "time").collect().toSeq
    assert(got === expected)

    run() // third run: nothing new — sink must be byte-identical
    val again = spark.read.parquet(sink)
      .select(col("pair"), col("time"), col("bid"), col("ask"))
      .orderBy("pair", "time").collect().toSeq
    assert(again === expected)
  }

  test("ingest guard resumes from checkpoint and converges to the batch clean()") {
    // the T25 crash contract: kill between chunks, restart on the same
    // checkpoint + stores, converge to CorpusPrep.clean of everything
    // ever staged (redelivered docs self-reject against the seen ledger)
    val root = Files.createTempDirectory("graft-ingest-restart-").toString
    val (src, seen, acc, ckpt) = (s"$root/src", s"$root/seen", s"$root/acc", s"$root/ckpt")
    new java.io.File(src).mkdirs()

    val base = (0 until 56).map(i => f"w$i%02d")
    val novel2 = (0 until 56).map(i => f"x$i%02d")
    val novel3 = (0 until 56).map(i => f"y$i%02d")
    val novel4 = (0 until 56).map(i => f"z$i%02d")
    def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "), "en", "s")
    val c1 = Seq(
      doc(1L, base),
      doc(2L, base),            // within-chunk exact dup → rejected
      doc(3L, novel2)).toDF("doc_id", "text", "lang", "source")
    val c2 = Seq(
      doc(4L, base.updated(10, "aa").updated(30, "bb")), // near-dup of 1 → rejected
      doc(5L, novel3)).toDF("doc_id", "text", "lang", "source")
    val c3 = Seq(
      doc(6L, novel3.updated(20, "cc").updated(40, "dd")), // near-dup of 5 → rejected
      doc(7L, novel4),
      doc(8L, Seq("ab")),       // 1 token: quality < 0.2 → rejected
      doc(1L, base)).toDF("doc_id", "text", "lang", "source") // redelivery of 1

    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = s"$root/tmp-$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.startsWith("part-")).get
      val dst = new java.io.File(src, s"$name.parquet")
      Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    def run(): Unit = {
      val schema = spark.read.parquet(src).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      Streams.ingestToParquet(stream, seen, acc, ckpt).awaitTermination()
    }

    stage(c1, "c1", 1600000000000L)
    stage(c2, "c2", 1600000060000L)
    run() // process chunks 1-2, then the process "dies"
    assert(spark.read.parquet(acc).select("doc_id").as[Long].collect().toSet
      === Set(1L, 3L, 5L))

    stage(c3, "c3", 1600000120000L)
    run() // restart: same checkpoint and stores

    val got = spark.read.parquet(acc).select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 3L, 5L, 7L))
    // semantics equality: the streaming accept set == one-shot batch clean
    // of everything ever staged (minus the redelivered copy)
    val all = c1.unionByName(c2).unionByName(c3.filter($"doc_id" =!= 1L))
    val oneShot = graft.operators.CorpusPrep.clean(all)
      .select("doc_id").as[Long].collect().toSet
    assert(got === oneShot)

    run() // nothing new — accept set must not change
    assert(spark.read.parquet(acc).count() === 4)
  }
}
