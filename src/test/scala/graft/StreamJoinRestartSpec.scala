package graft

import java.nio.file.Files

import graft.streaming.Streams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Crash-recovery for the stream-stream JOIN family (t7/t10) — the one
  * stateful-streaming group without a kill-and-restart proof until round 9.
  * The outer join is the interesting case: a "no partner arrived"
  * verdict is only correct if the restart restores BOTH sides' buffered
  * window state AND the combined watermark from the checkpoint — lose
  * either and the null-extended row is emitted twice, early, or never.
  * The kill point lands after the left-only window's rows are buffered
  * but BEFORE the watermark certifies the absence of a partner, so the
  * verdict itself must be computed across the restart boundary.
  */
class StreamJoinRestartSpec extends SparkSpec {
  import spark.implicits._

  private def stage(df: DataFrame, root: String, src: String,
                    name: String, mtime: Long): Unit = {
    val tmp = s"$root/tmp-$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.startsWith("part-")).get
    val dst = new java.io.File(src, s"$name.parquet")
    if (!dst.exists()) { // restarts re-stage the already-consumed prefix
      Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
  }

  private def side(rows: Seq[(String, Double)]): DataFrame =
    rows.map { case (t, b) => (ts(t), b) }.toDF("time", "bid")

  // window 00:00 — matched on both sides (inner row)
  // window 00:01 — LEFT ONLY (the null-extension under test)
  // window 00:03 — both sides again; its rows also advance the combined
  //                watermark past 00:01's end so the null verdict finalizes
  private val leftChunks = Seq(
    side(Seq(("2024-01-01 00:00:10", 1.0), ("2024-01-01 00:01:10", 2.0))),
    side(Seq(("2024-01-01 00:03:30", 3.0))))
  private val rightChunks = Seq(
    side(Seq(("2024-01-01 00:00:20", 9.0))),
    side(Seq(("2024-01-01 00:03:40", 8.0))))

  private def runJoin(root: String, tag: String, upTo: Int): Unit = {
    val (lSrc, rSrc) = (s"$root/$tag-l", s"$root/$tag-r")
    new java.io.File(lSrc).mkdirs(); new java.io.File(rSrc).mkdirs()
    leftChunks.take(upTo).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, lSrc, s"l$i", 1600000000000L + i * 60000L) }
    rightChunks.take(upTo).zipWithIndex.foreach { case (c, i) =>
      stage(c, root, rSrc, s"r$i", 1600000000000L + i * 60000L) }
    val schema = spark.read.parquet(lSrc).schema
    def stream(src: String) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    Streams.windowJoinOuter(stream(lSrc), stream(rSrc))
      .writeStream.format("parquet")
      .option("path", s"$root/$tag-sink")
      .option("checkpointLocation", s"$root/$tag-ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
  }

  private def rows(sink: String) =
    spark.read.parquet(sink).select("time", "l_bid", "r_bid")
      .collect().map(_.toString).sorted.toSeq

  test("t10: outer-join null verdicts survive a mid-stream kill and restart") {
    val root = Files.createTempDirectory("graft-t10-restart-").toString

    // uninterrupted reference: both chunks available up front
    runJoin(root, "ref", upTo = 2)

    // interrupted: chunk 0 only (left-only window buffered, watermark
    // behind it), process "dies", chunk 1 lands, restart from the SAME
    // checkpoint
    runJoin(root, "cut", upTo = 1)
    runJoin(root, "cut", upTo = 2)

    val (a, b) = (rows(s"$root/ref-sink"), rows(s"$root/cut-sink"))
    assert(a.nonEmpty, "reference run emitted nothing")
    // the null-extended 00:01 row must exist exactly once in both runs
    assert(a.count(_.contains("null")) === 1,
      s"expected exactly one null-extended row, got:\n${a.mkString("\n")}")
    assert(b === a,
      s"restart diverged:\nref=${a.mkString("\n")}\ncut=${b.mkString("\n")}")
  }

  test("t7: inner join emits identical matches across a restart") {
    val root = Files.createTempDirectory("graft-t7-restart-").toString
    def run(tag: String, upTo: Int): Unit = {
      val (lSrc, rSrc) = (s"$root/$tag-l", s"$root/$tag-r")
      new java.io.File(lSrc).mkdirs(); new java.io.File(rSrc).mkdirs()
      leftChunks.take(upTo).zipWithIndex.foreach { case (c, i) =>
        stage(c, root, lSrc, s"l$i", 1600000000000L + i * 60000L) }
      rightChunks.take(upTo).zipWithIndex.foreach { case (c, i) =>
        stage(c, root, rSrc, s"r$i", 1600000000000L + i * 60000L) }
      val schema = spark.read.parquet(lSrc).schema
      def stream(src: String) = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      Streams.windowJoin(stream(lSrc), stream(rSrc))
        .writeStream.format("parquet")
        .option("path", s"$root/$tag-sink")
        .option("checkpointLocation", s"$root/$tag-ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }
    run("ref", 2)
    run("cut", 1); run("cut", 2)
    val (a, b) = (rows(s"$root/ref-sink"), rows(s"$root/cut-sink"))
    assert(a.nonEmpty, "reference run emitted nothing")
    assert(b === a,
      s"restart diverged:\nref=${a.mkString("\n")}\ncut=${b.mkString("\n")}")
  }
}
