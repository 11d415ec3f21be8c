package graft

import java.nio.file.Files

import graft.operators.Sketches
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Crash contract of the t26 append-only sketch ledger: a restart against
  * the same checkpoint resumes from committed offsets, and a REPLAYED batch
  * (the kill-after-append-before-commit case) only appends a duplicate
  * sketch row the idempotent KMV merge absorbs — the rolled-up ledger must
  * equal the one-shot batch sketch of everything ever staged. */
class SketchLedgerRestartSpec extends SparkSpec {
  import spark.implicits._

  test("sketch ledger survives a kill-and-restart and a replayed append") {
    val root = Files.createTempDirectory("graft-t26-restart-").toString
    val (src, ledger, ckpt) = (s"$root/src", s"$root/ledger", s"$root/ckpt")
    new java.io.File(src).mkdirs()

    val c1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight", "srcA"),
      (2L, "pack my box with five dozen liquor jugs again", "srcB"))
      .toDF("doc_id", "text", "source")
    val c2 = Seq(
      (3L, "the quick brown fox jumps over the lazy dog tonight", "srcB"),
      (4L, "sphinx of black quartz judge my vow right now ok", "srcA"))
      .toDF("doc_id", "text", "source")

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
      Streams.sketchStream(stream, ledger, ckpt, n = 3, k = 8)
        .awaitTermination()
    }

    stage(c1, "c1", 1600000000000L)
    run() // process chunk 1, then the process "dies"
    val rowsAfterFirst = spark.read.parquet(ledger).count()

    // simulate the kill-after-append-before-commit replay: duplicate the
    // committed batch's sketch rows verbatim
    val replay = spark.read.parquet(ledger)
    replay.write.mode("append").parquet(ledger)

    stage(c2, "c2", 1600000060000L)
    run() // restart: same checkpoint — only chunk 2 is new work

    val ledgerDf = spark.read.parquet(ledger)
    // ledger holds per-batch appends plus the forged replay, never rewrites
    assert(ledgerDf.count() > rowsAfterFirst)
    val merged = Sketches.mergeSketches(ledgerDf, k = 8)
      .orderBy("source").collect().toSeq
    val oneShot = Sketches.sourceSketch(c1.unionByName(c2), n = 3, k = 8)
      .orderBy("source").collect().toSeq
    assert(merged === oneShot)
  }
}
