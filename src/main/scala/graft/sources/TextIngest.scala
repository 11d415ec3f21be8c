package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw-corpus ingest readers (S11): the path a user takes to get a crawl
  * dump INTO the engine's `documents` shape — newline-delimited JSON, the
  * lingua franca of text-corpus distribution (one JSON object per line).
  *
  * Skip-bad-rows contract: a malformed line (truncated JSON, wrong field
  * type, missing id) is DROPPED, never nulled-through or fatal — a 100 TB
  * crawl always contains poison lines, and one of them must not kill a
  * stage. Implemented as `text` scan → `from_json` (PERMISSIVE: unparseable
  * → NULL struct, type-mismatched field → NULL field) → required-field
  * filter; all codegen'd column algebra, no UDF, so the scan parallelizes
  * like any text read (line-splittable, no cross-line state).
  */
object TextIngest {

  /** The documents-corpus shape (TESTDATA.md). */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Read a JSONL documents corpus, dropping malformed lines (see the
    * skip-bad-rows contract above). A row survives iff the line parses AND
    * carries a typed `doc_id` and `text` — the two fields nothing
    * downstream can proceed without; the optional metadata fields pass
    * through as NULL when absent. */
  def documentsFromJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(from_json(col("value"), DocumentsSchema).as("d"))
      .filter(col("d").isNotNull &&
        col("d.doc_id").isNotNull && col("d.text").isNotNull)
      .select(col("d.doc_id").as("doc_id"), col("d.text").as("text"),
        col("d.lang").as("lang"), col("d.source").as("source"),
        col("d.n_chars").as("n_chars"))
}
