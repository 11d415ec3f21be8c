package graft

import graft.operators.Scd
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = ts("2024-01-01 00:00:00")
  private val t1 = ts("2024-06-01 00:00:00")
  private val tOld = ts("2023-01-01 00:00:00")

  // key 1: has history (closed row) + an open row that the update changes
  // key 2: open row, update carries identical attrs (must be a no-op)
  // key 4: open row, no update at all
  private def current = Seq(
    (1L, "old", tOld, Option(t0)),
    (1L, "A", t0, None: Option[java.sql.Timestamp]),
    (2L, "B", t0, None: Option[java.sql.Timestamp]),
    (4L, "D", t0, None: Option[java.sql.Timestamp]))
    .toDF("k", "attr", "valid_from", "valid_to")

  private def updates = Seq(
    (1L, "A2", t1), (2L, "B", t1), (3L, "C", t1))
    .toDF("k", "attr", "ts")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "attr", "valid_from", "valid_to")
      .collect().map(_.toString).sorted.toSeq

  test("type-2 merge closes changed rows, no-ops equal ones, inserts new keys") {
    val got = Scd.merge2(current, updates, Seq("k"), Seq("attr"))
    val exp = Seq(
      (1L, "old", tOld, Option(t0)),                            // history untouched
      (1L, "A", t0, Option(t1)),                                // closed at update ts
      (1L, "A2", t1, None: Option[java.sql.Timestamp]),         // successor opened
      (2L, "B", t0, None: Option[java.sql.Timestamp]),          // equal update: no-op
      (3L, "C", t1, None: Option[java.sql.Timestamp]),          // new key
      (4L, "D", t0, None: Option[java.sql.Timestamp]))          // no update
      .toDF("k", "attr", "valid_from", "valid_to")
    assert(canon(got) === canon(exp))
  }

  test("re-applying the same updates is a fixpoint (idempotent re-runs)") {
    val once = Scd.merge2(current, updates, Seq("k"), Seq("attr"))
    val twice = Scd.merge2(once, updates, Seq("k"), Seq("attr"))
    assert(canon(twice) === canon(once))
  }

  test("null-safe attr comparison: NULL -> NULL is a no-op, NULL -> value closes") {
    val cur = Seq((1L, Option.empty[String], t0), (2L, Option.empty[String], t0))
      .toDF("k", "attr", "valid_from")
      .withColumn("valid_to", lit(null).cast("timestamp"))
    val upd = Seq((1L, Option.empty[String], t1), (2L, Option("x"), t1))
      .toDF("k", "attr", "ts")
    val got = Scd.merge2(cur, upd, Seq("k"), Seq("attr"))
    assert(got.filter(col("k") === 1).count() === 1)      // no-op
    assert(got.filter(col("k") === 2).count() === 2)      // closed + successor
  }
}
