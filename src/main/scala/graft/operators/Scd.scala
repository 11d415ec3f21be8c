package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD Type-2 merge — dimension history tracking for the reference's
  * star-schema design (`/root/reference/docs/dimensional_modeling.md:37-47`
  * sketches static dims; Type-2 versioning is what the warehouse needs the
  * day an attribute drifts: never UPDATE a dim row, close it and open a
  * successor, so every fact joins the attribute values that were true AT
  * ITS TIME).
  *
  * Contract: `current` carries (keys…, attrs…, valid_from, valid_to) with
  * `valid_to IS NULL` marking each key's single open row; `updates` carries
  * (keys…, attrs…, ts) with EXACTLY ONE row per key (resolve a batch's
  * internal ordering upstream — keeping resolution out of the operator
  * makes the merge itself windowless). Per key:
  *   - update differs from the open row → close it (`valid_to = ts`) and
  *     open a successor `[ts, NULL)`;
  *   - update equal to the open row → no-op (idempotent re-runs);
  *   - key unknown → brand-new open row;
  *   - historic (closed) rows pass through untouched.
  *
  * Scale shape: ONE shuffle — a full-outer equi-join of the open slice
  * against the updates on the key columns; the ≤2 output rows per joined
  * key come from an inline array-explode (no second pass, no window). The
  * closed-history slice is a pure pass-through scan unioned back in.
  * Comparisons are null-safe (`<=>`), so NULL attribute values neither
  * always-close nor never-close a row.
  */
object Scd {

  def merge2(current: DataFrame, updates: DataFrame, keys: Seq[String],
             attrs: Seq[String], ts: String = "ts"): DataFrame = {
    val openRows = current.filter(col("valid_to").isNull)
    val closedRows = current.filter(col("valid_to").isNotNull)

    val u = updates.select(
      keys.map(col) ++
        attrs.map(a => col(a).as(s"_u_$a")) :+ col(ts).as("_u_ts"): _*)
    val j = openRows.join(u, keys, "full_outer")

    val hasOpen = col("valid_from").isNotNull
    val hasUpd = col("_u_ts").isNotNull
    val changed = attrs.map(a => !(col(a) <=> col(s"_u_$a"))).reduce(_ || _)

    def ver(from: Column, to: Column, attrOf: String => Column) =
      struct(from.as("valid_from") +: to.as("valid_to") +:
        attrs.map(a => attrOf(a).as(a)): _*)

    val out = j.select(
      keys.map(col) :+
        explode(
          when(hasOpen && hasUpd && changed,
            array(ver(col("valid_from"), col("_u_ts"), a => col(a)),
                  ver(col("_u_ts"), lit(null).cast("timestamp"), a => col(s"_u_$a"))))
          .when(hasOpen, // no update, or an equal one: keep the open row
            array(ver(col("valid_from"), lit(null).cast("timestamp"), a => col(a))))
          .otherwise(    // brand-new key
            array(ver(col("_u_ts"), lit(null).cast("timestamp"), a => col(s"_u_$a"))))
        ).as("_v"): _*)

    val flat = out.select(
      keys.map(col) ++
        attrs.map(a => col(s"_v.$a").as(a)) :+
        col("_v.valid_from").as("valid_from") :+
        col("_v.valid_to").as("valid_to"): _*)
    flat.unionByName(closedRows.select(flat.columns.map(col): _*))
  }
}
