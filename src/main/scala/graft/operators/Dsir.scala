package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One per-document feature occurrence: the hashed n-gram bucket's
  * importance ratio `r`, at stream position `pos` (unigrams first in token
  * order, then bigrams in token order — the fixed fold order both engines
  * replay). */
final case class DsirFeat(doc_id: Long, pos: Long, r: Double)

/** One scored document: feature count and the importance weight in
  * normalized base-2 form — `weight = mant · 2^e2` with `mant ∈ [1, 2)`. */
final case class DsirWeight(doc_id: Long, n_feats: Long, e2: Long, mant: Double)

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023) — the
  * distribution-matching data-selection pass a pre-training pipeline runs
  * between curation and sampling: score every RAW document by how much
  * more likely its hashed n-gram bag is under the TARGET corpus's
  * multinomial than under the raw pool's, then keep the top-weighted docs.
  * The reference pipeline curates by per-doc quality rules; this is the
  * corpus-level complement (match a trusted distribution, not a rubric).
  *
  * Features are the paper's hashed n-grams: unigrams and bigrams of the
  * normalized token stream, hashed into `buckets` fixed buckets
  * ([[TextOps.hash60]] mod B — engine-portable, unlike murmur). Both
  * multinomials get add-one smoothing, so every bucket's importance ratio
  *
  *   r(b) = p̂_target(b) / p̂_raw(b)
  *        = ((ct+1)/(T+B)) / ((cq+1)/(R+B))
  *
  * is finite and positive; a per-bucket clamp to [2⁻³², 2³²] caps any
  * single feature's evidence (the gradient-clip move — at add-one
  * smoothing the ratio only approaches those bounds on pathological
  * corpora, but the bound is what makes the fold's range PROVABLE).
  *
  * NUMERIC PARITY (the no-transcendentals rule, see [[Unigram]]): the
  * textbook weight is `exp(Σ c_f · log r_f)` — but libm log/exp are
  * engine-divergent, so the weight is computed as the PRODUCT `Π r_f`
  * carried in exact normalized base-2 form `(mant ∈ [1,2), e2 ∈ ℤ)`:
  * each step is ONE correctly-rounded IEEE multiplication `mant·r`
  * (operands exactly agreed: each r is three divisions of exact integers,
  * identical on any IEEE engine) followed by EXACT power-of-two
  * renormalization — `mant·r ∈ [2⁻³², 2³³)` is always a normal double, so
  * extracting its exponent and scaling by `2^-k` loses nothing. Since
  * log is strictly monotone, ordering by `(e2, mant)` IS ordering by the
  * textbook log-weight — bit-identical on both engines. The DuckDB oracle
  * replays the identical chain in a recursive CTE whose renormalization
  * is an unrolled exact halving cascade (×2³², then conditional division
  * by 2⁶⁴…2¹ — every multiply/divide by 2^k exact, so the cascade equals
  * the exponent extraction bit-for-bit).
  *
  * Scale shape: two corpus-linear counting passes (map-side combined) feed
  * a BOUNDED ratio table (≤ `buckets` rows — the one legitimate broadcast);
  * the per-doc fold is the house ordered-fold pattern (groupByKey +
  * flatMapSortedGroups), one shuffle keyed by doc_id with O(1) state per
  * group. Nothing is ever pairwise and no stage holds more than B rows of
  * model state, so the pass stays linear at any corpus size; selection is
  * a top-k (TakeOrdered — never a global sort materialization). */
object Dsir {

  /** Per-document importance weights of the raw pool against the target
    * distribution `isTarget` (a boolean predicate over the document row).
    * Output: `(doc_id, n_feats, e2, mant)` — `weight = mant · 2^e2`. */
  def weights(docs: DataFrame, isTarget: Column, buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = docs.sparkSession
    import spark.implicits._
    // token arrays in their OWN projection (lambda-CSE rule)
    val toks = docs.select(col("doc_id"), isTarget.as("tgt"),
      TextOps.tokens(col("text")).as("w"))
    // feature stream: unigrams at positions 0..n-1, bigrams at n..2n-2 —
    // one fixed order per document, the order the fold multiplies in
    val feats = toks
      .select(col("doc_id"), col("tgt"),
        posexplode(concat(col("w"),
          zip_with(slice(col("w"), lit(1), size(col("w")) - 1),
            slice(col("w"), lit(2), size(col("w")) - 1),
            (a, b) => concat_ws(" ", a, b)))))
      .select(col("doc_id"), col("tgt"), col("pos"),
        (TextOps.hash60(col("col")) % buckets).as("b"))
    // raw + target bucket counts: corpus-linear, map-side combined, and the
    // grouped output is bucket-bounded (≤ B rows each)
    val counts = feats.groupBy(col("b")).agg(
      count(lit(1)).as("cq"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"))
    val tot = broadcast(counts.agg(
      sum(col("cq")).as("rt"), sum(col("ct")).as("tt")))
    // importance ratios: three IEEE divisions of exact integers each —
    // exactly agreed operands, correctly rounded, so engine-identical;
    // clamped so the fold's per-step range is provable
    val rat = counts.crossJoin(tot).select(col("b"),
      least(greatest(
        (((col("ct") + 1).cast("double") / (col("tt") + buckets).cast("double"))
          / ((col("cq") + 1).cast("double") / (col("rt") + buckets).cast("double"))),
        lit(math.pow(2, -32))), lit(math.pow(2, 32))).as("r"))
    // the ratio table is bucket-bounded by construction: the one
    // legitimate broadcast (the Unigram-model stance)
    val stream = feats.join(broadcast(rat), Seq("b"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("r"))
      .as[DsirFeat]
    stream.groupByKey(_.doc_id).flatMapSortedGroups($"pos") { (id, rows) =>
      var mant = 1.0
      var e2 = 0L
      var n = 0L
      rows.foreach { f =>
        n += 1
        val m2 = mant * f.r // the ONE rounded op per feature
        // m2 ∈ [2^-32, 2^33): always normal, so exponent extraction and
        // the 2^-k scaling are EXACT — identical to the oracle's cascade
        val k = Math.getExponent(m2)
        mant = Math.scalb(m2, -k)
        e2 += k
      }
      Iterator.single(DsirWeight(id, n, e2, mant))
    }.toDF()
  }

  /** Top-`k` raw documents by importance weight — the resampling step's
    * deterministic variant (ties broken by doc_id; weights are total-
    * ordered by `(e2, mant)` since mant ∈ [1,2)). TakeOrdered, never a
    * global sort. */
  def select(docs: DataFrame, isTarget: Column, k: Int,
             buckets: Int = 256): DataFrame =
    weights(docs, isTarget, buckets)
      .orderBy(col("e2").desc, col("mant").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("e2"), col("mant"))
}
