package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L70: edit-distance similarity join — all document pairs whose
  * normalized texts are within Levenshtein distance `t` (the
  * record-linkage / fuzzy-dedup join: OCR'd rescans, typo'd reposts and
  * template fills that token-set Jaccard under-scores because a one-char
  * edit kills every shingle it touches).
  *
  * Algorithm: the segment-pigeonhole candidate scheme of PassJoin (Li,
  * Deng, Feng, Wang — ICDE 2011/VLDB 2013 family), Spark-first:
  *
  *  1. every string of length >= t+1 is cut into t+1 contiguous even
  *     segments (ONE index row per segment — O(t) rows per string);
  *  2. a probe string enumerates, for each candidate partner length
  *     `nn` in [len−t, len] and each segment index i of THAT length's
  *     partition, the substrings at the starts the MULTI-MATCH-AWARE
  *     window admits (PassJoin's tightest selection): an alignment with
  *     d1 edits before the segment and d2 after has |q−p| <= d1 and
  *     |Δ−(q−p)| <= d2, and the multi-match lemma proves a within-t pair
  *     always owns a matching segment with d1 <= i−1 AND d2 <= m−i
  *     (fewer edits on one side would leave an earlier/later segment
  *     matching in ITS window), so candidates need only
  *     o ∈ [max(−⌊(t−Δ)/2⌋, −(i−1), Δ−(m−i)),
  *          min(Δ+⌊(t−Δ)/2⌋, i−1, Δ+(m−i))]
  *     where o = q−p, Δ = len−nn — at most ~half the plain shift
  *     window's t+1 starts (r17: candidate pairs 2,361 → 1,345 and
  *     shuffle ~85 → ~42 MB at sf0.1, identical verified output);
  *  3. candidates join on (partner length, segment index, exact segment
  *     content) — a uniform high-cardinality key, the exact-dedup
  *     shuffle shape — and are verified with the codegen'd built-in
  *     `levenshtein(a, b, t)` (threshold-bounded: O(t·n) per pair, −1
  *     past the bound, no O(n²) DP matrix).
  *
  * LOSSLESS by pigeonhole: <= t edits cannot touch all t+1 disjoint
  * segments, so some segment of the shorter string appears EXACTLY in
  * the longer at a start inside the shift window — every true pair
  * reaches the verify stage (the spec proves ≡ brute force).
  *
  * Strings shorter than t+1 chars admit no t+1-segment partition; their
  * partners are at most 2t chars (length filter), so the degenerate
  * short×short-partner join is bounded by construction and only runs
  * when shorts exist at all. Output: (i, j, dist), i < j, one row per
  * pair within distance t. No UDF anywhere.
  */
object EditJoin {

  def editDistJoin(docs: DataFrame, t: Int = 8): DataFrame = {
    val norm = normalized(docs)
    // the candidate set is stats-blind (post-Generate) and pair-
    // proportional: pin BOTH chained re-attach joins shuffled (a hint
    // binds to its nearest join only)
    candidatePairs(norm, t).hint("shuffle_hash")
      .join(norm.select(col("id").as("a"), col("s").as("sa")), "a")
      .hint("shuffle_hash")
      .join(norm.select(col("id").as("b"), col("s").as("sb")), "b")
      .withColumn("dist", levenshtein(col("sa"), col("sb"), t))
      .filter(col("dist") >= 0)
      .select(col("a").as("i"), col("b").as("j"),
        col("dist").cast("bigint").as("dist"))
  }

  private[graft] def normalized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("id"),
        TextOps.normalize(col("text")).as("s"))
      .withColumn("len", length(col("s")))

  /** The distinct candidate pair set BEFORE the levenshtein verify — the
    * probe surface: candidate growth is the quantity the scale claim
    * rides on (ScaleProbe measures it at 1× vs 10×). */
  private[graft] def candidatePairs(norm: DataFrame, t: Int): DataFrame = {
    require(t >= 1, s"threshold must be >= 1, got $t")
    val m = t + 1

    // ---- PassJoin core: both sides have >= t+1 chars ----
    val long = norm.filter(col("len") >= m)
    // even partition of a length-n string into m segments: the last
    // (n mod m) segments are one char longer; p/l are 1-based start/len
    def segLen(i: String, rem: String) =
      when(expr(i) > lit(m) - expr(rem), 1).otherwise(0)
    def segStart(i: String, base: String, rem: String) =
      (expr(i) - 1) * expr(base) +
        greatest(lit(0), expr(i) - 1 - (lit(m) - expr(rem))) + 1
    val segs = long
      .select(col("id"), col("s"), col("len"),
        explode(sequence(lit(1), lit(m))).as("i"))
      .withColumn("base", expr(s"len div $m"))
      .withColumn("rem", expr(s"len % $m"))
      .select(col("id").as("sid"), col("len").as("nn"), col("i"),
        col("s").substr(segStart("i", "base", "rem"),
          col("base") + segLen("i", "rem")).as("seg"))
    val probes = long
      .select(col("id"), col("s"), col("len"),
        explode(sequence(greatest(lit(m), col("len") - t), col("len"))).as("nn"))
      .withColumn("delta", col("len") - col("nn"))
      .withColumn("base", expr(s"nn div $m"))
      .withColumn("rem", expr(s"nn % $m"))
      .select(col("id"), col("s"), col("len"), col("nn"), col("delta"),
        col("base"), col("rem"), explode(sequence(lit(1), lit(m))).as("i"))
      .withColumn("l", col("base") + segLen("i", "rem"))
      .withColumn("p", segStart("i", "base", "rem"))
      .select(col("id"), col("s"), col("len"), col("nn"), col("i"),
        col("l"), col("p"),
        // multi-match-aware start window (see scaladoc): the plain shift
        // bound ∩ |o| <= i−1 ∩ |Δ−o| <= m−i. Never empty: the lower
        // bound's only positive term Δ−(m−i) stays <= every upper term
        // (their gap is t−Δ >= 0), and 0 always qualifies when Δ = 0.
        explode(sequence(
          greatest(expr(s"-(($t - delta) div 2)"),
            lit(1) - col("i"), col("delta") - (lit(m) - col("i"))),
          least(expr(s"delta + (($t - delta) div 2)"),
            col("i") - 1, col("delta") + (lit(m) - col("i"))))).as("o"))
      .withColumn("q", col("p") + col("o"))
      .filter(col("q") >= 1 && col("q") + col("l") - 1 <= col("len"))
      .select(col("id").as("rid"), col("nn"), col("i"),
        col("s").substr(col("q"), col("l")).as("seg"))
    // shuffle_hash, NEVER broadcast: both sides are corpus-derived
    // explode products whose size estimates Catalyst gets badly wrong
    // (post-Generate stats) — at 10x it picked a driver-side broadcast of
    // the multi-million-row segment table (measured: 60 s / OOM at
    // default driver memory); the key is uniform high-cardinality, the
    // canonical shuffle-join shape
    val passPairs = segs.hint("shuffle_hash").join(probes, Seq("nn", "i", "seg"))
      .filter(col("sid") =!= col("rid"))
      .select(least(col("sid"), col("rid")).as("a"),
        greatest(col("sid"), col("rid")).as("b"))

    // ---- degenerate tail: strings shorter than t+1 chars ----
    // a partner differs by <= t chars in length, so a short string's
    // candidates are exactly the strings in its [len−t, len+t] length
    // window (all <= 2t chars) — generated as an EQUI-join on partner
    // length (2t+1 exploded keys per short row), never a cartesian, and
    // fully lazy: when no sub-t+1-char string exists the branch costs an
    // empty scan, not an eager existence probe
    val shorts = norm.filter(col("len") < m)
    val shortPairs = shorts
      .select(col("id").as("ia"),
        explode(sequence(greatest(col("len") - t, lit(0)),
          col("len") + t)).as("plen"))
      .join(norm.select(col("id").as("ib"), col("len").as("plen")), Seq("plen"))
      .filter(col("ia") =!= col("ib"))
      .select(least(col("ia"), col("ib")).as("a"),
        greatest(col("ia"), col("ib")).as("b"))
    passPairs.unionAll(shortPairs).distinct()
  }
}
