package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication operators for the LLM-data-pipeline layer: exact
  * content-hash dedup, MinHash+LSH near-dup, prefix-filtered n-gram Jaccard
  * join, and SimHash hamming near-dup. All operate on a `(doc_id BIGINT,
  * text STRING)` shape (the driver's `documents` table).
  *
  * Scale design (the point of this module): **no all-pairs comparison
  * anywhere.** Every near-dup variant generates candidate pairs through a
  * bucketing/blocking join —
  *
  *  - MinHash-LSH: banded signatures; only docs sharing a band bucket meet
  *    (probabilistic recall, tunable via bands × rowsPerBand);
  *  - n-gram Jaccard: prefix filtering (PPJoin-style) — docs must share one
  *    of their `|s| - ceil(θ|s|) + 1` globally-rarest shingles, which is
  *    *exact*: any pair with true Jaccard ≥ θ is guaranteed to collide;
  *  - SimHash: pigeonhole banding — a ≤ k-bit hamming difference forces an
  *    exact match in one of k+1 disjoint bit-bands, also exact recall.
  *
  * Candidate verification then touches only the collided pairs. At 100 TB
  * the bucket joins shuffle on high-cardinality keys (band hashes / rare
  * shingles); degenerate buckets (a shingle shared by millions of docs)
  * should be frequency-capped upstream — see the `df` join in
  * [[nearDupNgram]], which already computes the needed statistic.
  */
object Dedup {

  /** Exact dedup: normalize → MD5 → first-write-wins within each hash group
    * (lowest doc_id is canonical, mirroring the idempotent-sink semantics of
    * [[Incremental.appendNew]]). One wide-key shuffle; no joins. */
  def exact(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("content_hash"))
    docs
      .withColumn("content_hash", md5(TextOps.normalize(col("text"))))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("is_canonical", col("doc_id") === col("canonical_id"))
      .select("doc_id", "content_hash", "canonical_id", "is_canonical")
  }

  /** Per-doc distinct shingle sets: `(doc_id, shingles array<string>)`.
    * Docs shorter than `n` tokens yield an empty set (they cannot be
    * near-duplicates under set Jaccard). */
  def shingleSets(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), TextOps.shingles(col("text"), n).as("shingles"))
      .filter(size(col("shingles")) > 0)

  /** MinHash signatures: `numHashes` independent permutations approximated
    * by seeded xxhash64 (`h_i(s) = xxhash64(i, s)`), min-reduced per doc.
    * One explode + one hash-aggregate (map-side combined); the signature is
    * `numHashes × 8` bytes per doc regardless of doc size. */
  def minhashSignatures(shingleSets: DataFrame, numHashes: Int): DataFrame = {
    val exploded = shingleSets.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val hashed = exploded.select(
      col("doc_id") +: (0 until numHashes).map(i => xxhash64(lit(i), col("sh")).as(s"h$i")): _*)
    val aggs = (0 until numHashes).map(i => min(col(s"h$i")).as(s"m$i"))
    hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH banding: hash each band of `rowsPerBand` signature slots, self-join
    * on `(band, bandHash)`, emit distinct `i < j` candidate pairs. The join
    * key cardinality is ~`bands × distinct-signatures` — uniform and huge, so
    * the shuffle partitions cleanly at scale. */
  def lshCandidates(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandStructs = array((0 until bands).map { b =>
      val slots = (0 until rowsPerBand).map(r => col("sig")(b * rowsPerBand + r))
      struct(lit(b).as("band"), xxhash64(lit(b) +: slots: _*).as("bh"))
    }: _*)
    val banded = sigs.select(col("doc_id"), explode(bandStructs).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("i"), col("r.doc_id").as("j"))
      .distinct()
  }

  /** Verify candidate pairs with exact set Jaccard; keep pairs ≥ threshold.
    * Two id-keyed joins re-attach the shingle sets — proportional to the
    * candidate count, not n². */
  def verifyJaccard(cands: DataFrame, shingleSets: DataFrame, threshold: Double): DataFrame =
    cands
      .join(shingleSets.select(col("doc_id").as("i"), col("shingles").as("si")), "i")
      .join(shingleSets.select(col("doc_id").as("j"), col("shingles").as("sj")), "j")
      .withColumn("jaccard",
        size(array_intersect(col("si"), col("sj"))).cast("double") /
          size(array_union(col("si"), col("sj"))))
      .filter(col("jaccard") >= threshold)
      .select("i", "j", "jaccard")

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    * Defaults (128 hashes = 16 bands × 8 rows) put the S-curve threshold at
    * (1/16)^(1/8) ≈ 0.71: a true-0.9 pair is missed with p < 2e-4. */
  def nearDupMinhash(docs: DataFrame, n: Int = 3, numHashes: Int = 128,
                     bands: Int = 16, threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, s"bands=$bands must divide numHashes=$numHashes")
    val shs = shingleSets(docs, n)
    verifyJaccard(lshCandidates(minhashSignatures(shs, numHashes), bands, numHashes / bands),
      shs, threshold)
  }

  /** Exact n-gram Jaccard similarity join via prefix filtering (PPJoin):
    * order each doc's shingles by ascending global document frequency, keep
    * the first `|s| - ceil(θ|s|) + 1`; any pair with Jaccard ≥ θ must share
    * a prefix shingle, so recall is 100% — same results as a brute-force
    * O(n²) scan, at index-join cost. */
  def nearDupNgram(docs: DataFrame, n: Int = 3, threshold: Double = 0.6): DataFrame = {
    val shs = shingleSets(docs, n)
    val exploded = shs.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val dfreq = exploded.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val ordered = exploded.join(dfreq, "sh")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("df"), col("sh")))).as("ord"),
        count(lit(1)).as("n"))
    val prefixLen = (col("n") - ceil(col("n") * threshold) + 1).cast("int")
    val prefix = ordered
      .select(col("doc_id"), explode(slice(col("ord"), lit(1), prefixLen)).as("p"))
      .select(col("doc_id"), col("p.sh").as("sh"))
    val cands = prefix.as("l").join(prefix.as("r"),
        col("l.sh") === col("r.sh") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("i"), col("r.doc_id").as("j"))
      .distinct()
    verifyJaccard(cands, shs, threshold)
  }

  /** 60-bit term-frequency-weighted SimHash per doc, built from the portable
    * [[TextOps.hash60]] token hash so a DuckDB oracle computes the identical
    * value. Per-bit vote sums are 60 aggregate columns over the (doc, token,
    * tf) table — one pass, no row blow-up. */
  def simhash(docs: DataFrame): DataFrame = {
    val tf = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("f"))
      .withColumn("h", TextOps.hash60(col("tok")))
    val voteAggs = (0 until 60).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, col("f"))
        .otherwise(-col("f"))).as(s"s$b")
    }
    tf.groupBy(col("doc_id")).agg(voteAggs.head, voteAggs.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming, via
    * pigeonhole banding: split the 60 bits into `maxHamming + 1` disjoint
    * bands — any pair within the distance budget matches exactly on ≥ 1 band
    * (exact recall). Verification is a single xor+popcount. */
  def nearDupSimhash(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    require(60 % nBands == 0, s"band count $nBands must divide 60")
    val width = 60 / nBands
    val mask = (1L << width) - 1
    val sh = simhash(docs)
    val bandStructs = array((0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * width).bitwiseAND(lit(mask)).as("bv"))
    }: _*)
    val banded = sh.select(col("doc_id"), col("simhash"), explode(bandStructs).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band").as("band"), col("b.bv").as("bv"))
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bv") === col("r.bv") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("i"), col("r.doc_id").as("j"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
