package graft.operators

import scala.collection.mutable

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
  *  - n-gram Jaccard: inverted shingle index — shared-shingle pair counts
  *    ARE the intersection sizes, so Jaccard falls out *exactly* (any pair
  *    with J ≥ θ > 0 shares a shingle: full recall by construction);
  *  - SimHash: pigeonhole banding — a ≤ k-bit hamming difference forces an
  *    exact match in one of k+1 disjoint bit-bands, also exact recall.
  *
  * All candidate emission goes through bucket-grouping + in-bucket pair
  * expansion ([[bucketPairs]]), never a self-join: a self-join evaluates
  * the upstream pipeline once per side when planned broadcast-hash. At
  * 100 TB the bucket groupBys shuffle on high-cardinality keys (band
  * hashes / shingles); degenerate postings (a shingle shared by millions
  * of docs) are df-capped ([[nearDupNgram]]'s `maxDf`, `maxBucket` in the
  * LSH paths).
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
    // two projections, not one: the token array must be MATERIALIZED before
    // the per-position shingle lambda runs, or Catalyst re-evaluates the
    // whole regexp+split tokenization once per shingle position (no
    // common-subexpression elimination across lambda boundaries) — measured
    // ~20× slower on real documents
    // NO size()>0 filter here: a predicate on the computed column gets
    // pushed below the upstream exchange with the whole shingling
    // expression inlined, re-running tokenization serially on the scan
    // partition (measured 6.6 s single-task at sf0.1). Empty shingle sets
    // are harmless downstream — explode emits nothing for them.
    docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TextOps.shinglesOf(col("toks"), n).as("shingles"))

  /** splitmix64 finalizer — the hash family `h_i(s) = mix(xxhash64(s) + i·γ)`
    * derives `numHashes` independent-enough permutations from ONE string
    * hash, at ~3 ops per derived hash. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signatures: repartition the (small) per-doc shingle sets by
    * doc_id, THEN explode — the explode is narrow, so every shingle of a
    * doc lands in one partition and the per-partition signature map is
    * already final (no merge/aggregation stage at all; the one shuffle
    * moves shingle-set rows, the cheapest representation). The string
    * shingle is hashed once; the `numHashes` family members are splitmix64
    * derivations of the base hash in a tight loop — no `numHashes`-wide
    * codegen, no per-function string re-scan. Signature = `numHashes × 8`
    * bytes per doc regardless of doc size. */
  def minhashSignatures(shingleSets: DataFrame, numHashes: Int): DataFrame = {
    val spark = shingleSets.sparkSession
    import spark.implicits._
    val based = shingleSets
      // explicit partition count: a bare repartition(col) is an AQE-
      // coalescible exchange, and this stage is CPU-bound on few megabytes —
      // AQE would merge it into ONE task (measured: 6.5 s serial vs <1 s wide)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h0")).as[(Long, Long)]
    based.mapPartitions { it =>
      val acc = mutable.HashMap.empty[Long, Array[Long]]
      it.foreach { case (doc, h0) =>
        val sig = acc.getOrElseUpdate(doc, Array.fill(numHashes)(Long.MaxValue))
        var i = 0
        while (i < numHashes) {
          val h = mix64(h0 + i * 0x9e3779b97f4a7c15L)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      acc.iterator
    }.toDF("doc_id", "sig")
  }

  /** LSH banding: fold each band of `rowsPerBand` signature slots into one
    * band hash (typed flatMap — one row per doc in, `bands` tiny rows out;
    * the wide per-slot expression tree this replaces cost more in codegen
    * compilation than in execution), self-join on `(band, bandHash)`, emit
    * distinct `i < j` candidate pairs. The join key cardinality is
    * ~`bands × distinct-signatures` — uniform and huge, so the shuffle
    * partitions cleanly at scale. */
  def lshCandidates(sigs: DataFrame, bands: Int, rowsPerBand: Int,
                    maxBucket: Int = 4096): DataFrame = {
    val banded = bandedSigs(sigs, bands, rowsPerBand)
    // groupBy + in-bucket pair expansion, NOT a self-join: a self-join here
    // evaluates the whole signature pipeline once per side (broadcast-hash
    // plans cannot reuse the exchange), doubling the query. Buckets hold
    // near-identical docs only, so they are tiny; `maxBucket` skips
    // degenerate ones (a capped bucket means pathological mass duplication
    // better handled by exact dedup first).
    bucketPairs(banded.groupBy(col("band"), col("bh"))
        .agg(array_sort(collect_list(col("doc_id"))).as("ds")), maxBucket)
      .distinct()
  }

  /** Fold each band of `rowsPerBand` signature slots into one band hash:
    * `(doc_id, band, bh)` rows, `bands` per doc. */
  private def bandedSigs(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    sigs.select(col("doc_id"), col("sig")).as[(Long, Array[Long])]
      .flatMap { case (doc, sig) =>
        (0 until bands).iterator.map { b =>
          var h = 0x51_7c_c1_b7_27_22_0a_95L + b
          var r = 0
          while (r < rowsPerBand) { h = mix64(h ^ sig(b * rowsPerBand + r)); r += 1 }
          (doc, b, h)
        }
      }.toDF("doc_id", "band", "bh")
  }

  /** LSH candidates for INCREMENTAL ingest: pairs that involve at least one
    * `sigsNew` doc — old×new (i = old, j = new) and new×new (i < j) — and
    * NEVER old×old. This is the property that makes batch-against-corpus
    * dedup affordable at 100 TB: the persisted corpus's in-bucket pairs
    * (quadratic in corpus duplication) are never materialized, so per-batch
    * work is proportional to the batch's bucket overlap, not the corpus's.
    * Band hashes are identical to [[lshCandidates]]'s, so a true near-dup
    * pair collides here with exactly the same probability. `maxBucket` caps
    * each side of a bucket independently (the standard degenerate-mass
    * valve). Doc ids must be disjoint across the two inputs. */
  def crossCandidates(sigsOld: DataFrame, sigsNew: DataFrame,
                      bands: Int, rowsPerBand: Int,
                      maxBucket: Int = 4096): DataFrame = {
    val banded = bandedSigs(sigsOld, bands, rowsPerBand)
        .withColumn("is_new", lit(false))
      .unionByName(bandedSigs(sigsNew, bands, rowsPerBand)
        .withColumn("is_new", lit(true)))
    // collect_list skips the null branch of the CASE, so each bucket splits
    // into its old and new member arrays in ONE aggregation
    // both pair families expand from ONE aggregation pass (two consumers of
    // the bucket aggregate would run the HashAggregate twice — only the
    // exchange below it is reused)
    val crossArr = flatten(transform(col("olds"), e =>
      transform(col("news"), nn => struct(e.as("i"), nn.as("j")))))
    val newArr = flatten(transform(col("news"), (x, i) =>
      transform(slice(col("news"), i + 2, size(col("news"))),
        y => struct(x.as("i"), y.as("j")))))
    banded.groupBy(col("band"), col("bh"))
      .agg(
        array_sort(collect_list(when(!col("is_new"), col("doc_id")))).as("olds"),
        array_sort(collect_list(when(col("is_new"), col("doc_id")))).as("news"))
      .filter(size(col("news")) >= 1 &&
        size(col("news")) <= maxBucket && size(col("olds")) <= maxBucket)
      .select(explode(concat(crossArr, newArr)).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"))
      .distinct()
  }

  /** Expand each bucket's sorted member array into its `i < j` pairs —
    * the shared candidate-emission step of every blocking scheme (shared
    * with [[Similarity.embedNearDup]]). Input needs a `ds array<bigint>`
    * column; degenerate buckets above `maxBucket` are skipped
    * (df²-bounded). */
  private[operators] def bucketPairs(buckets: DataFrame, maxBucket: Int): DataFrame =
    buckets
      .filter(size(col("ds")) >= 2 && size(col("ds")) <= maxBucket)
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))),
          y => struct(x.as("i"), y.as("j")))))).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"))

  /** Verify candidate pairs with exact set Jaccard; keep pairs ≥ threshold.
    * Two id-keyed joins re-attach the shingle sets — proportional to the
    * candidate count, not n². */
  def verifyJaccard(cands: DataFrame, shingleSets: DataFrame, threshold: Double): DataFrame =
    // the candidate pair set is dup-rate-proportional — corpus-growing,
    // stats-blind (post-Generate): pin it as a SHUFFLED build side, never
    // let Catalyst broadcast it off a bogus size estimate. A hint binds
    // to its NEAREST join only, so the chained second join re-pins the
    // (cands x si) intermediate explicitly
    cands.hint("shuffle_hash")
      .join(shingleSets.select(col("doc_id").as("i"), col("shingles").as("si")), "i")
      .hint("shuffle_hash")
      .join(shingleSets.select(col("doc_id").as("j"), col("shingles").as("sj")), "j")
      .withColumn("jaccard",
        size(array_intersect(col("si"), col("sj"))).cast("double") /
          size(array_union(col("si"), col("sj"))))
      .filter(col("jaccard") >= threshold)
      .select("i", "j", "jaccard")

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    * Defaults (128 hashes = 16 bands × 8 rows) put the S-curve threshold at
    * (1/16)^(1/8) ≈ 0.71: a true-0.9 pair is missed with p < 2e-4.
    *
    * EAGER: the shingle-set frame is `localCheckpoint`ed at call time
    * (Spark jobs run before this returns), pinning O(corpus distinct
    * shingles) in executor storage for the query's lifetime; checkpointed
    * lineage is unrecoverable on executor loss (acceptable in local mode
    * and for the measured 2× CPU win — cluster callers wanting lazy
    * semantics should persist signatures upstream per the L60 scaladoc). */
  def nearDupMinhash(docs: DataFrame, n: Int = 3, numHashes: Int = 128,
                     bands: Int = 16, threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, s"bands=$bands must divide numHashes=$numHashes")
    // r16 optimization (guide §1.2): `shs` feeds THREE plan branches (the
    // signature pipeline and both sides of the Jaccard verify join), and
    // Catalyst shares no work across branches — the whole
    // tokenize+shingle pass ran three times per query. One eager
    // localCheckpoint computes it once; the materialized set is
    // O(corpus distinct shingles) — the same order as one shuffle of the
    // shingle sets, spilling to executor-local disk beyond memory (a
    // production deployment persists signatures anyway, per the L60
    // scaladoc). Measured: the clean()-family cells drop ~2× in summed
    // task CPU (OPTIMIZATION_r16.md).
    val shs = shingleSets(docs, n).localCheckpoint()
    verifyJaccard(lshCandidates(minhashSignatures(shs, numHashes), bands, numHashes / bands),
      shs, threshold)
  }

  /** Exact n-gram Jaccard similarity join via an inverted shingle index:
    * self-join the (doc, shingle) postings on the shingle, count shared
    * shingles per pair — that count IS `|A∩B|` (sets are distinct), and
    * `|A∪B| = |A|+|B|-|A∩B|`, so Jaccard needs no array materialization at
    * all. Recall is exact: J ≥ θ > 0 implies ≥ 1 shared shingle.
    *
    * Cost is Σ_shingle df² join rows — the classic inverted-index-join
    * bound. `maxDf` caps pathological postings (a shingle shared by
    * millions of docs contributes df² rows but near-zero Jaccard evidence);
    * capping is the standard scale valve and stays *exact* as long as every
    * qualifying pair still shares ≥ 1 uncapped shingle (true in practice
    * for θ-similar docs, which share many low-df shingles; None = exact
    * unconditionally). */
  def nearDupNgram(docs: DataFrame, n: Int = 3, threshold: Double = 0.6,
                   maxDf: Option[Int] = None): DataFrame =
    sharedShingleCounts(docs, n, maxDf)
      .withColumn("jaccard",
        col("c").cast("double") / (col("ni") + col("nj") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select("i", "j", "jaccard")

  /** Asymmetric CONTAINMENT near-dup join: `C = |A∩B| / min(|A|,|B|)` over
    * distinct word n-gram sets — the doc-in-doc detector. Jaccard misses a
    * short document quoted whole inside a much longer one (the union is
    * dominated by the long side, J ≈ |A|/|B| → 0); containment normalizes
    * by the SMALLER set, so a full quote scores 1.0 regardless of the host
    * document's length. Same inverted-index candidate generation and cost
    * bound as [[nearDupNgram]] — exact recall for θ > 0 among uncapped
    * shingles, no all-pairs join. */
  def containmentNgram(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
                       maxDf: Option[Int] = None): DataFrame =
    sharedShingleCounts(docs, n, maxDf)
      .withColumn("containment",
        col("c").cast("double") / least(col("ni"), col("nj")))
      .filter(col("containment") >= threshold)
      .select("i", "j", "containment")

  /** Shared pair-count core of the exact n-gram similarity joins: inverted
    * shingle index → in-list ordered-pair expansion → per-pair shared count
    * `c = |A∩B|` with both set sizes carried — the one shuffle-bounded
    * artifact every set-overlap measure (Jaccard, containment, overlap
    * coefficient) is a one-line projection over. */
  private def sharedShingleCounts(docs: DataFrame, n: Int,
                                  maxDf: Option[Int]): DataFrame = {
    val shs = shingleSets(docs, n)
    // each posting row carries its doc's set size — joining sizes back
    // later would re-traverse the corpus AND constraint propagation would
    // inline the full shingle expression as a scan-side isnotnull filter
    // (the same serial-scan trap as InferFiltersFromGenerate)
    val exploded = shs.select(col("doc_id"), size(col("shingles")).as("sz"),
      explode(col("shingles")).as("sh"))
    // inverted lists per shingle, then in-list pair expansion (NOT a
    // self-join on the shingle — that would evaluate the posting pipeline
    // once per join side). Each pair occurrence = one shared shingle, so
    // the pair count IS |A∩B|; |A∪B| = ni + nj − |A∩B|.
    // The df cap must bite BEFORE the postings buffer materializes (same
    // valve ordering as [[decontaminate]]): a stopword shingle shared by
    // 10^8 docs would otherwise build its full posting array inside one
    // aggregation buffer just to be discarded. Counting df is
    // constant-space per key, so pre-count and semi-join away over-cap
    // shingles; only survivors reach collect_list.
    val eligible = maxDf.fold(exploded) { cap =>
      // the under-cap shingle valve is shingle-TYPE-scale (corpus-growing)
      // and stats-blind: pin the shuffled build, never broadcast
      val ok = exploded.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= cap).select(col("sh"))
      exploded.join(ok.hint("shuffle_hash"), Seq("sh"), "left_semi")
    }
    eligible.groupBy(col("sh"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("sz")))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a.doc_id").as("i"), col("p.a.sz").as("ni"),
        col("p.b.doc_id").as("j"), col("p.b.sz").as("nj"))
      .agg(count(lit(1)).as("c"))
  }

  /** Connected components over match pairs — the transitive-closure step
    * that turns pairwise near-dup hits into dedup CLUSTERS (A≈B and B≈C
    * must collapse to one canonical doc even when A and C never matched).
    *
    * Iterative min-label propagation: every round each node adopts the
    * minimum label in its closed neighborhood; converges in O(cluster
    * diameter) rounds — near-dup clusters are shallow (similarity is
    * near-transitive), so the cap is a safety valve, not a truncation
    * (convergence is detected, and hitting the cap throws rather than
    * silently emitting partial clusters — the no-silent-caps rule). Each
    * round is one co-partitioned join + one aggregation;
    * `localCheckpoint` materializes every round's labels, truncating the
    * otherwise exponentially deepening iterative lineage. At 100 TB this
    * is the standard hash-min CC; edges are |pairs|·2 rows, labels one row
    * per matched doc. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("i").as("a"), col("j").as("b"))
      .unionByName(pairs.select(col("j").as("a"), col("i").as("b")))
      .localCheckpoint()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = edges
        .join(labels.select(col("id").as("b"), col("lbl").as("nl")), "b")
        .select(col("a").as("id"), col("nl").as("cand"))
        .unionByName(labels.select(col("id"), col("lbl").as("cand")))
        .groupBy(col("id")).agg(min(col("cand")).as("lbl"))
        .localCheckpoint()
      converged = next.join(labels.withColumnRenamed("lbl", "old"), "id")
        .filter(col("lbl") < col("old")).isEmpty
      labels = next
      iter += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — raise maxIter")
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
  }

  /** Cross-corpus n-gram decontamination — the benchmark-hygiene pass a
    * training pipeline runs before eval: find every (eval doc, train doc)
    * pair sharing ≥ `minShared` distinct word `n`-grams, so contaminated
    * eval examples can be dropped or the train docs scrubbed.
    *
    * Same inverted-index shape as [[nearDupNgram]], but the postings carry
    * a side tag and only CROSS-side pairs expand — never train×train or
    * eval×eval, so cost is Σ_shingle df_train·df_eval (df² only in the
    * worst case), with the usual `maxDf` valve per side. Exact recall for
    * any `minShared` ≥ 1 among uncapped shingles. */
  def decontaminate(train: DataFrame, evalDocs: DataFrame, n: Int = 3,
                    minShared: Long = 2L, maxDf: Option[Int] = None): DataFrame = {
    val posts = shingleSets(train, n)
      .select(explode(col("shingles")).as("sh"), col("doc_id").as("id"),
        lit(0).as("side"))
      .unionByName(shingleSets(evalDocs, n)
        .select(explode(col("shingles")).as("sh"), col("doc_id").as("id"),
          lit(1).as("side")))
    // The df cap must bite BEFORE postings materialize: a degenerate
    // high-df shingle (a stopword trigram) would otherwise build its full
    // document list inside one aggregation buffer. Counting is
    // constant-space per key, so pre-count df per side and semi-join away
    // over-cap shingles; only survivors reach collect_list.
    val eligible = maxDf.fold(posts) { cap =>
      val ok = posts.groupBy(col("sh")).agg(
          count(when(col("side") === 0, lit(1))).as("dft"),
          count(when(col("side") === 1, lit(1))).as("dfe"))
        .filter(col("dft") <= cap && col("dfe") <= cap)
        .select(col("sh"))
      // shingle-type-scale valve, stats-blind: pinned shuffled build
      posts.join(ok.hint("shuffle_hash"), Seq("sh"), "left_semi")
    }
    // one groupBy builds both sides' postings; collect_list drops the
    // other side's nulls, so each shingle row holds (train ids, eval ids)
    val lists = eligible.groupBy(col("sh")).agg(
      array_sort(collect_list(when(col("side") === 0, col("id")))).as("ts"),
      array_sort(collect_list(when(col("side") === 1, col("id")))).as("es"))
    lists
      .filter(size(col("ts")) >= 1 && size(col("es")) >= 1)
      .select(explode(flatten(transform(col("es"), e =>
        transform(col("ts"), t => struct(e.as("e"), t.as("t")))))).as("p"))
      .groupBy(col("p.e").as("eval_id"), col("p.t").as("train_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Act on the decontamination report: the scrub direction — drop every
    * TRAIN doc sharing ≥ `minShared` n-grams with any eval doc (keeping
    * the benchmark intact; anti-joining on `eval_id` instead drops the
    * compromised eval rows). One extra left-anti against the detected
    * pair set's distinct train ids — O(detected) on top of
    * [[decontaminate]]. */
  def removeContaminated(train: DataFrame, evalDocs: DataFrame, n: Int = 3,
                         minShared: Long = 2L, maxDf: Option[Int] = None): DataFrame =
    // the contaminated-id set is contamination-rate-proportional (corpus-
    // growing worst case) and stats-blind: pinned shuffled build
    train.join(
      decontaminate(train, evalDocs, n, minShared, maxDf)
        .select(col("train_id")).distinct().hint("shuffle_hash"),
      col("doc_id") === col("train_id"), "left_anti")

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
    // bucket-group + in-bucket pair expansion (see lshCandidates): a banded
    // self-join would evaluate the simhash pipeline once per side
    banded.groupBy(col("band"), col("bv"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("simhash")))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a.doc_id").as("i"), col("p.b.doc_id").as("j"),
        bit_count(col("p.a.simhash").bitwiseXOR(col("p.b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Duplicate-SPAN removal: exact substring dedup at a fixed token grid —
    * the within-corpus repeated-passage scrub (boilerplate paragraphs,
    * licence headers, navigation chrome) that doc-level dedup cannot see.
    * Each doc is cut into consecutive `span`-token segments; a segment seen
    * before anywhere in the corpus (first occurrence = lowest (doc_id,
    * position)) is dropped, and each doc is reassembled from its surviving
    * segments in order.
    *
    * Scale: two shuffles — first-wins over the segment hash (wide uniform
    * key, the exact-dedup shape), then reassembly grouped by doc_id
    * (per-group state bounded by one doc's segments). Segment explosion is
    * linear in corpus tokens; nothing is quadratic and no postings list is
    * ever materialized. Spark-first: sequence/slice/concat_ws are all
    * codegen'd built-ins — no UDF.
    */
  def dedupSpans(docs: DataFrame, span: Int = 10): DataFrame = {
    require(span >= 1, s"span must be >= 1, got $span")
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("i"))
    gridSegs(toks, span)
      .withColumn("h", md5(col("seg")))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("rn") === 1,
            struct(col("i"), col("seg"))))),
          x => x.getField("seg"))).as("clean_text"))
  }

  /** `span`-token grid segments of a (doc_id, toks) frame: (doc_id, i,
    * seg), i the 0-based grid index. Shared by [[dedupSpans]] and
    * [[boilerplateScrub]]. */
  private def gridSegs(toks: DataFrame, span: Int): DataFrame =
    toks
      .select(col("doc_id"), col("toks"),
        // `div`, not `/`: int `/` is double division in Spark SQL
        explode(sequence(lit(0),
          expr(s"greatest((size(toks) + ${span - 1}) div $span - 1, 0)"))).as("i"))
      .select(col("doc_id"), col("i"),
        concat_ws(" ", slice(col("toks"), col("i") * span + 1, lit(span))).as("seg"))

  /** L69: frequency-thresholded boilerplate scrub — the C4/CCNet corpus
    * rule (Raffel et al. 2020 §2.2 drop lines repeated across the crawl;
    * Wenzek et al. 2020 dedup shared paragraphs) re-expressed on the
    * engine's token grid. A `span`-token grid segment that occurs in at
    * least `minDf` DISTINCT documents is boilerplate (navigation chrome,
    * licence headers, templated footers) and is removed from EVERY
    * document — including the first. That removed-everywhere semantic is
    * what distinguishes this from the whole first-wins dedup family
    * ([[dedupSpans]]/[[dedupSubstr]] keep one canonical copy): boilerplate
    * has no canonical copy worth keeping.
    *
    * Scale shape: grid segmentation is linear in corpus tokens (1/span of
    * the any-offset gram cost); the distinct-doc frequency is the exact-
    * dedup shuffle shape — (h, doc_id) distinct (map-side combined), then
    * one narrow count per hash; the boilerplate set joins back on the
    * uniform hash key (no broadcast assumption — at 100 TB a templated
    * crawl's boilerplate set is NOT small); reassembly groups by doc_id
    * with per-group state = one document. No UDF, no postings list. */
  def boilerplateScrub(docs: DataFrame, span: Int = 10, minDf: Long = 3L): DataFrame =
    // grid segments are unique per (doc_id, i) by construction — skip the
    // ledger path's replay-dedup shuffle
    boilerplateFromSegments(gridSegments(docs, span), minDf, dedupe = false)

  /** The `span`-token grid segmentation of a (doc_id, text) corpus:
    * (doc_id, i, seg) — [[boilerplateScrub]]'s first phase, public so the
    * streaming twin can ledger per-batch segments and scrub on read. */
  def gridSegments(docs: DataFrame, span: Int = 10): DataFrame = {
    require(span >= 1, s"span must be >= 1, got $span")
    gridSegs(docs.select(col("doc_id"), split(col("text"), " ").as("toks")), span)
  }

  /** [[boilerplateScrub]]'s scrub phase over an already-segmented corpus
    * (e.g. a streaming segment ledger): distinct-doc df per segment,
    * segments at df >= minDf removed from every document, per-doc
    * reassembly. With `dedupe` (the ledger default) rows are
    * deduplicated first — a (doc_id, i, seg) row is pure set data, so
    * replayed ledger appends are absorbed by idempotence (the t27
    * min-merge class); the batch path passes false because its segments
    * are unique by construction and the extra corpus-wide shuffle would
    * buy nothing. */
  def boilerplateFromSegments(segments: DataFrame, minDf: Long = 3L,
                              dedupe: Boolean = true): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2 (df 1 would scrub everything), got $minDf")
    val deduped = if (dedupe) segments.distinct() else segments
    val segs = deduped.withColumn("h", md5(col("seg")))
    val bp = segs.select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("h"), lit(true).as("bp"))
    // the "no broadcast assumption" above, made EXPLICIT: the boilerplate
    // set is stats-blind (post-Generate aggregate) and corpus-growing on
    // templated crawls — pin the shuffled build
    segs.join(bp.hint("shuffle_hash"), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("bp").isNull, 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("bp").isNull,
            struct(col("i"), col("seg"))))),
          x => x.getField("seg"))).as("clean_text"))
  }

  /** ExactSubstr dedup: repeated-passage removal at ANY token offset —
    * the suffix-array-class scrub training pipelines run (Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better")
    * and the gap [[dedupSpans]]' fixed grid leaves open: a duplicated
    * passage shifted 3 tokens in one document is invisible to a 10-token
    * grid but removed here.
    *
    * Semantics: a token is removed iff it lies inside some `minRun`-token
    * window whose exact token sequence occurs EARLIER in the corpus
    * (global first occurrence by (doc_id, position) survives — the same
    * first-wins order as [[dedupSpans]]); each document is reassembled
    * from its surviving tokens in order. Every duplicated run of length
    * >= minRun is fully covered by its own duplicated minRun-grams, so
    * this removes exactly the ExactSubstr overlap set at threshold
    * minRun.
    *
    * Scale shape (all linear, no postings list, no suffix array):
    *  1. every-offset minRun-gram hashes — O(tokens) rows, O(minRun)
    *     hash work each (the honest cost of any-offset sensitivity;
    *     the grid variant pays 1/minRun of it and misses shifts);
    *  2. first-wins over the gram hash — ONE wide shuffle on a uniform
    *     high-cardinality key (the exact-dedup shape);
    *  3. coverage as a DIFFERENCE ARRAY: each later-occurrence gram
    *     contributes (+1 at pos, -1 at pos+minRun); summed per token
    *     index, a running total > 0 marks covered tokens — two narrow
    *     aggregations and one per-doc window, never an interval join;
    *  4. reassembly grouped by doc_id (per-group state = one document).
    * Spark-first: sequence/slice/concat_ws/md5 + windows — no UDF. */
  def dedupSubstr(docs: DataFrame, minRun: Int = 10): DataFrame = {
    require(minRun >= 1, s"minRun must be >= 1, got $minRun")
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("pos"))
    val covered = gramsOf(toks, minRun)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .select(col("doc_id"), col("pos"))
    coverAndReassemble(toks, covered, minRun)
  }

  /** Every-offset `k`-gram hashes of a (doc_id, toks) frame:
    * (doc_id, pos, h). `sequence(0, n-k)` must never see n < k (it would
    * descend), so short docs — which can emit no gram — are gated out. */
  private[graft] def gramsOf(toks: DataFrame, k: Int): DataFrame =
    toks.filter(size(col("toks")) >= k)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - k)).as("pos"))
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ", slice(col("toks"), col("pos") + 1, lit(k)))).as("h"))

  /** The shared ExactSubstr tail: covered gram positions → per-token
    * coverage via the difference array (+1 at pos, −1 at pos+k, running
    * sum per doc) → (doc_id, n_tokens, n_kept, clean_text) reassembly. */
  private def coverAndReassemble(toks: DataFrame, covered: DataFrame,
                                 k: Int): DataFrame = {
    val events = covered
      .select(col("doc_id"), col("pos").as("idx"), lit(1L).as("d"))
      .unionAll(covered.select(col("doc_id"), (col("pos") + k).as("idx"),
        lit(-1L).as("d")))
      .groupBy(col("doc_id"), col("idx")).agg(sum(col("d")).as("d"))
    val tokens = toks.select(col("doc_id"),
      posexplode(col("toks")).as(Seq("idx", "tok")))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // coverage events are dup-rate-proportional (corpus-growing) and
    // stats-blind: pinned shuffled build on the co-grouped key
    tokens.join(events.hint("shuffle_hash"), Seq("doc_id", "idx"), "left")
      .withColumn("cov", sum(coalesce(col("d"), lit(0L))).over(wd))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("cov") === 0L, 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("cov") === 0L,
            struct(col("idx"), col("tok"))))),
          x => x.getField("tok"))).as("clean_text"))
  }

  /** The reusable gram index behind [[dedupSubstrAgainst]]: every
    * distinct `minRun`-gram hash of `docs`. Build it ONCE over the
    * standing corpus (and write it bucketed by `h` at deployment — each
    * incremental batch then joins shuffle-free on the bucketed side);
    * never rebuilt per batch. */
  def substrGramIndex(docs: DataFrame, minRun: Int = 10): DataFrame = {
    require(minRun >= 1, s"minRun must be >= 1, got $minRun")
    gramsOf(docs.select(col("doc_id"), split(col("text"), " ").as("toks")),
        minRun)
      .select(col("h")).distinct()
  }

  /** Incremental ExactSubstr: scrub a NEW batch against a standing
    * corpus WITHOUT re-scrubbing the corpus — the [[dedupSubstr]]
    * semantics under the L60 incremental-ingest contract. A new token is
    * removed iff it lies inside a minRun-window whose sequence occurs in
    * the standing corpus (ANY position there is "earlier") or earlier
    * within the batch itself (first occurrence by (doc_id, pos) among
    * the new docs survives). Returns the scrubbed NEW docs only; the
    * standing corpus is authoritative and untouched — exactly how a
    * training pipeline absorbs a daily crawl against years of corpus.
    *
    * Scale shape: the batch side is O(batch tokens) grams; the ONE join
    * against `index` is the per-batch cost an incremental dedup cannot
    * avoid, and a bucketed-by-h index makes it shuffle-free on the
    * corpus side (the batch side shuffles its own grams only — never
    * O(history) rows moved per batch). Coverage + reassembly are the
    * [[dedupSubstr]] difference-array, batch-sized. */
  def dedupSubstrAgainst(index: DataFrame, newDocs: DataFrame,
                         minRun: Int = 10): DataFrame = {
    require(minRun >= 1, s"minRun must be >= 1, got $minRun")
    val toks = newDocs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    dedupSubstrAgainstGrams(index, toks, gramsOf(toks, minRun), minRun)
  }

  /** [[dedupSubstrAgainst]] over PRE-COMPUTED batch grams — the r16
    * fused form for callers that also persist the batch's gram index
    * (the t31 ledger computed `gramsOf` twice per micro-batch, once to
    * scrub and once to append; computing it once and passing it to both
    * halves the per-batch gram CPU, guide §1.2). `grams` must be exactly
    * `gramsOf(toks, minRun)` (checkpointed or not). */
  private[graft] def dedupSubstrAgainstGrams(index: DataFrame, toks: DataFrame,
                                             grams: DataFrame,
                                             minRun: Int): DataFrame = {
    // rn BEFORE the join: a non-distinct index must not be able to
    // duplicate gram rows under the row_number window (coverage events
    // are multiplicity-insensitive, the rank is not)
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("pos"))
    val covered = grams
      .withColumn("rn", row_number().over(w))
      // the gram index is STANDING-CORPUS-scale (the whole point of the
      // incremental form): pin the shuffled build — a broadcast of years
      // of corpus grams is the r14 trap class exactly
      .join(index.select(col("h"), lit(true).as("seen")).distinct()
        .hint("shuffle_hash"), Seq("h"), "left")
      .filter(col("seen").isNotNull || col("rn") > 1)
      .select(col("doc_id"), col("pos"))
    coverAndReassemble(toks, covered, minRun)
  }

  /** L50: PageRank centrality over the near-dup similarity graph — the
    * canonical-document selector: inside a cluster of near-duplicates the
    * highest-rank node is the best-connected representative to KEEP
    * (degree-weighted, transitively) when collapsing the cluster.
    *
    * Graph: symmetric edges from [[nearDupNgram]] pairs. `iters` fixed
    * power-iteration rounds of
    * `r' = (1−d)/N + d·Σ_in round(r/deg, 6)`; contributions are rounded
    * to 6 dp and summed as EXACT DECIMAL (the lmScore discipline), so the
    * per-node total cannot depend on edge arrival order and any engine
    * replaying the same formula agrees bit-for-bit.
    *
    * Scale shape: each round is one O(E) join + one aggregation shuffled
    * on the destination key; N rides a one-row broadcast; the edge set is
    * localCheckpoint'ed once so the shingle join is not re-derived per
    * round. Isolated docs (no near-dup edge) are absent — PageRank of a
    * singleton is just the teleport term. */
  def pageRank(docs: DataFrame, n: Int = 3, threshold: Double = 0.6,
               iters: Int = 4, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    val pairs = nearDupNgram(docs, n, threshold).select(col("i"), col("j"))
    val edges = pairs.select(col("i").as("src"), col("j").as("dst"))
      .unionByName(pairs.select(col("j").as("src"), col("i").as("dst")))
      .localCheckpoint()
    val nodes = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("v"), col("deg"))
    val cnt = broadcast(nodes.agg(count(lit(1)).as("n")))
    val zero = lit(0).cast("decimal(27,6)")
    var ranks = nodes.crossJoin(cnt)
      .select(col("v"), (lit(1.0) / col("n").cast("double")).as("rank"))
    for (_ <- 1 to iters) {
      // ranks/nodes/edges are all GRAPH-scale and stats-blind (the edge
      // set is a checkpoint'd RDD): pin every iteration join shuffled —
      // a broadcast edge list per round is the r14 trap times iters
      val contrib = ranks.join(nodes.hint("shuffle_hash"), "v")
        .join(edges.hint("shuffle_hash"), col("v") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(round(col("rank") / col("deg").cast("double"), 6)
          .cast("decimal(27,6)")).as("c"))
      ranks = nodes.crossJoin(cnt)
        .join(contrib, col("v") === col("dst"), "left")
        .select(col("v"),
          ((lit(1.0) - lit(damping)) / col("n").cast("double")
            + lit(damping) * coalesce(col("c"), zero).cast("double")).as("rank"))
    }
    ranks.select(col("v").as("doc_id"), round(col("rank"), 6).as("rank"))
  }

  /** L49: MOSS-style overlap detection over winnowing fingerprints
    * ([[TextAnalysis.winnow]]): candidate pairs are documents sharing at
    * least `minShared` selected fingerprints. Winnowing's guarantee makes
    * the candidate set RECALL-COMPLETE for any copied run of
    * ≥ `w+k−1` words per shared fingerprint — at ~2/(w+1) of the posting
    * volume a full-shingle index (L3) carries.
    *
    * Same inverted-list discipline as the n-gram joins: distinct
    * (doc, fp) postings, group per fingerprint, in-list pair expansion
    * (never a self-join that re-evaluates the fingerprint pipeline per
    * side), pair-count aggregation. `maxDf` is the scale valve: a
    * boilerplate fingerprint shared by millions of docs is excluded
    * BEFORE its posting list materializes (df pre-count + semi-join, the
    * [[sharedShingleCounts]] valve ordering). */
  def winnowDedup(docs: DataFrame, k: Int = 3, w: Int = 4,
                  minShared: Int = 2, maxDf: Option[Int] = None): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val fps = TextAnalysis.winnow(docs, k, w)
      .select(col("doc_id"), col("fp")).distinct()
    val eligible = maxDf.fold(fps) { cap =>
      val ok = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= cap).select(col("fp"))
      fps.join(ok, Seq("fp"), "left_semi")
    }
    eligible.groupBy(col("fp"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("i"), col("p.b").as("j"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** L56: cross-source duplicate matrix — the curation report behind
    * source-mix decisions: how many near-dup pairs ([[nearDupMinhash]],
    * banded candidates + exact verify) fall WITHIN each source and
    * BETWEEN each source pair. An unordered (source_a ≤ source_b) key
    * aggregates both directions once. Piggybacks entirely on the bounded
    * near-dup machinery — two dim-sized joins and one tiny aggregate on
    * top. */
  def dupMatrix(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    // the near-dup pair set is dup-rate-proportional and stats-blind:
    // pinned shuffled build against the source dim (both chained joins —
    // a hint binds to its nearest join only)
    nearDupMinhash(docs, threshold = threshold).hint("shuffle_hash")
      .join(src.select(col("doc_id").as("i"), col("source").as("src_i")), "i")
      .hint("shuffle_hash")
      .join(src.select(col("doc_id").as("j"), col("source").as("src_j")), "j")
      .groupBy(least(col("src_i"), col("src_j")).as("source_a"),
        greatest(col("src_i"), col("src_j")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** L54: prefix dedup — documents opening with the IDENTICAL first `k`
    * normalized tokens (the truncation/boilerplate duplicate class: the
    * same article cut at different lengths scores low full-text Jaccard
    * but shares its head verbatim). Key = MD5 of the k-token prefix; docs
    * shorter than `k` tokens cannot assert a prefix and are passed over.
    * First-write-wins canonicalization per group ([[exact]]'s convention).
    * One wide-key shuffle, no joins, no postings — the exact-dedup shape
    * at any corpus size. */
  def prefixDedup(docs: DataFrame, k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val pref = toks
      .select(col("doc_id"),
        when(size(col("toks")) >= k,
          md5(concat_ws(" ", slice(col("toks"), 1, k)))).as("prefix_hash"))
      .filter(col("prefix_hash").isNotNull)
    val w = Window.partitionBy(col("prefix_hash"))
    pref
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select(col("doc_id"), col("prefix_hash"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"),
        col("group_size"))
  }
}
