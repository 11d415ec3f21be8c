package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`): brute-force
  * cosine top-k as the exact baseline, and random-hyperplane LSH for the
  * sub-linear candidate-generation path (bucketed ANN + embedding near-dup).
  *
  * Scale design:
  *  - The brute-force path is a **broadcast linear scan**: the (small) query
  *    set broadcasts to every partition of the (huge) corpus; per-partition
  *    heaps reduce each partition to ≤ k rows per query before the only
  *    shuffle. 100 TB corpus → one pass, no cartesian blow-up, final stage
  *    touches `partitions × k × |Q|` rows.
  *  - The LSH path buckets both sides by hyperplane sign-bands and joins on
  *    the band key — candidates only, tunable recall via bands × bits.
  *  - Cosine is computed with `zip_with`/`aggregate` (codegen'd, sequential
  *    fold) over `array<double>`, which is bit-identical to DuckDB's
  *    `list_cosine_similarity` on `DOUBLE[]` — so oracle checks compare
  *    exact doubles, and rank ordering agrees even for near-ties.
  */
object Similarity {

  /** Cosine similarity of two `array<double>` columns: the native
    * codegen'd [[graft.functions.CosineSimilarity]] expression — one fused
    * loop, no intermediate arrays, accumulation in index order
    * (dot/(√‖a‖·√‖b‖) exactly as DuckDB evaluates it on `DOUBLE[]`). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** Corpus/query frames normalized to `(id, emb array<double>)`. */
  private def prep(embs: DataFrame): DataFrame =
    embs.select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("emb"))

  /** Score every (query, corpus) pair via broadcast — the linear-scan stage
    * shared by the brute-force baseline. Self-matches are dropped. */
  def scoreAll(embs: DataFrame, queries: DataFrame): DataFrame = {
    val corpus = prep(embs)
    val q = prep(queries).select(col("id").as("qid"), col("emb").as("qemb"))
    corpus.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("cid"), cosine(col("qemb"), col("emb")).as("score"))
  }

  /** Exact top-k per query over a scored triple set via the native
    * [[graft.functions.TopKByScore]] aggregate: per-partition bounded
    * k-heaps partial-aggregate map-side, so a billion-candidate query group
    * shuffles k rows, not the group. Ordering is (score desc, cid asc) —
    * fully deterministic; rank is the post-sort position. */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("qid"))
      .agg(graft.functions.TopKByScore(col("score"), col("cid"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("qid"), col("e.id").as("cid"), (col("pos") + 1).cast("int").as("rank"),
        col("e.score").as("score"))

  /** Brute-force exact ANN baseline: broadcast scan + two-phase top-k. */
  def bruteForceTopK(embs: DataFrame, queries: DataFrame, k: Int): DataFrame =
    topKPerQuery(scoreAll(embs, queries), k)

  /** Deterministic random hyperplanes: `bands × bitsPerBand` unit-free
    * gaussian directions from a fixed seed (the LSH family of Charikar'02). */
  private def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Attach LSH band values: `(id, band, bv)` — one row per band per vector.
    * The per-vector sign computation (bands × bits hyperplane dot products)
    * is dense numeric work, done in one typed `flatMap` per row rather than
    * thousands of codegen'd expression nodes. */
  def lshBands(embs: DataFrame, bands: Int, bitsPerBand: Int, seed: Long): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val dim = embs.select(size(col("embedding"))).first().getInt(0)
    val planes = hyperplanes(bands * bitsPerBand, dim, seed)
    val bc = spark.sparkContext.broadcast(planes)
    embs.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .flatMap { case (id, emb) =>
        val ps = bc.value
        (0 until bands).iterator.map { b =>
          var bv = 0
          var t = 0
          while (t < bitsPerBand) {
            val p = ps(b * bitsPerBand + t)
            var dot = 0.0
            var d = 0
            while (d < emb.length) { dot += p(d) * emb(d); d += 1 }
            if (dot >= 0) bv |= (1 << t)
            t += 1
          }
          (id, b, bv)
        }
      }.toDF("id", "band", "bv")
  }

  /** Band width that keeps expected bucket size ≈ 32 vectors for a corpus
    * of `n` — buckets of b vectors cost b² candidate rows, so width must
    * grow with the corpus (log₂ n) for the join to stay near-linear.
    * Ceiling is 30 bits (bucket keys stay in an Int): expected bucket size
    * only exceeds `targetBucket` once the corpus passes
    * `targetBucket · 2³⁰ ≈ 34 B` vectors — and past that, oversized buckets
    * degrade to star pairing in [[embedNearDup]] rather than being
    * dropped. */
  def adaptiveBits(n: Long, targetBucket: Int = 32): Int =
    math.min(30, math.max(2,
      math.ceil(math.log(n.toDouble / targetBucket) / math.log(2)).toInt))

  /** The candidate pair ROWS a banded self-join over these band
    * assignments would shuffle — `Σ df·(df−1)/2` over (band, bv) buckets.
    * One grouped aggregation over the n·bands assignment rows, NO pair
    * expansion: this is the cheap pre-flight that prices a banded join
    * before running it (and the probe telemetry that separates
    * band-rounding candidate mass from irreducible near-dup cluster
    * mass — cluster pairs survive any width, sign-noise pairs halve per
    * added bit). */
  def bandPairBound(cb: DataFrame): Long = {
    val r = cb.groupBy(col("band"), col("bv")).agg(count(lit(1)).as("df"))
      .agg(sum(expr("df * (df - 1) div 2"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Pair-mass-aware band-width valve: widen bands (add bits) from
    * `startBits` until the measured [[bandPairBound]] fits `budget` (or
    * the 30-bit Int ceiling). [[adaptiveBits]] targets an AVERAGE bucket
    * size, which under-prices skewed sign distributions (correlated
    * dimensions keep agreement probability above 2^-bits, so candidate
    * mass can grow super-linearly at a fixed target) — this valve prices
    * the actual corpus instead: each probe step is one linear pass over
    * the n·bands assignments, and the loop is ≤ 30 − startBits steps.
    * Returns (bits, measured bound at those bits). */
  def budgetBits(embs: DataFrame, bands: Int, seed: Long, budget: Long,
                 startBits: Int): (Int, Long) = {
    var bits = startBits
    var bound = bandPairBound(lshBands(embs, bands, bits, seed))
    while (bound > budget && bits < 30) {
      bits += 1
      bound = bandPairBound(lshBands(embs, bands, bits, seed))
    }
    (bits, bound)
  }

  /** Embedding-cosine near-duplicate pairs: hyperplane-LSH candidate
    * generation (docs sharing ≥ 1 sign-band), exact-cosine verification at
    * `threshold`. Candidate-only — never an all-pairs join, and (like every
    * blocking scheme in [[Dedup]]) candidates come from bucket-grouping +
    * in-bucket pair expansion, NOT a banded self-join: a broadcast-hash
    * self-join evaluates the whole `lshBands` hyperplane pipeline once per
    * side. Band width defaults to corpus-adaptive ([[adaptiveBits]]): wider
    * bands on bigger corpora keep bucket joins near-linear, at the usual
    * LSH recall trade-off (raise `bands` to compensate).
    *
    * Bucket-size bound: buckets are counted with a windowed aggregate over
    * the one (band, bv) shuffle — a skewed bucket spills to disk instead of
    * building a driver- or executor-resident array — and buckets larger
    * than `maxBucket` are NOT dropped: they fall back to **star pairing**
    * (every member paired with the bucket's lowest id), so each member
    * still reaches verification through its representative. The trade is
    * explicit: within an oversized bucket, pair recall degrades from
    * all-pairs to connectivity-through-the-representative (non-rep pairs
    * are still found by any other band that separates them). Candidate cost
    * per bucket is therefore min(b², b·maxBucket) — never quadratic in a
    * degenerate bucket.
    *
    * `nHint`: corpus row count, if the caller already knows it — avoids a
    * counting pass (a full scan at 100 TB) otherwise needed for the
    * adaptive band width. The hint is used ONLY for band width, and only
    * when the corpus overflows the verify probe (a probe that fits within
    * `broadcastVerifyMaxRows` IS the exact count). The broadcast-vs-join
    * verify decision always comes from the bounded probe
    * (`limit(max+1).count()`, ≤ `broadcastVerifyMaxRows`+1 rows scanned),
    * so a wrong hint can cost recall tuning but can never collect an
    * unbounded corpus onto the driver. */
  def embedNearDup(embs: DataFrame, threshold: Double = 0.45, bands: Int = 48,
                   bitsPerBand: Int = 0, seed: Long = 42,
                   broadcastVerifyMaxRows: Long = 1L << 19,
                   maxBucket: Int = 4096, nHint: Long = -1L): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    // one bounded probe serves two decisions: ≤ broadcastVerifyMaxRows rows
    // means (a) broadcast-verify is safe and (b) the probe IS the exact
    // corpus count — no separate counting job. Only a corpus that overflows
    // the probe falls back to nHint / a full count for the band width.
    val probeN = math.min(broadcastVerifyMaxRows + 1, Int.MaxValue.toLong).toInt
    val probed = embs.limit(probeN).count()
    val smallCorpus = probed <= broadcastVerifyMaxRows
    val bits =
      if (bitsPerBand > 0) bitsPerBand
      else adaptiveBits(
        if (smallCorpus) probed else if (nHint >= 0) nHint else embs.count())
    // one shuffle on (band, bv): the window marks every row with its
    // bucket's size and canonical member WITHOUT materializing the bucket
    // as an aggregation buffer (WindowExec buffers per-group rows in a
    // spillable array); both branches below reuse the same exchange.
    // EXPLICIT partition count: band rows are tiny in bytes but this stage
    // also runs the in-bucket pair EXPANSION (b² generate per bucket) —
    // AQE's byte-based coalescing would funnel it onto 1-2 tasks.
    val sp = spark.sessionState.conf.numShufflePartitions
    val banded = lshBands(embs, bands, bits, seed)
      .repartition(sp, col("band"), col("bv"))
    val w = Window.partitionBy(col("band"), col("bv"))
    val marked = banded
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("rep", min(col("id")).over(w))
      .filter(col("cnt") >= 2)
    val smallPairs = Dedup.bucketPairs(
      marked.filter(col("cnt") <= maxBucket)
        .groupBy(col("band"), col("bv"))
        .agg(array_sort(collect_list(col("id"))).as("ds")), maxBucket)
    val starPairs = marked
      .filter(col("cnt") > maxBucket && col("id") =!= col("rep"))
      .select(col("rep").as("i"), col("id").as("j"))
    // EXPLICIT partition count for the dedup shuffle: candidate id-pairs
    // are tiny in bytes but each costs a full-vector cosine downstream, so
    // AQE's byte-based coalescing of a plain distinct() funnels the verify
    // stage onto 1-2 tasks (measured: a 2-task 2.1 s serial stage at
    // sf0.1). repartition-by-num is exempt from coalescing and satisfies
    // the dedup aggregate's clustering, so verification keeps full width.
    val cands = smallPairs.unionByName(starPairs)
      .repartition(sp, col("i"), col("j")).dropDuplicates()
    // verify strategy from the bounded probe above, never from nHint: a
    // hint that undercounts a huge corpus must not trigger a full
    // collect() onto the driver
    if (smallCorpus) {
      // low thresholds make banding non-selective (candidates ~ O(pairs)),
      // so verification cost dominates: stream the (i,j) ids through a
      // broadcast of the corpus instead of shipping two dim-sized arrays
      // per pair through a shuffle. Exactly the double ops of `cosine`
      // (sequential fold), so results are bit-identical to the join path.
      val bc = spark.sparkContext.broadcast(
        prep(embs).as[(Long, Array[Double])].collect().toMap)
      cands.as[(Long, Long)].mapPartitions { it =>
        val m = bc.value
        it.flatMap { case (i, j) =>
          val a = m(i); val b = m(j)
          var dot = 0.0; var na = 0.0; var nb = 0.0; var k = 0
          while (k < a.length) {
            dot += a(k) * b(k); na += a(k) * a(k); nb += b(k) * b(k); k += 1
          }
          val c = dot / (math.sqrt(na) * math.sqrt(nb))
          if (c >= threshold) Some((i, j, c)) else None
        }
      }.toDF("i", "j", "cos")
    } else {
      val side = prep(embs)
      cands
        .join(side.select(col("id").as("i"), col("emb").as("ei")), "i")
        .join(side.select(col("id").as("j"), col("emb").as("ej")), "j")
        .withColumn("cos", cosine(col("ei"), col("ej")))
        .filter(col("cos") >= threshold)
        .select("i", "j", "cos")
    }
  }

  /** L80: embedding-space cross-corpus decontamination — the PARAPHRASED
    * contamination class [[Dedup.decontaminate]]'s shared-n-gram gate
    * structurally misses (a reworded benchmark answer shares almost no
    * trigrams with its source but sits next to it in embedding space;
    * EmbedDecontamSpec pins a concrete such pair). The
    * [[Dedup.crossCandidates]] stance applied to hyperplane sign bands:
    * candidate pairs couple a CORPUS vector with a BENCHMARK vector only
    * — never corpus×corpus — so the persisted corpus's in-bucket pair
    * mass (quadratic in corpus duplication) is never materialized, and
    * per-run work is proportional to the corpus's bucket overlap WITH THE
    * BENCHMARK. That property is what makes embedding decontamination
    * affordable when the corpus is 100 TB and the benchmark megabytes.
    * Survivors verify with exact cosine at `threshold`.
    *
    * Same scale valves as [[embedNearDup]]: corpus-adaptive band width
    * (wider bands on bigger corpora keep buckets near-constant), explicit
    * repartition by (band, bv) and by pair key (AQE's byte-based
    * coalescing would funnel the expansion/verify stages onto 1-2 tasks),
    * per-side `maxBucket` caps, and `nHint` to skip the corpus counting
    * pass. Verify re-attaches vectors through two pinned shuffled joins
    * (the candidate frame is post-Generate stats-blind; a hint binds to
    * its NEAREST join only, so the chain re-pins the intermediate).
    *
    * Output: (train_id, eval_id, cos) — every corpus vector within
    * `threshold` of any benchmark vector, the rows a release gate removes. */
  def embedDecontaminate(corpus: DataFrame, bench: DataFrame,
                         threshold: Double = 0.45, bands: Int = 48,
                         bitsPerBand: Int = 0, seed: Long = 42,
                         maxBucket: Int = 4096, nHint: Long = -1L): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // benchmark-sized probe doubles as the empty-bench guard (lshBands
    // needs a dim row; an empty benchmark decontaminates nothing)
    if (bench.select(col("vec_id")).limit(1).collect().isEmpty)
      return Seq.empty[(Long, Long, Double)].toDF("train_id", "eval_id", "cos")
    val bits =
      if (bitsPerBand > 0) bitsPerBand
      else adaptiveBits(if (nHint >= 0) nHint else corpus.count())
    val sp = spark.sessionState.conf.numShufflePartitions
    // both sides banded with the SAME hyperplanes: a θ-close cross pair
    // collides here with exactly embedNearDup's probability
    val banded = lshBands(corpus, bands, bits, seed)
        .withColumn("is_bench", lit(false))
      .unionByName(lshBands(bench, bands, bits, seed)
        .withColumn("is_bench", lit(true)))
      .repartition(sp, col("band"), col("bv"))
    // ONE aggregation pass splits each bucket into its corpus/bench
    // member arrays (collect_list skips the null CASE branch); buckets
    // with no bench member contribute NOTHING — the crossCandidates
    // property, in embedding space
    val crossArr = flatten(transform(col("cs"), c =>
      transform(col("bs"), b => struct(c.as("i"), b.as("j")))))
    val cands = banded.groupBy(col("band"), col("bv"))
      .agg(
        array_sort(collect_list(when(!col("is_bench"), col("id")))).as("cs"),
        array_sort(collect_list(when(col("is_bench"), col("id")))).as("bs"))
      .filter(size(col("bs")) >= 1 && size(col("cs")) >= 1 &&
        size(col("bs")) <= maxBucket && size(col("cs")) <= maxBucket)
      .select(explode(crossArr).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"))
      .repartition(sp, col("i"), col("j")).dropDuplicates()
    val ce = prep(corpus)
    val be = prep(bench)
    cands.hint("shuffle_hash")
      .join(ce.select(col("id").as("i"), col("emb").as("ei")), "i")
      .hint("shuffle_hash")
      .join(be.select(col("id").as("j"), col("emb").as("ej")), "j")
      .withColumn("cos", cosine(col("ei"), col("ej")))
      .filter(col("cos") >= threshold)
      .select(col("i").as("train_id"), col("j").as("eval_id"), col("cos"))
  }

  /** Scalar int8 quantization of the embedding column — the storage/IO
    * scale path (4× smaller than float32, 8× than float64; at 100 TB the
    * scan is usually IO-bound, so this is a 4× scan speedup for coarse
    * stages that re-rank survivors at full precision). Per-vector absmax
    * scaling: `q_i = round(x_i / absmax · 127)`, `scale = absmax / 127`,
    * dequantization error ≤ scale/2 per component. Pure column algebra with
    * exact DuckDB parity (round is half-away-from-zero in both engines).
    * All-zero vectors quantize to all-zero with scale 0 — without the guard
    * 0/0 = NaN and `round(NaN).cast("int")` THROWS under ANSI mode (Spark 4
    * default) instead of producing a row. */
  def quantizeInt8(embs: DataFrame): DataFrame = {
    val v = col("embedding").cast("array<double>")
    embs
      .withColumn("absmax", array_max(transform(v, x => abs(x))))
      .select(col("vec_id"), (col("absmax") / 127).as("scale"),
        transform(v, x =>
          when(col("absmax") === 0, lit(0))
            .otherwise(round(x / col("absmax") * 127).cast("int"))).as("q"))
  }

  /** Two-phase quantized ANN: int8 coarse scan + exact re-rank — the
    * IO-bound 100 TB path where [[quantizeInt8]] earns its 4-8× scan
    * reduction. Coarse scores are the cosine of the QUANTIZED vectors
    * (int components cast to double: exact in IEEE, so coarse ranking is
    * bit-reproducible across engines); the top `candFactor·k` per query by
    * (coarse score, cid) then re-rank at full precision. Recall depends on
    * the corpus's score spread vs int8 noise (~1/127 per component):
    * clustered real embeddings need small factors; near-isotropic synthetic
    * corpora (tight score spread) need larger ones — same caveat as IVF
    * nprobe. Both phases are broadcast linear scans with
    * [[graft.functions.TopKByScore]] partial-agg heaps: no shuffle wider
    * than partitions × candidates. */
  def quantizedTopK(embs: DataFrame, queries: DataFrame, k: Int,
                    candFactor: Int = 10): DataFrame = {
    val c8 = quantizeInt8(embs)
      .select(col("vec_id").as("cid"), col("q").cast("array<double>").as("e8"))
    val q8 = quantizeInt8(queries)
      .select(col("vec_id").as("qid"), col("q").cast("array<double>").as("q8"))
    val coarse = c8.crossJoin(broadcast(q8))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), cosine(col("q8"), col("e8")).as("score"))
    val cands = topKPerQuery(coarse, candFactor * k).select(col("qid"), col("cid"))
    val corpus = prep(embs).select(col("id").as("cid"), col("emb"))
    val qv = prep(queries).select(col("id").as("qid"), col("emb").as("qemb"))
    // candidate list = |queries|·candFactor·k rows — query-set-scale,
    // stats-blind: pinned shuffled build against the corpus side
    val exact = cands.hint("shuffle_hash")
      .join(corpus, "cid")
      .join(broadcast(qv), "qid")
      .select(col("qid"), col("cid"), cosine(col("qemb"), col("emb")).as("score"))
    topKPerQuery(exact, k)
  }

  /** L65: PQ codebooks — classic product quantization (Jégou et al., PAMI
    * 2011): L2-normalize, split into `m` subspaces, train `k` L2-k-means
    * centroids PER subspace on the [[ivfCentroids]]-style bounded driver
    * sample (first-k init in id order, `iters` Lloyd steps, empty clusters
    * keep their centroid, argmin ties to the lowest index — fully
    * deterministic). At 100 TB the codebooks are still m·k·(dim/m) doubles
    * trained on a bounded sample and broadcast. */
  def pqCodebooks(embs: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 5,
                  sampleSize: Int = 4096): Array[Array[Array[Double]]] = {
    val spark = embs.sparkSession
    import spark.implicits._
    val sample = prep(embs).orderBy(col("id")).limit(sampleSize)
      .as[(Long, Array[Double])].collect().map(v => normL2(v._2))
    trainSubspaceBooks(sample, m, k, iters)
  }

  /** The shared per-subspace L2-k-means trainer behind [[pqCodebooks]]
    * (trained on normalized vectors) and [[ivfPqTopK]] (trained on coarse
    * RESIDUALS): first-k init in input order, `iters` Lloyd steps, empty
    * clusters keep their centroid, argmin ties to the lowest index —
    * fully deterministic for a fixed sample. */
  private def trainSubspaceBooks(sample: Array[Array[Double]], m: Int,
                                 k: Int, iters: Int): Array[Array[Array[Double]]] = {
    require(sample.length >= k, s"sample ${sample.length} smaller than k=$k")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    Array.tabulate(m) { s =>
      val vs = sample.map(_.slice(s * sub, (s + 1) * sub))
      var cents = vs.take(k).map(_.clone)
      for (_ <- 0 until iters) {
        val sums = Array.fill(k)(new Array[Double](sub))
        val counts = new Array[Int](k)
        vs.foreach { v =>
          val c = nearestL2(v, cents)
          counts(c) += 1
          var d = 0; while (d < sub) { sums(c)(d) += v(d); d += 1 }
        }
        cents = Array.tabulate(k)(c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
      }
      cents
    }
  }

  private def normL2(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Argmin L2² over centroids, lowest index on ties. */
  private def nearestL2(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d2 = 0.0; var d = 0
      while (d < v.length) { val t = v(d) - cents(c)(d); d2 += t * t; d += 1 }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  /** Encode each vector as `m` codebook indices (the 100 TB storage win:
    * m·log2(k) bits per vector instead of dim floats). Broadcast books,
    * per-partition loops — the [[ivfAssign]] shape. */
  def pqEncode(embs: DataFrame, books: Array[Array[Array[Double]]]): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(books)
    val m = books.length
    embs.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, emb) =>
        val bs = bc.value
        val v = normL2(emb.map(_.toDouble))
        val sub = v.length / m
        (id, Array.tabulate(m)(s => nearestL2(v.slice(s * sub, (s + 1) * sub), bs(s))))
      }.toDF("cid", "codes")
  }

  /** PQ ANN: asymmetric-distance coarse scoring + exact re-rank. Per
    * partition, each query's m×k inner-product lookup tables against the
    * broadcast codebooks are built ONCE (`dot(q̂_s, centroid)` — since
    * corpus vectors were normalized before encoding, Σ_s table[s][code_s]
    * approximates the true cosine); a corpus vector then costs m table
    * lookups instead of dim multiplies. Top `candFactor·k` approximate
    * candidates per query re-rank at full precision — the
    * [[quantizedTopK]] contract: recall tuned by candFactor, exactness
    * restored by the re-rank (verified exhaustive at oracle SF). */
  def pqTopK(embs: DataFrame, queries: DataFrame, k: Int, m: Int = 8,
             kCent: Int = 16, candFactor: Int = 40, iters: Int = 5): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val books = pqCodebooks(embs, m, kCent, iters)
    val codes = pqEncode(embs, books)
    val qs = prep(queries).as[(Long, Array[Double])].collect()
      .map { case (id, v) => (id, normL2(v)) }
    require(qs.length <= 65536, s"query side too large to broadcast: ${qs.length}")
    val bcBooks = spark.sparkContext.broadcast(books)
    val bcQs = spark.sparkContext.broadcast(qs)
    val approx = codes.as[(Long, Array[Int])]
      .mapPartitions { it =>
        val bs = bcBooks.value
        val sub = bs(0)(0).length
        // per-partition: build every query's m×k dot tables once
        val tables = bcQs.value.map { case (qid, qv) =>
          (qid, Array.tabulate(bs.length) { s =>
            bs(s).map { cent =>
              var dot = 0.0; var d = 0
              while (d < sub) { dot += qv(s * sub + d) * cent(d); d += 1 }
              dot
            }
          })
        }
        it.flatMap { case (cid, cs) =>
          tables.iterator.collect { case (qid, t) if qid != cid =>
            var s = 0; var sum = 0.0
            while (s < cs.length) { sum += t(s)(cs(s)); s += 1 }
            (qid, cid, sum)
          }
        }
      }.toDF("qid", "cid", "score")
    val cands = topKPerQuery(approx, candFactor * k).select(col("qid"), col("cid"))
    val corpus = prep(embs).select(col("id").as("cid"), col("emb"))
    val qv = prep(queries).select(col("id").as("qid"), col("emb").as("qemb"))
    // candidate list = |queries|·candFactor·k rows — query-set-scale,
    // stats-blind: pinned shuffled build against the corpus side
    val exact = cands.hint("shuffle_hash")
      .join(corpus, "cid")
      .join(broadcast(qv), "qid")
      .select(col("qid"), col("cid"), cosine(col("qemb"), col("emb")).as("score"))
    topKPerQuery(exact, k)
  }

  /** Train an IVF coarse quantizer: spherical k-means on a deterministic
    * corpus sample, driver-side (k·dim doubles; the standard approach — at
    * 100 TB the quantizer is still trained on a bounded sample and
    * broadcast). Init = first k sample vectors by id; `iters` Lloyd steps
    * with cosine assignment; empty clusters keep their previous centroid.
    * Fully deterministic for a fixed corpus. */
  def ivfCentroids(embs: DataFrame, k: Int, iters: Int = 5,
                   sampleSize: Int = 4096): Array[Array[Double]] = {
    val spark = embs.sparkSession
    import spark.implicits._
    val sample = prep(embs).orderBy(col("id")).limit(sampleSize)
      .as[(Long, Array[Double])].collect().map(_._2)
    ivfCentroidsFromSample(sample, k, iters)
  }

  /** [[ivfCentroids]] on an already-collected sample — callers that also
    * need the sample for other training (IVF-PQ residuals) collect once. */
  private def ivfCentroidsFromSample(sample: Array[Array[Double]], k: Int,
                                     iters: Int): Array[Array[Double]] = {
    require(sample.length >= k, s"sample ${sample.length} smaller than k=$k")
    def norm(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    var centroids = sample.take(k).map(norm)
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](sample.head.length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val nv = norm(v)
        var best = 0; var bestDot = Double.MinValue
        for (c <- 0 until k) {
          var dot = 0.0; var d = 0
          while (d < nv.length) { dot += nv(d) * centroids(c)(d); d += 1 }
          if (dot > bestDot) { bestDot = dot; best = c }
        }
        counts(best) += 1
        var d = 0
        while (d < nv.length) { sums(best)(d) += nv(d); d += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old else norm(sums(c))
      }
    }
    centroids
  }

  /** Assign ids to their `nearest` centroid lists (nearest = 1 for corpus
    * inverted lists, > 1 for query multi-probe). */
  def ivfAssign(embs: DataFrame, centroids: Array[Array[Double]],
                nearest: Int): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    embs.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .flatMap { case (id, emb) =>
        val cs = bc.value
        val scored = cs.indices.map { c =>
          var dot = 0.0; var nn = 0.0; var d = 0
          while (d < emb.length) {
            dot += cs(c)(d) * emb(d); nn += emb(d).toDouble * emb(d); d += 1
          }
          (c, dot / math.sqrt(nn))
        }
        scored.sortBy { case (c, s) => (-s, c) }.take(nearest)
          .iterator.map { case (c, _) => (id, c) }
      }.toDF("id", "list")
  }

  /** IVF ANN: corpus vectors land in one inverted list each; a query probes
    * its `nprobe` nearest lists and ranks only those lists' members with
    * exact cosine. Probing more lists trades latency for recall — at
    * `nprobe = nLists` this degrades to the exact scan. */
  def ivfTopK(embs: DataFrame, queries: DataFrame, k: Int, nLists: Int = 16,
              nprobe: Int = 8, iters: Int = 5): DataFrame = {
    val centroids = ivfCentroids(embs, nLists, iters)
    val corpusLists = ivfAssign(embs, centroids, nearest = 1)
    val queryLists = ivfAssign(queries, centroids, nearest = nprobe)
      .select(col("id").as("qid"), col("list"))
    val cands = corpusLists.join(queryLists, Seq("list"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("cid"))
      .distinct()
    val corpus = prep(embs)
    val q = prep(queries).select(col("id").as("qid"), col("emb").as("qemb"))
    val scored = cands
      .join(corpus.select(col("id").as("cid"), col("emb")), "cid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("cid"), cosine(col("qemb"), col("emb")).as("score"))
    topKPerQuery(scored, k)
  }

  /** IVF-PQ ANN (the FAISS IVFADC shape, Jégou et al. PAMI 2011 §III):
    * the coarse quantizer routes each vector to an inverted list, and PQ
    * codes quantize the RESIDUAL v̂ − c(v̂) against the list's centroid —
    * residual energy is a fraction of vector energy, so the same m·log2(k)
    * bits carry far more precision than whole-vector PQ at equal recall;
    * this is the production 100 TB composition of [[ivfTopK]] + [[pqTopK]],
    * reusing [[ivfCentroids]]/[[ivfAssign]] and the PQ subspace trainer
    * verbatim.
    *
    * Query path: probe the `nprobe` nearest lists; score each probed
    * list's members by asymmetric distance — `q̂·c(list)` (per-list
    * offset) + Σ_s table_s[code_s] where table_s = q̂_s · book_s (built
    * once per query driver-side: queries are the bounded broadcast side);
    * exact cosine re-ranks the top `candFactor·k` — recall tuned by
    * (nprobe, candFactor), exactness restored by the re-rank.
    *
    * Scale shape: codebooks + centroids + query tables are broadcast
    * (m·k·dim/m + nLists·dim + Q·m·k doubles); the corpus is touched ONCE
    * to encode (then carries m bytes/vector); candidate generation is the
    * list join (corpus side pre-partitioned by list), and only the
    * candFactor·k re-rank rows ever ship full vectors. */
  def ivfPqTopK(embs: DataFrame, queries: DataFrame, k: Int, nLists: Int = 16,
                nprobe: Int = 8, m: Int = 8, kCent: Int = 16,
                candFactor: Int = 40, iters: Int = 5,
                sampleSize: Int = 4096): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    // ONE sample collect feeds both trainers (the global orderBy+limit is
    // the dominant setup scan — don't pay it twice)
    val rawSample = prep(embs).orderBy(col("id")).limit(sampleSize)
      .as[(Long, Array[Double])].collect().map(_._2)
    val centroids = ivfCentroidsFromSample(rawSample, nLists, iters)
    // residual codebooks: the SAME deterministic bounded sample as
    // pqCodebooks, each vector replaced by its coarse residual
    val sample = rawSample.map { v =>
      val nv = normL2(v)
      val c = centroids(nearestCos(nv, centroids))
      Array.tabulate(nv.length)(d => nv(d) - c(d))
    }
    val books = trainSubspaceBooks(sample, m, kCent, iters)
    val bcC = spark.sparkContext.broadcast(centroids)
    val bcB = spark.sparkContext.broadcast(books)
    // corpus: ONE pass — list assignment + residual PQ codes
    val codes = embs.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, emb) =>
        val cs = bcC.value; val bs = bcB.value
        val v = normL2(emb.map(_.toDouble))
        val list = nearestCos(v, cs)
        val r = Array.tabulate(v.length)(d => v(d) - cs(list)(d))
        val sub = v.length / bs.length
        (id, list,
          Array.tabulate(bs.length)(s =>
            nearestL2(r.slice(s * sub, (s + 1) * sub), bs(s))))
      }.toDF("cid", "list", "codes")
    val queryLists = ivfAssign(queries, centroids, nearest = nprobe)
      .select(col("id").as("qid"), col("list"))
    // per-query ADC tables + per-(query, list) offsets, driver-built on
    // the bounded query side and broadcast
    val qs = prep(queries).as[(Long, Array[Double])].collect()
      .map { case (id, v) => (id, normL2(v)) }
    require(qs.length <= 65536, s"query side too large to broadcast: ${qs.length}")
    val sub = centroids.head.length / m
    val tables: Map[Long, (Array[Array[Double]], Array[Double])] = qs.map {
      case (qid, qv) =>
        val t = Array.tabulate(m) { s =>
          books(s).map { cent =>
            var dot = 0.0; var d = 0
            while (d < sub) { dot += qv(s * sub + d) * cent(d); d += 1 }
            dot
          }
        }
        val off = centroids.map { c =>
          var dot = 0.0; var d = 0
          while (d < qv.length) { dot += qv(d) * c(d); d += 1 }
          dot
        }
        qid -> ((t, off))
    }.toMap
    val bcT = spark.sparkContext.broadcast(tables)
    val approx = codes.join(queryLists, Seq("list"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), col("list"), col("codes"))
      .as[(Long, Long, Int, Array[Int])]
      .mapPartitions { it =>
        val ts = bcT.value
        it.map { case (qid, cid, list, cs) =>
          val (t, off) = ts(qid)
          var s = 0; var sum = off(list)
          while (s < cs.length) { sum += t(s)(cs(s)); s += 1 }
          (qid, cid, sum)
        }
      }.toDF("qid", "cid", "score")
    val cands = topKPerQuery(approx, candFactor * k).select(col("qid"), col("cid"))
    val corpus = prep(embs).select(col("id").as("cid"), col("emb"))
    val qv = prep(queries).select(col("id").as("qid"), col("emb").as("qemb"))
    // candidate list = |queries|·candFactor·k rows — query-set-scale,
    // stats-blind: pinned shuffled build against the corpus side
    val exact = cands.hint("shuffle_hash")
      .join(corpus, "cid")
      .join(broadcast(qv), "qid")
      .select(col("qid"), col("cid"), cosine(col("qemb"), col("emb")).as("score"))
    topKPerQuery(exact, k)
  }

  /** Argmax cosine (= dot against the normalized centroids) over
    * `centroids` for a normalized vector, lowest index on ties — the
    * driver-side twin of [[ivfAssign]]'s per-row loop. */
  private def nearestCos(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestDot = Double.MinValue
    var c = 0
    while (c < cents.length) {
      var dot = 0.0; var d = 0
      while (d < v.length) { dot += v(d) * cents(c)(d); d += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  /** LSH-bucketed ANN: candidates = corpus vectors sharing ≥ 1 band with the
    * query, then exact cosine + top-k among candidates only. With generous
    * banding (the default 96 × 3 bits) recall is ≈ 1 even for mid-similarity
    * neighbors; production would trade bands down for speed. */
  def lshTopK(embs: DataFrame, queries: DataFrame, k: Int, bands: Int = 96,
              bitsPerBand: Int = 3, seed: Long = 42): DataFrame = {
    val cb = lshBands(embs, bands, bitsPerBand, seed)
    val qb = lshBands(queries, bands, bitsPerBand, seed)
      .select(col("id").as("qid"), col("band"), col("bv"))
    val cands = cb.join(qb, Seq("band", "bv"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("cid"))
      .distinct()
    val corpus = prep(embs)
    val q = prep(queries).select(col("id").as("qid"), col("emb").as("qemb"))
    val scored = cands
      .join(corpus.select(col("id").as("cid"), col("emb")), "cid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("cid"), cosine(col("qemb"), col("emb")).as("score"))
    topKPerQuery(scored, k)
  }

  /** L39: fully-distributed deterministic k-means document clustering
    * (Lloyd's) over the embedding column — the corpus-organization step of a
    * training-data pipeline (topic balancing, cluster-based dedup/sampling a
    * la SemDeDup). Unlike [[ivfCentroids]] (sample-trained, driver-side),
    * every step here runs over the FULL corpus as DataFrame jobs:
    *
    *  - init: the `k` vectors with the smallest `(hash60(id), id)` — a pure
    *    function of the corpus (no RNG), fetched with a TakeOrdered top-k,
    *    never a global sort;
    *  - assign: broadcast the k centroids (k·dim doubles), score with the
    *    sequential-fold [[cosine]], pick argmax with `(score DESC, cid ASC)`
    *    tie-break — embarrassingly parallel scan;
    *  - recompute: per-dimension EXACT decimal sums via posexplode +
    *    map-side-combined hash aggregate (one shuffle of n·dim skinny rows
    *    per iteration, the linear-cost heart of distributed Lloyd), mean =
    *    one IEEE division of exact operands — so the centroids are
    *    independent of partial-aggregation order and bit-reproducible on any
    *    engine; empty clusters keep their previous centroid.
    *
    * Between iterations only the k centroid rows land on the driver
    * (bounded: k·dim doubles, same contract as [[ivfCentroids]]'s
    * broadcast). Vectors snap to the 6-dp grid up front so the decimal sums
    * are exact by construction.
    *
    * Returns one row per document: `(id, cluster, score)` under the final
    * centroids. Fixed `iters` unrolled — reproducible plan, CTE-unrollable
    * oracle. */
  def kmeansAssign(embs: DataFrame, k: Int, iters: Int = 2): DataFrame = {
    val (vecs, centroids, assign) = kmeansTrain(embs, k, iters)
    assign(centroids)
      .select(col("id"), col("cid").as("cluster"),
        round(col("score"), 6).as("score"))
  }

  /** The Lloyd training loop behind [[kmeansAssign]]/[[silhouette]]:
    * returns the 6-dp-snapped vectors, the FINAL centroids, and the
    * argmax-assignment function (see kmeansAssign's scaladoc for the
    * scale/determinism contract). */
  private def kmeansTrain(embs: DataFrame, k: Int, iters: Int)
      : (DataFrame, Array[(Int, Array[Double])],
         Array[(Int, Array[Double])] => DataFrame) = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = embs.sparkSession
    import spark.implicits._
    val vecs = embs.select(col("vec_id").as("id"),
      transform(col("embedding").cast("array<double>"), x => round(x, 6)).as("v"))

    def centroidDf(cs: Array[(Int, Array[Double])]): DataFrame =
      broadcast(cs.toSeq.toDF("cid", "c"))

    // assignment under a given centroid set: argmax cosine with a
    // (score DESC, cid ASC) tie-break. max_by over struct(score, -cid) is a
    // declarative aggregate — partial aggregation reduces each partition to
    // one row per id BEFORE the shuffle, where a row_number window would
    // shuffle all n·k scored rows
    def assign(cents: Array[(Int, Array[Double])]): DataFrame =
      vecs.crossJoin(centroidDf(cents))
        .withColumn("score", cosine(col("v"), col("c")))
        .groupBy(col("id"))
        .agg(max_by(struct(col("cid"), col("score"), col("v")),
          struct(col("score"), (-col("cid")).as("t"))).as("b"))
        .select(col("id"), col("b.v").as("v"), col("b.cid").as("cid"),
          col("b.score").as("score"))

    // init: k smallest (hash60(id), id) — TakeOrdered, then number the k
    // survivors (the window runs over k rows, not the corpus)
    val wInit = Window.orderBy(col("h"), col("id"))
    var centroids: Array[(Int, Array[Double])] = vecs
      .withColumn("h", graft.operators.TextOps.hash60(col("id").cast("string")))
      .orderBy(col("h"), col("id")).limit(k)
      .withColumn("cid", row_number().over(wInit) - 1)
      .select(col("cid"), col("v"))
      .as[(Int, Array[Double])].collect()

    for (_ <- 0 until iters) {
      val means = assign(centroids)
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg((sum(col("x").cast("decimal(27,6)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("c"))
        .as[(Int, Array[Double])].collect().toMap
      // empty clusters keep their previous centroid
      centroids = centroids.map { case (cid, old) =>
        (cid, means.getOrElse(cid, old))
      }
    }
    (vecs, centroids, assign)
  }

  /** L55: simplified silhouette — per-cluster clustering-quality score
    * from CENTROID distances only (Hruschka et al.'s simplification: the
    * classic silhouette's per-point mean pairwise distances are Ω(n²);
    * against centroids it is one broadcast scan). With cosine distance
    * `1 − cos`, a point's own-cluster distance uses its BEST centroid and
    * the alternative its SECOND-best, so
    * `s = (best − second) / (1 − second)` (0 when the denominator is 0) —
    * s ∈ [0, 1], higher = better separated. Per-point top-2 comes from the
    * bounded [[graft.functions.TopKByScore]] partial aggregate; per-cluster
    * means use the sign-aware integer HALF_UP division (a 6-dp sum over an
    * integer count is the recorded round()-tie class). */
  def silhouette(embs: DataFrame, k: Int, iters: Int = 2): DataFrame = {
    val (vecs, centroids, _) = kmeansTrain(embs, k, iters)
    val spark = embs.sparkSession
    import spark.implicits._
    val scored = vecs.crossJoin(broadcast(centroids.toSeq.toDF("cid", "c")))
      .withColumn("score", cosine(col("v"), col("c")))
    val top2 = scored.groupBy(col("id"))
      // TopKByScore's id slot is long-typed; its (score DESC, id ASC)
      // tie-break matches the assignment argmax's (score, −cid) max_by
      .agg(graft.functions.TopKByScore(col("score"), col("cid").cast("long"), 2).as("t"))
      .select(col("id"),
        col("t").getItem(0).getField("id").as("cluster"),
        col("t").getItem(0).getField("score").as("best"),
        col("t").getItem(1).getField("score").as("second"))
    top2
      .withColumn("s6",
        when(lit(1.0) - col("second") =!= 0.0,
          round((col("best") - col("second")) / (lit(1.0) - col("second")), 6))
          .otherwise(lit(0.0)).cast("decimal(18,6)"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        (sum(col("s6")) * 1000000).cast("long").as("micro"))
      .select(col("cluster"), col("n"),
        (expr("CASE WHEN micro >= 0 THEN (micro * 2 + n) div (2 * n)" +
          " ELSE -(((-micro) * 2 + n) div (2 * n)) END")
          .cast("double") / 1000000.0).as("mean_sil"))
  }

  /** L41: semantic deduplication (SemDeDup, Abbas et al. 2023) — the step
    * [[kmeansAssign]] exists to enable: embedding-similar documents are
    * near-duplicates in MEANING even when no n-gram overlaps, and the
    * cluster structure bounds the candidate space so no all-pairs join ever
    * runs. A document is dropped when an earlier (lower-id) document in the
    * SAME cluster has cosine ≥ `threshold` — first-wins, the house dedup
    * convention, independent of whether the earlier doc itself survives
    * (the paper's semantics: similarity to ANY earlier doc suffices).
    *
    * Scale: one equi-join shuffle on the cluster key; within a cluster the
    * pairing is O(m²) cosines — the SemDeDup tradeoff, controlled by
    * growing k with the corpus so E[m] = n/k stays bounded. Because a
    * silently-oversized cluster would quadratically blow up an executor,
    * cluster sizes above `maxClusterSize` fail fast (the cap-throws rule:
    * truncation is never silent).
    *
    * Returns every document: `(id, cluster, keep)`. */
  def semanticDedup(embs: DataFrame, k: Int, iters: Int = 2,
                    threshold: Double = 0.45,
                    maxClusterSize: Long = 1000000L): DataFrame = {
    // materialize the slim (id, cluster) assignment ONCE: it feeds three
    // plan branches (pair-join x side, y side, final keep join), and the
    // one-sided inferred-isnotnull asymmetry defeats ReusedExchange on
    // self-joins (the recorded round-8 lesson) — without this the full
    // assignment scan would run three times
    val asg = kmeansAssign(embs, k, iters)
      .select(col("id"), col("cluster")).localCheckpoint()
    val vecs = embs.select(col("vec_id").as("id"),
      transform(col("embedding").cast("array<double>"), x => round(x, 6)).as("v"))
    // the guard must sit in a FILTER: a guarded-then-dropped column gets
    // column-pruned and the raise_error silently vanishes with it
    val sized = asg.join(vecs, "id")
      .withColumn("_m", count(lit(1)).over(Window.partitionBy(col("cluster"))))
      .filter(assert_true(col("_m") <= maxClusterSize, concat(
        lit(s"cluster larger than $maxClusterSize — raise k: "),
        col("cluster").cast("string"))).isNull)
      .drop("_m")
    val dropped = sized.as("x")
      .join(sized.as("y"),
        col("x.cluster") === col("y.cluster") && col("x.id") < col("y.id"))
      .filter(cosine(col("x.v"), col("y.v")) >= threshold)
      .select(col("y.id").as("id")).distinct()
    asg.join(dropped.withColumn("_drop", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cluster"), col("_drop").isNull.as("keep"))
  }

  /** L42: cluster-balanced (diversity) sampling — at most `maxPerCluster`
    * docs per k-means cluster, admitted in id-hash order. The topic-balance
    * counterpart of [[graft.operators.CorpusPrep.sourceQuota]]: quotas by
    * LEARNED clusters instead of a metadata column, which is how dominant
    * topics (boilerplate, templates) get capped when no source label
    * betrays them. Same scale shape as sourceQuota: the per-cluster cut is
    * a `TopKByScore` partial aggregate (≤ m rows per partition per cluster
    * cross the shuffle — never a window over the corpus), on top of
    * [[kmeansAssign]]'s assignment scan. */
  def clusterSample(embs: DataFrame, k: Int, iters: Int = 2,
                    maxPerCluster: Int = 32): DataFrame =
    kmeansAssign(embs, k, iters)
      .withColumn("hscore",
        expr("cast(conv(substring(md5(cast(id as string)), 1, 15), 16, 10) as bigint) div 128")
          .cast("double"))
      .groupBy(col("cluster"))
      .agg(graft.functions.TopKByScore(col("hscore"), col("id"), maxPerCluster).as("top"))
      .select(col("cluster"), posexplode(col("top")))
      .select(col("cluster"), (col("pos") + 1).cast("int").as("rk"),
        col("col.id").as("id"))

  /** L52: per-dimension corpus standardization of the embedding column —
    * the feature-normalization pass ahead of k-means/ANN (a distance metric
    * dominated by one high-variance dimension ruins both). Values snap to
    * the 6-dp grid so the per-dimension mean/variance moments are EXACT
    * decimal sums (population variance; partial-aggregation-order-proof);
    * the z-score itself is one fixed IEEE chain. A constant dimension
    * (sd = 0) standardizes to 0. Shape at 100 TB: one skinny
    * (dim, n, Σv, Σv²) aggregate of n·64 rows, a 64-row broadcast back —
    * no corpus-sized shuffle, no driver materialization. */
  def standardize(embs: DataFrame): DataFrame = {
    val ex = embs
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
      .withColumn("v6", round(col("v"), 6).cast("decimal(18,6)"))
    val stats = ex.groupBy(col("dim")).agg(
      count(lit(1)).as("n"),
      sum(col("v6")).as("s"),
      // (18,6)×(19,6) → precision EXACTLY 38, scale 12 — no precision
      // adjustment; a (19,6)×(19,6) product needs 39 and Spark rounds the
      // scale down to 11, corrupting the 12th decimal (measured: 1/32000
      // z-scores off by 1e-6 against the exact oracle)
      sum(col("v6") * col("v6").cast("decimal(19,6)")).as("ss"))
    val mean = col("s").cast("double") / col("n")
    val variance = col("ss").cast("double") / col("n") - mean * mean
    val withM = stats.select(col("dim"), col("n"), mean.as("mean"),
      sqrt(greatest(variance, lit(0.0))).as("sd"))
    ex.join(broadcast(withM), "dim")
      .select(col("vec_id"), col("dim"),
        when(col("sd") > 0, (col("v6").cast("double") - col("mean")) / col("sd"))
          .otherwise(lit(0.0)).as("z"))
  }

  /** L57: embedding-norm outlier screen — the broken-embedding detector
    * (truncated vectors, double-encoded text, collapsed models all betray
    * themselves in the L2 norm before any similarity does). Per-vector
    * norm² is an EXACT decimal sum of 6-dp-grid squares; the norm snaps
    * back to the grid, global mean/sd use the [[standardize]] moment
    * discipline, and `z = (norm − mean)/sd` is one identical float chain.
    * Shape at 100 TB: one skinny per-vector scan, a ONE-ROW global-moment
    * broadcast, shuffle-free scoring. */
  def normOutliers(embs: DataFrame, zThresh: Double = 3.0): DataFrame = {
    require(zThresh > 0, s"zThresh must be positive, got $zThresh")
    val norms = embs
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
      .withColumn("v6", round(col("v"), 6).cast("decimal(18,6)"))
      .groupBy(col("vec_id"))
      .agg(sum(col("v6") * col("v6").cast("decimal(19,6)")).as("ss"))
      .select(col("vec_id"),
        round(sqrt(col("ss").cast("double")), 6).cast("decimal(18,6)").as("n6"))
    val stats = norms.agg(
      count(lit(1)).as("n"),
      sum(col("n6")).as("s"),
      sum(col("n6") * col("n6").cast("decimal(19,6)")).as("ss2"))
    val mean = col("s").cast("double") / col("n")
    val sd = sqrt(greatest(col("ss2").cast("double") / col("n") - mean * mean, lit(0.0)))
    norms.crossJoin(broadcast(stats.select(mean.as("mean"), sd.as("sd"))))
      .select(col("vec_id"), col("n6").cast("double").as("norm"),
        when(col("sd") > 0, (col("n6").cast("double") - col("mean")) / col("sd"))
          .otherwise(lit(0.0)).as("z"))
      .withColumn("is_outlier", abs(col("z")) > zThresh)
  }

  /** L59: top principal direction of the embedding corpus by POWER
    * ITERATION — the dominant axis of the (uncentered) second-moment
    * matrix `ΣxxT`, the spectral summary behind whitening, ABTT
    * ("all-but-the-top") post-processing and anisotropy diagnostics.
    * Fully distributed: each iteration is `v ← normalize(X^T (X v))` as
    * TWO skinny aggregates — per-doc dots (groupBy vec_id), per-dim
    * back-projection (groupBy dim) — with only the 64-value direction on
    * the driver between iterations (the [[kmeansAssign]] centroid
    * contract; never a gram matrix, never a collect of the corpus).
    *
    * ENGINE-PORTABLE NUMERICS: vectors and the carried direction live on
    * the 6-dp grid, so every matvec product/sum is EXACT decimal
    * ((18,6)×(19,6) — width 38, no precision adjustment); dots and
    * back-projections snap to the grid before reuse, the norm is an exact
    * decimal Σy² cast once to double, and the only float ops are the
    * sqrt/divide of the normalize step — one identical chain per
    * iteration, replayed verbatim by the unrolled-CTE oracle. Init
    * `v₀ = 1/8` (exact on the grid) — deterministic, no RNG. Sign is
    * pinned by the iteration itself (same arithmetic ⇒ same sign). */
  def powerIteration(embs: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = embs.sparkSession
    import spark.implicits._
    val ex = embs
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim"),
        round(col("v"), 6).cast("decimal(18,6)").as("x6"))
      .localCheckpoint() // reused 2·iters times; truncate the re-read lineage
    def dec(d: Double): BigDecimal =
      BigDecimal.decimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // dimensionality from the data, not a constant: a mismatched corpus
    // must error rather than silently iterate a truncated/zero-padded block
    val dimRow = embs.agg(
      min(size(col("embedding"))), max(size(col("embedding")))).head()
    val (minD, maxD) = (dimRow.getInt(0), dimRow.getInt(1))
    require(minD == maxD && maxD >= 1,
      s"embedding dimensionality must be uniform and >= 1, got min=$minD max=$maxD")
    val dims = 0 until maxD
    var v: Map[Int, BigDecimal] = dims.map(_ -> BigDecimal("0.125")).toMap
    for (_ <- 0 until iters) {
      val vDf = broadcast(v.toSeq.map { case (d, x) => (d, x) }
        .toDF("dim", "vd").select(col("dim"), col("vd").cast("decimal(18,6)")))
      val dots = ex.join(vDf, "dim")
        .groupBy(col("vec_id"))
        .agg(sum(col("x6") * col("vd").cast("decimal(19,6)")).as("dotd"))
        .select(col("vec_id"),
          round(col("dotd").cast("double"), 6).cast("decimal(18,6)").as("dot6"))
      val ys = ex.join(dots, "vec_id")
        .groupBy(col("dim"))
        .agg(sum(col("x6") * col("dot6").cast("decimal(19,6)")).as("yd"))
        .select(col("dim"), col("yd").cast("double").as("y"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val y6 = dims.map(d => d -> dec(ys.getOrElse(d, 0.0))).toMap
      val norm = math.sqrt(dims.map(d => y6(d) * y6(d)).sum.toDouble)
      if (norm > 0) v = dims.map(d => d -> dec(y6(d).toDouble / norm)).toMap
    }
    spark.createDataFrame(dims.map(d => (d, v(d).toDouble)))
      .toDF("dim", "loading")
  }

  /** L53: mutual-kNN graph over the embedding corpus — the neighborhood
    * structure semantic curation walks (graph-based dedup clusters, label
    * propagation, diversity scoring). Corpus-to-corpus, so NOTHING is
    * broadcast-sized by the query side: candidates come from the
    * [[lshBands]] self-join (banded, never all-pairs at real bit widths —
    * size `bitsPerBand` with [[adaptiveBits]] as the corpus grows, the
    * [[embedNearDup]] convention), scoring joins candidates back to the
    * corpus on each side (two equi-join shuffles), and the per-query top-k
    * is the bounded-state [[graft.functions.TopKByScore]] partial
    * aggregate. An edge survives only if it is MUTUAL (each endpoint in the
    * other's top-k) — the standard symmetrization that prunes hub vertices.
    * Emitted once with `a < b`.
    *
    * RECALL CONTRACT: with the default adaptive band width the candidate
    * set is PROBABILISTIC — a true neighbor that collides with its query in
    * none of the `bands` projections is silently missing from the graph
    * (standard ANN behavior; acceptable for curation walks, not for an
    * exactness proof). Pass `exact = true` to force the all-pairs candidate
    * set: guaranteed-complete but O(n²) — guarded to small corpora, for
    * oracle parity and recall audits only. */
  def knnGraph(embs: DataFrame, k: Int, bands: Int = 96,
               bitsPerBand: Option[Int] = None, seed: Long = 42,
               exact: Boolean = false,
               pairBudget: Option[Long] = None): DataFrame = {
    // band width GROWS with the corpus (the embedNearDup convention) or
    // banding degenerates to all-pairs: at 3 bits a 10× corpus measured
    // 71× (quadratic). Recall then rests on the metric gap — real
    // clustered embeddings keep true neighbors colliding at wide bands;
    // an ISOTROPIC corpus (no gap) admits no sub-quadratic exact kNN
    // graph at all, which is why the gate pins (3 bits, 500 vectors) as
    // its oracle-parity configuration.
    val cands = if (exact) {
      val n = embs.count()
      require(n <= 20000,
        s"exact=true is an O(n²) all-pairs audit path; corpus has $n vectors (max 20000)")
      val ids = embs.select(col("vec_id").as("id"))
      ids.select(col("id").as("qid"))
        .crossJoin(ids.select(col("id").as("cid")))
        .filter(col("qid") =!= col("cid"))
    } else {
      // pairBudget arms the pair-mass valve: widen past the average-
      // targeted adaptive width until the MEASURED candidate mass fits
      // the budget ([[budgetBits]] — the average under-prices skewed
      // sign distributions at scale)
      val start = bitsPerBand.getOrElse(adaptiveBits(embs.count()))
      val bits = pairBudget match {
        case Some(budget) => budgetBits(embs, bands, seed, budget, start)._1
        case None => start
      }
      val cb = lshBands(embs, bands, bits, seed)
      cb.join(cb.select(col("id").as("qid"), col("band"), col("bv")), Seq("band", "bv"))
        .filter(col("id") =!= col("qid"))
        .select(col("qid"), col("id").as("cid"))
        .distinct()
    }
    val corpus = prep(embs)
    val scored = cands
      .join(corpus.select(col("id").as("cid"), col("emb")), "cid")
      .join(corpus.select(col("id").as("qid"), col("emb").as("qemb")), "qid")
      .select(col("qid"), col("cid"), cosine(col("qemb"), col("emb")).as("score"))
    val knn = topKPerQuery(scored, k)
      .select(col("qid").as("a"), col("cid").as("b"), col("score"))
    knn.join(knn.select(col("b").as("a"), col("a").as("b")), Seq("a", "b"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("score"))
  }

  /** L71: hard-negative mining — for every anchor, the k most-similar
    * vectors carrying a DIFFERENT label: the negatives that actually
    * teach a contrastive embedding model (random negatives are trivially
    * far; the semi-hard band near the decision boundary carries the
    * gradient — Schroff et al. 2015 FaceNet; Karpukhin et al. 2020 DPR).
    *
    * Same candidate stance as [[knnGraph]]: banded hyperplane LSH
    * (band width corpus-adaptive) with the guarded all-pairs path as an
    * O(n²) audit config; the label filter runs BEFORE scoring so
    * same-label collisions never reach the cosine. Per-anchor top-k via
    * the bounded [[graft.functions.TopKByScore]] heap — k rows per
    * anchor cross the shuffle regardless of candidate count. Output:
    * (qid, cid, rank, score), rank 1..k by (score desc, cid asc). */
  def hardNegatives(embs: DataFrame, k: Int, bands: Int = 96,
                    bitsPerBand: Option[Int] = None, seed: Long = 42,
                    exact: Boolean = false): DataFrame = {
    val cands = if (exact) {
      val n = embs.count()
      require(n <= 20000,
        s"exact=true is an O(n²) all-pairs audit path; corpus has $n vectors (max 20000)")
      val ids = embs.select(col("vec_id").as("id"))
      ids.select(col("id").as("qid"))
        .crossJoin(ids.select(col("id").as("cid")))
        .filter(col("qid") =!= col("cid"))
    } else {
      val bits = bitsPerBand.getOrElse(adaptiveBits(embs.count()))
      val cb = lshBands(embs, bands, bits, seed)
      cb.join(cb.select(col("id").as("qid"), col("band"), col("bv")), Seq("band", "bv"))
        .filter(col("id") =!= col("qid"))
        .select(col("qid"), col("id").as("cid"))
        .distinct()
    }
    val labels = embs.select(col("vec_id").as("id"), col("label"))
    val corpus = prep(embs)
    val scored = cands
      .join(labels.select(col("id").as("qid"), col("label").as("ql")), "qid")
      .join(labels.select(col("id").as("cid"), col("label").as("cl")), "cid")
      .filter(col("ql") =!= col("cl"))
      .join(corpus.select(col("id").as("cid"), col("emb")), "cid")
      .join(corpus.select(col("id").as("qid"), col("emb").as("qemb")), "qid")
      .select(col("qid"), col("cid"), cosine(col("qemb"), col("emb")).as("score"))
    topKPerQuery(scored, k)
  }

  /** L72: margin-based bitext mining (Artetxe & Schwenk 2019, the
    * CCMatrix/LASER parallel-corpus miner): for every source-side vector
    * x, its best target-side partner y scored by the MARGIN — the cosine
    * normalized by both sides' local neighborhood densities
    *
    *   margin(x, y) = cos(x, y) / ((avgNNk(x) + avgNNk(y)) / 2)
    *
    * which suppresses hubs (vectors close to everything) that raw cosine
    * mining drowns in. Forward mining: one candidate pair per source
    * vector (its margin-argmax among its k nearest targets), kept when
    * margin >= threshold.
    *
    * Number discipline (the silhouette pattern): per-neighbor cosines
    * are rounded to 6 dp and summed as EXACT DECIMAL, so each side's
    * denominator is arrival-order-free; the margin is ONE double
    * division 2k·c6 / (Σx + Σy) — bit-identical on any engine replaying
    * the same formula. Scale stance: banded hyperplane LSH across the
    * two sides (same family as [[knnGraph]]; band width corpus-adaptive)
    * with the guarded exact path as the oracle-parity audit config; all
    * per-vector state is the bounded top-k heap. */
  def bitextMargin(embsA: DataFrame, embsB: DataFrame, k: Int = 4,
                   threshold: Double = 1.0, bands: Int = 96,
                   bitsPerBand: Option[Int] = None, seed: Long = 42,
                   exact: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val cands = if (exact) {
      val na = embsA.count(); val nb = embsB.count()
      require(na <= 20000 && nb <= 20000,
        s"exact=true is an O(n·m) all-pairs audit path; sides have $na × $nb vectors (max 20000 each)")
      embsA.select(col("vec_id").as("x"))
        .crossJoin(embsB.select(col("vec_id").as("y")))
    } else {
      val bits = bitsPerBand.getOrElse(
        adaptiveBits(math.max(embsA.count(), embsB.count())))
      lshBands(embsA, bands, bits, seed).select(col("id").as("x"), col("band"), col("bv"))
        .join(lshBands(embsB, bands, bits, seed)
          .select(col("id").as("y"), col("band"), col("bv")), Seq("band", "bv"))
        .select(col("x"), col("y"))
        .distinct()
    }
    val scored = cands
      .join(prep(embsA).select(col("id").as("x"), col("emb").as("va")), "x")
      .join(prep(embsB).select(col("id").as("y"), col("emb").as("vb")), "y")
      .select(col("x"), col("y"), cosine(col("va"), col("vb")).as("score"))
      .localCheckpoint() // scored feeds THREE consumers (kNN-x, kNN-y, margin)
    val c6 = round(col("score"), 6).cast("decimal(18,6)")
    // per-side kNN sums of 6-dp-exact cosines (the denominator halves)
    val knnX = topKPerQuery(scored.select(col("x").as("qid"), col("y").as("cid"),
        col("score")), k)
      .select(col("qid").as("x"), col("cid").as("y"), col("score"))
    val sumX = knnX.groupBy(col("x")).agg(sum(c6).as("sx"))
    val sumY = topKPerQuery(scored.select(col("y").as("qid"), col("x").as("cid"),
        col("score")), k)
      .groupBy(col("qid")).agg(sum(c6).as("sy"))
      .select(col("qid").as("y"), col("sy"))
    // margin over the source side's own k candidates, argmax per source
    val margins = knnX
      .join(sumX, "x").join(sumY, "y")
      .select(col("x").as("qid"), col("y").as("cid"),
        when(col("sx") + col("sy") =!= 0,
          (lit(2 * k) * c6).cast("double") / (col("sx") + col("sy")).cast("double"))
          .otherwise(lit(0.0)).as("score"))
    topKPerQuery(margins, 1)
      .filter(col("score") >= threshold)
      .select(col("qid").as("src_id"), col("cid").as("tgt_id"),
        col("score").as("margin"))
  }
}
