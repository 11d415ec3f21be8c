package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data preparation over a document corpus — the
  * composite flow an LLM data pipeline actually runs, built from the
  * operator layer: exact dedup → near-dup removal → quality filtering →
  * per-slice corpus statistics.
  *
  * Shape at scale: dedup is one wide-key shuffle; near-dup removal reuses
  * the banded candidate machinery ([[Dedup.nearDupMinhash]]) and removes
  * the higher-id member of each verified pair (keep-first policy, matching
  * the exact-dedup canonical rule); quality filtering is a shuffle-free
  * scan; the final rollup is one small aggregation. No stage touches more
  * than the candidate set + corpus once.
  */
object CorpusPrep {

  /** L60: incremental corpus ingest — the S8 first-write-wins pattern for
    * documents, the shape a production 100 TB pipeline actually runs (the
    * corpus is persisted; only batches arrive). An incoming doc is accepted
    * iff it is (a) not an exact-content duplicate of the existing corpus or
    * of a lower-id batch doc, (b) not a near-duplicate (verified Jaccard ≥
    * `nearDupThreshold`) of ANY existing doc (the corpus always wins) or of
    * a lower-id batch doc, and (c) quality ≥ `minQuality`. Existing rows
    * are never touched. Returns the ACCEPTED incoming rows (the append set).
    *
    * Scale contract: candidate generation goes through
    * [[Dedup.crossCandidates]], which never materializes an
    * existing×existing pair — per-batch cost is proportional to the batch's
    * bucket overlap with the corpus, not to the corpus's internal
    * duplication. In production the existing side's signatures are computed
    * once and persisted; here they are recomputed because the gate has no
    * state store, but the pair generation is identical either way. */
  def incrementalIngest(existing: DataFrame, incoming: DataFrame,
                        n: Int = 3, numHashes: Int = 128, bands: Int = 16,
                        nearDupThreshold: Double = 0.8,
                        minQuality: Double = 0.2): DataFrame = {
    require(numHashes % bands == 0, s"bands=$bands must divide numHashes=$numHashes")
    val existingHashes = existing
      .select(md5(TextOps.normalize(col("text"))).as("content_hash")).distinct()
    val exactSurvivors = Dedup.exact(incoming)
      .filter(col("is_canonical"))
      .select("doc_id", "content_hash")
      .join(existingHashes, Seq("content_hash"), "left_anti")
      .select("doc_id")
    // r16 optimization (guide §1.2): each side's shingle sets feed the
    // signature pipeline AND the Jaccard verify join — without the
    // checkpoint the tokenize+shingle pass runs 2-3× per side per call
    // (per micro-batch in the t25 ledger). Same materialization bound as
    // [[Dedup.nearDupMinhash]]'s checkpoint; production persists the
    // existing side's signatures outright (scaladoc above).
    val shOld = Dedup.shingleSets(existing, n).localCheckpoint()
    val shNew = Dedup.shingleSets(incoming, n).localCheckpoint()
    val cands = Dedup.crossCandidates(
      Dedup.minhashSignatures(shOld, numHashes),
      Dedup.minhashSignatures(shNew, numHashes),
      bands, numHashes / bands)
    // j is always the incoming side (crossCandidates emits old×new as
    // (i=old, j=new); new×new as i<j) — so losers are exactly the batch
    // docs beaten by the corpus or by an earlier batch doc
    val nearDupLosers = Dedup.verifyJaccard(cands, shOld.unionByName(shNew),
        nearDupThreshold)
      .select(col("j").as("doc_id")).distinct()
    val qualified = TextAnalysis.stats(incoming)
      .filter(col("quality") >= minQuality)
      .select(col("doc_id"))
    incoming
      .join(exactSurvivors, Seq("doc_id"), "left_semi")
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .join(qualified, Seq("doc_id"), "left_semi")
  }

  /** Documents surviving cleaning: exact duplicates collapsed to the lowest
    * doc_id, near-duplicate (Jaccard ≥ `nearDupThreshold`) higher-id members
    * dropped, then low-quality docs (quality < `minQuality`) dropped. */
  def clean(docs: DataFrame, nearDupThreshold: Double = 0.8,
            minQuality: Double = 0.2): DataFrame = {
    val canonical = Dedup.exact(docs)
      .filter(col("is_canonical"))
      .select(col("doc_id"))
    val nearDupLosers = Dedup.nearDupMinhash(docs, threshold = nearDupThreshold)
      .select(col("j").as("doc_id")).distinct()
    // quality is a per-doc metric, so score the FULL corpus and semi-join:
    // scoring `kept` instead would be equivalent but would embed the whole
    // dedup chain in the plan twice (once for kept, once inside the stats
    // branch) — measured ~2× the query cost
    val qualified = TextAnalysis.stats(docs)
      .filter(col("quality") >= minQuality)
      .select(col("doc_id"))
    docs
      .join(canonical, Seq("doc_id"), "left_semi")
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .join(qualified, Seq("doc_id"), "left_semi")
  }

  /** Cluster-exact variant of [[clean]]: transitive near-dup CLUSTERS
    * ([[Dedup.connectedComponents]] over the minhash pairs) each keep only
    * their minimum doc_id. Closes the pair-loser policy's hub gap: with
    * pairs (1,3) and (2,3) but never (1,2), keep-first pair removal drops
    * only 3 and keeps both 1 and 2 even though they are transitive
    * near-dups; cluster-exact keeps only 1. Exact-dup canon and quality
    * filters are unchanged from [[clean]]. */
  def cleanClustered(docs: DataFrame, nearDupThreshold: Double = 0.8,
                     minQuality: Double = 0.2): DataFrame = {
    val canonical = Dedup.exact(docs)
      .filter(col("is_canonical"))
      .select(col("doc_id"))
    val losers = Dedup.connectedComponents(
        Dedup.nearDupMinhash(docs, threshold = nearDupThreshold)
          .select(col("i"), col("j")))
      .filter(col("cluster_id") =!= col("doc_id"))
      .select(col("doc_id"))
    val qualified = TextAnalysis.stats(docs)
      .filter(col("quality") >= minQuality)
      .select(col("doc_id"))
    docs
      .join(canonical, Seq("doc_id"), "left_semi")
      .join(losers, Seq("doc_id"), "left_anti")
      .join(qualified, Seq("doc_id"), "left_semi")
  }

  /** Deterministic train/val/test assignment by content hash: the split is
    * a pure function of the text (stable across runs, re-shards, and
    * engine versions — MD5, not a seeded RNG), so no example can leak
    * between splits when the corpus is re-processed. Buckets: hash mod 100
    * < trainPct → train, < trainPct+valPct → val, else test. */
  def assignSplit(docs: DataFrame, trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val bucket = TextOps.hash60(TextOps.normalize(col("text"))) % 100
    docs.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic stratified downsampling: keep a doc iff its content-hash
    * bucket (mod 10000) falls under the per-stratum rate — reproducible
    * corpus mixing without an RNG, tunable per (lang or source) stratum.
    * Rates are permille-of-10000 fractions; missing strata keep nothing. */
  def sampleStrata(docs: DataFrame, stratumCol: String,
                   rates: Map[String, Double]): DataFrame = {
    val bucket = TextOps.hash60(TextOps.normalize(col("text"))) % 10000
    val rateExpr = rates.foldLeft(lit(0.0)) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, lit(r)).otherwise(acc)
    }
    docs.filter(bucket < rateExpr * 10000)
  }

  /** L38: deterministic mixture sampling — fill per-source character budgets
    * (DoReMi/Pile-style domain weighting made reproducible): source `s` gets
    * `floor(weight_s · totalBudget)` characters; docs are admitted in
    * content-hash order (a pure function of the text — stable across runs
    * and re-shards, no RNG) while the running character total stays within
    * the source's budget. Because the running sum is monotone,
    * `cum <= budget` IS take-while.
    *
    * Scale shape: one shuffle on `source`; each source's window is an
    * independent partition, so 100 TB mixes with per-source parallelism
    * (sub-partition salting is unnecessary — the window stops mattering
    * after the budget row, and budgets bound the kept prefix). */
  def dataMix(docs: DataFrame, weights: Map[String, Double],
              defaultWeight: Double, totalBudget: Long): DataFrame = {
    require(totalBudget > 0, s"totalBudget must be positive, got $totalBudget")
    val wcol = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, wt)) =>
      when(col("source") === s, lit(wt)).otherwise(acc)
    }
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    docs
      .withColumn("h", TextOps.hash60(TextOps.normalize(col("text"))))
      .withColumn("budget", floor(wcol * totalBudget).cast("bigint"))
      .withColumn("cum", sum(col("n_chars")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") <= col("budget"))
      .select(col("doc_id"), col("source"), col("cum").as("cum_chars"))
  }

  /** Per-(lang, source) corpus statistics of the cleaned set — the rollup a
    * data curator reads before training.
    *
    * `avg_quality` is NOT `avg(double)`: double addition is order-sensitive,
    * so a partition-order sum diverges from a sequential engine by a ulp and
    * can cross a rounding boundary. Quality is exact at 6 dp by construction
    * ([[TextAnalysis.stats]]), so the sum goes through DECIMAL(18,6)
    * (associative, exact), snaps back to the 6-dp double grid, and only then
    * divides by the count — every input to the final rounding is
    * bit-identical regardless of aggregation order. */
  def corpusStats(cleaned: DataFrame): DataFrame =
    // the per-doc stats frame is CORPUS-scale and stats-blind (its plan
    // descends the token explode): pinned shuffled build on doc_id
    TextAnalysis.stats(cleaned).hint("shuffle_hash")
      .join(cleaned.select("doc_id", "lang", "source"), "doc_id")
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(round(sum(col("quality").cast("decimal(18,6)")).cast("double"), 6)
          / count(lit(1)), 6).as("avg_quality"))

  /** Sequence packing, concat-and-chop style: the corpus token stream in
    * `doc_id` order is conceptually concatenated and chopped into
    * fixed-`budget` training blocks; each doc gets its block span
    * (`seq_first`..`seq_last`) and offset within the first block. Pure
    * integer arithmetic — bit-exact everywhere.
    *
    * The global running sum is computed scale-safely as a two-phase
    * parallel prefix sum, NOT one unpartitioned window (which would sort
    * the corpus on a single task): per-bucket running sums over
    * contiguous `doc_id` ranges in parallel, then per-bucket totals — at
    * most `buckets` rows — prefix-summed on one (tiny, deliberate) task
    * and broadcast back as offsets. Input needs (`doc_id`, `n_tokens`);
    * compose with [[TextAnalysis.stats]]. */
  def packSequences(docs: DataFrame, budget: Long, buckets: Int = 256): DataFrame = {
    require(budget > 0, "budget must be positive")
    // max(doc_id) is NULL on an empty corpus; packing an empty corpus is
    // well-defined (empty result), so short-circuit instead of NPE-ing.
    val maxIdRow = docs.agg(max(col("doc_id"))).first()
    if (maxIdRow.isNullAt(0))
      return docs.sparkSession.range(0).select(
        col("id").as("doc_id"), col("id").as("n_tokens"),
        col("id").as("seq_first"), col("id").as("seq_last"),
        col("id").as("seq_offset"))
    val maxId = maxIdRow.getLong(0)
    val span = maxId / buckets + 1
    val local = docs
      .withColumn("_b", expr(s"doc_id div $span"))
      .withColumn("_lc", sum(col("n_tokens")).over(
        Window.partitionBy(col("_b")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val prefixes = local.groupBy(col("_b")).agg(max(col("_lc")).as("_bt"))
      .withColumn("_pre", coalesce(sum(col("_bt")).over(
        Window.orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_b"), col("_pre"))
    local.join(broadcast(prefixes), "_b")
      .withColumn("_end", col("_pre") + col("_lc"))
      .withColumn("_start", col("_end") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"_start div $budget").as("seq_first"),
        expr(s"(_end - 1) div $budget").as("seq_last"),
        expr(s"_start % $budget").as("seq_offset"))
  }

  /** L63: packed causal-LM training examples — the LAST step of the data
    * pipeline, materializing what [[packSequences]] only assigns: per
    * `budget`-token block, the concatenated token-id array and the
    * shifted-left label array (`labels[i] = input[i+1]`, final position
    * masked with −100 — the standard packed-causal convention; blocks are
    * independent, so no token attends across a block boundary).
    *
    * Token ids are the portable 60-bit hash of each token (a vocab-free
    * stand-in with an exact DuckDB twin). A doc spanning blocks contributes
    * one slice per block (explode over `seq_first..seq_last`); each block
    * reassembles its pieces in global-offset order. Memory per group is
    * bounded by construction — a block holds exactly `budget` tokens — and
    * the one shuffle keys on `block_id`, uniform by construction. Scale
    * shape: tokens/budget blocks, each a bounded task; the prefix sums
    * come from [[packSequences]]'s two-phase machinery (no global sort). */
  def packExamples(docs: DataFrame, budget: Long, buckets: Int = 256): DataFrame = {
    require(budget >= 2, s"budget must be >= 2, got $budget")
    val ids = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        transform(col("toks"), t => TextOps.hash60(t)).as("tid"))
    val asg = packSequences(
      ids.select(col("doc_id"), size(col("tid")).cast("long").as("n_tokens")),
      budget, buckets)
    asg.join(ids, "doc_id")
      .withColumn("_start", col("seq_first") * budget + col("seq_offset"))
      .withColumn("blk", explode(sequence(col("seq_first"), col("seq_last"))))
      .withColumn("lo", greatest(col("blk") * budget - col("_start"), lit(0L)))
      .withColumn("hi",
        least((col("blk") + 1) * budget - col("_start"), col("n_tokens")))
      .withColumn("piece", slice(col("tid"), col("lo") + 1, col("hi") - col("lo")))
      .groupBy(col("blk"))
      .agg(sort_array(collect_list(struct(col("_start"), col("piece")))).as("ps"))
      .select(col("blk").as("block_id"),
        flatten(transform(col("ps"), x => x.getField("piece"))).as("input_ids"))
      .select(col("block_id"), size(col("input_ids")).cast("long").as("n_tokens"),
        col("input_ids"),
        concat(slice(col("input_ids"), 2, (budget - 1).toInt),
          array(lit(-100L))).as("labels"))
  }

  /** Fixed-size token-window chunking with stride — the complement of
    * [[packSequences]]: packing concatenates short docs into budget-sized
    * blocks, chunking splits long docs into overlapping `size`-token
    * windows (`stride` < `size` ⇒ overlap, the usual context-window prep
    * for embedding / pretraining corpora).
    *
    * Shuffle-free narrow transformation: tokens materialize in their own
    * projection (lambda-CSE), window starts come from `sequence(0, n-1,
    * stride)` + `posexplode`, the chunk text from `slice` + `array_join` —
    * all codegen'd built-ins, no UDF. Output grows by ≤ `size`/`stride`×
    * the token volume; the trailing window is allowed to run short (every
    * token appears in ≥ 1 chunk, starts are always `k·stride`). */
  def chunkWindows(docs: DataFrame, chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(stride > 0 && stride <= chunkSize,
      s"stride must be in 1..chunkSize, got $stride")
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), size(col("toks")) - 1, lit(stride)))
          .as(Seq("chunk_no", "start_tok")))
      .select(col("doc_id"), col("chunk_no"), col("start_tok"),
        least(size(col("toks")) - col("start_tok"), lit(chunkSize))
          .cast("int").as("n_tokens"),
        array_join(slice(col("toks"), col("start_tok") + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  /** Per-source quota: keep at most `maxPerGroup` docs per `groupCol`,
    * chosen by deterministic content-hash order (caps domination of the
    * training mix by any one crawl/source without RNG — re-runs and
    * retried tasks pick identical survivors).
    *
    * Selection runs through the bounded top-k heap aggregate
    * ([[graft.functions.TopKByScore]]), NOT a per-group row_number window:
    * partial buffers hold ≤ k entries and merge map-side, so a source with
    * 10⁹ docs shuffles k rows, not 10⁹ — the window form would sort the
    * whole skewed group on one task. The hash score drops the low 7 bits
    * (60-bit → 53-bit) so its double image is exact and the (score desc,
    * id asc) tie-break is engine-portable. */
  def sourceQuota(docs: DataFrame, maxPerGroup: Int,
                  groupCol: String = "source"): DataFrame = {
    docs
      .withColumn("hscore",
        expr("cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint) div 128")
          .cast("double"))
      .groupBy(col(groupCol))
      .agg(graft.functions.TopKByScore(col("hscore"), col("doc_id"), maxPerGroup).as("top"))
      .select(col(groupCol), posexplode(col("top")))
      .select(col(groupCol), (col("pos") + 1).cast("int").as("rk"),
        col("col.id").as("doc_id"))
  }

  /** PII scrubbing: emails, IPv4 literals, and phone-like digit runs become
    * typed placeholder tokens (the C4/CCNet curation step). A pure
    * codegen'd `regexp_replace` chain — shuffle-free linear scan at any
    * scale; patterns are RE2-compatible (no lookaround) so the same regexes
    * run identically in any engine. Order matters: emails first (they
    * contain digits and dots), then IPs (dotted digits), then bare digit
    * runs. */
  def scrubPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val phone = "\\+?\\d[\\d\\- ]{7,}\\d"
    docs.withColumn(textCol,
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), email, "<EMAIL>"),
          ip, "<IP>"),
        phone, "<PHONE>"))
  }

  /** L66: deterministic corpus shuffle + shard assignment — the final
    * pre-training pass. Every document gets a position in a seeded
    * pseudo-random total order (md5 of `seed ++ doc_id` — uniform and
    * engine-portable, so re-runs and retried tasks land identically) and
    * a (shard, position-in-shard) slot; any number of training workers
    * then read disjoint, reproducible, well-mixed shards. Round-robin
    * sharding (`shard = rank % nShards`) balances shards to ±1 document
    * with no knowledge of the total count.
    *
    * Scale shape: the global rank is the two-phase prefix-count pattern
    * ([[packSequences]]) pointed at HASH space — the bucket key is the
    * leading hex byte of the hash, which is ORDER-ALIGNED with the full
    * hash (a mod-bucket would interleave ranges and break rank
    * composition): within-bucket row_numbers run in parallel over
    * ~corpus/buckets rows each, the bucket counts prefix-sum on one tiny
    * task and broadcast back. No global single-task sort anywhere.
    * `bucketHexChars` is the 100 TB valve: 2 hex chars (256 buckets,
    * the default) keeps the prefix-sum trivial at test scale; 3-4 hex
    * chars (4,096-65,536 buckets) keep each within-bucket sort
    * executor-sized at full scale — rank composition is bucket-width-
    * independent (PropertiesSpec proves 256 ≡ 4,096 ≡ the global
    * order). */
  def corpusShuffle(docs: DataFrame, nShards: Int, seed: Long = 42L,
                    bucketHexChars: Int = 2): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(bucketHexChars >= 1 && bucketHexChars <= 4,
      s"bucketHexChars must be in [1, 4], got $bucketHexChars")
    val withH = docs.select(col("doc_id"),
      md5(concat(lit(seed.toString), col("doc_id").cast("string"))
        .cast("binary")).as("_h"))
    // lowercase-hex lexicographic order == numeric order, so the leading
    // hex chars are a monotone 16^bucketHexChars-way range partition of
    // the hash
    val local = withH
      .withColumn("_b",
        conv(substring(col("_h"), 1, bucketHexChars), 16, 10).cast("int"))
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("_b")).orderBy(col("_h"), col("doc_id"))))
    val offs = local.groupBy(col("_b")).agg(count(lit(1)).as("_n"))
      .withColumn("_pre", coalesce(sum(col("_n")).over(
        Window.orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_b"), col("_pre"))
    local.join(broadcast(offs), "_b")
      .withColumn("rank", col("_pre") + col("_r") - 1)
      .select(col("doc_id"), col("rank"),
        (col("rank") % nShards).cast("int").as("shard"),
        expr(s"rank div $nShards").as("pos"))
  }

  /** Per-split rollup of a cleaned, split-assigned corpus — the last stage
    * of the end-to-end curation flow (clean → [[assignSplit]] → audit the
    * train/val/test balance before training). Same order-insensitive
    * decimal summation as [[corpusStats]]. */
  def splitStats(cleanedSplit: DataFrame): DataFrame =
    // corpus-scale stats-blind build, same pin as [[corpusStats]]
    TextAnalysis.stats(cleanedSplit).hint("shuffle_hash")
      .join(cleanedSplit.select("doc_id", "split"), "doc_id")
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(round(sum(col("quality").cast("decimal(18,6)")).cast("double"), 6)
          / count(lit(1)), 6).as("avg_quality"))

  /** L76: corpus-release diff — the per-source delta report between two
    * corpus versions (the artifact every dataset release ships: what a
    * re-crawl added, what takedowns removed, what re-extraction changed).
    * Statuses by doc_id: added (only in v2), removed (only in v1),
    * changed (both, different content hash), unchanged. A changed doc's
    * source attribution follows v2 (the release being described).
    *
    * Scale shape: ONE full-outer join on the uniform doc_id key — both
    * sides pre-hashed to (id, md5, source) so the join moves 3 skinny
    * columns, never text; with both versions bucketed by doc_id at
    * deployment the join is shuffle-free. The rollup is one
    * map-side-combined agg on ~|sources| keys. */
  def corpusDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    // presence is a FLAG, not hash non-nullness: a NULL-text doc present
    // in both versions is unchanged, not added/removed; hash compare is
    // null-safe for the same reason (NULL vs non-NULL text = changed)
    val a = v1.select(col("doc_id"), md5(col("text")).as("h1"),
      col("source").as("s1"), lit(true).as("p1"))
    val b = v2.select(col("doc_id"), md5(col("text")).as("h2"),
      col("source").as("s2"), lit(true).as("p2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(coalesce(col("s2"), col("s1")).as("source"),
        when(col("p1").isNull, lit("added"))
          .when(col("p2").isNull, lit("removed"))
          .when(!(col("h1") <=> col("h2")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .groupBy(col("source"))
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
  }
}
