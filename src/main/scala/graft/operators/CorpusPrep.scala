package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Per-(lang, source) corpus statistics of the cleaned set — the rollup a
    * data curator reads before training. */
  def corpusStats(cleaned: DataFrame): DataFrame =
    TextAnalysis.stats(cleaned)
      .join(cleaned.select("doc_id", "lang", "source"), "doc_id")
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(avg(col("quality")), 6).as("avg_quality"))
}
