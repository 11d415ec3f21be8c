package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One Viterbi DP input row: word (with corpus frequency `cnt`), end
  * position `e` (1-based, codepoints), and the candidate piece
  * probabilities `ps` where `ps(l-1)` is the model probability of the
  * length-`l` piece ENDING at `e` (0.0 if not in the vocabulary; the
  * length-1 slot is floored so the DP is total). */
final case class UniCand(word: String, cnt: Long, e: Int, ps: Array[Double])

/** One decoded word: the Viterbi-best segmentation's piece count and the
  * piece lengths in order (codepoints). */
final case class UniPath(word: String, cnt: Long, n_pieces: Long, lens: Array[Int])

/** Unigram language-model tokenizer (SentencePiece, Kudo 2018) — the third
  * production subword family beside BPE ([[TextAnalysis.bpeTrain]]) and
  * WordPiece ([[TextAnalysis.wordpieceVocab]]): pieces carry PROBABILITIES
  * and a word's tokenization is the maximum-likelihood segmentation, found
  * by Viterbi DP. Training is hard-EM (Viterbi-EM): E-step = decode every
  * word under the current model, M-step = re-estimate piece probabilities
  * from decoded usage, prune the vocabulary, repeat. The reference pipeline
  * tokenizes per-document text for token accounting (the same surface the
  * L58/L62 reports consume); this supplies the tokenizer the unigram way.
  *
  * NUMERIC PARITY (the no-transcendentals rule, see [[TextAnalysis.bm25]]):
  * the textbook DP maximizes Σ log p — but libm's log is only
  * 1-ulp-accurate and differs between engines, so this DP runs in the
  * PROBABILITY domain instead: `best(e) = max_l best(e-l) · p(piece)`.
  * Every candidate is ONE IEEE-754 multiplication of two exactly-agreed
  * doubles (each p is one division of exact integers), and log is strictly
  * monotone, so the argmax is the textbook argmax — bit-identical on any
  * IEEE engine, including the DuckDB recursive-CTE oracle. Ties take the
  * LONGEST piece (both sides pin it). Products can only underflow on
  * pathological words: `best(e) ≥ pFloor^e` (singles are always in the
  * vocabulary), so the driver guard `maxWordLen · log10(pFloor) > −300`
  * (log driver-side only, not in the data path) plus the in-fold
  * `require(best > 0)` make the bound loud, and IEEE subnormal arithmetic
  * below 1e-308 remains deterministic on both engines.
  *
  * Scale shape: every training frame is WORD-TYPE-scale (Heaps-bounded
  * distinct words), never corpus-scale — seed candidate explosion and the
  * per-word DP ride the word-frequency table, exactly like WordPiece's
  * pointer-doubling frames. The DP itself is a per-word sequential fold
  * (Viterbi has a true loop-carried dependency, unlike greedy
  * longest-match's functional graph), so it uses the house ordered-fold
  * pattern (groupByKey + flatMapSortedGroups — the EMA/RSI/backtest shape):
  * one shuffle per EM round, per-group memory O(wordLen · maxPiece). The
  * model is vocabulary-bounded (≤ topV + alphabet rows) and explicitly
  * broadcast; word-type-scale join sides are pinned `shuffle_hash` (the
  * measured stats-blind-broadcast trap, see [[TextAnalysis.wordpieceEncode]]).
  * The only corpus-scale stages are the initial token count and the final
  * per-doc rollup — both map-side-combined single shuffles.
  */
object Unigram {

  /** Distinct words with corpus frequencies (the Heaps-bounded table every
    * training frame rides). */
  private[graft] def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(col("word").isNotNull && col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Seed vocabulary with occurrence-weighted frequencies: every single
    * character (totality) plus the `topV` most frequent substrings of
    * length 2..maxPiece (ties lexical) — the frequency-seeded
    * initialization of SentencePiece (Kudo 2018 §3; same seeding family as
    * [[TextAnalysis.wordpieceVocab]]). Output: (piece, used). */
  private[graft] def seedModel(words: DataFrame, topV: Int, maxPiece: Int): DataFrame = {
    val sf = words
      .select(col("word"), col("cnt"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("i"))
      .select(col("word"), col("cnt"), col("i"),
        explode(sequence(lit(1),
          least(lit(maxPiece), length(col("word")) - col("i")))).as("l"))
      .select(col("word").substr(col("i") + 1, col("l")).as("piece"), col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("used"))
    val singles = sf.filter(length(col("piece")) === 1)
    val mult = sf.filter(length(col("piece")) >= 2)
      .orderBy(col("used").desc, col("piece")).limit(topV)
    singles.unionAll(mult)
  }

  /** Normalize a (piece, used) model to probabilities: one driver scalar
    * for the total (the model is vocabulary-bounded), p = used/T as ONE
    * IEEE division of exact integers. Returns (model with `p`, pFloor)
    * where pFloor = 1/T is the unknown-single floor. */
  private def withProbs(model: DataFrame): (DataFrame, Double) = {
    val r = model.agg(sum(col("used"))).first()
    require(!r.isNullAt(0) && r.getLong(0) > 0,
      "empty unigram model — no training tokens")
    val t = r.getLong(0)
    (model.withColumn("p", col("used").cast("double") / lit(t.toDouble)),
      1.0 / t.toDouble)
  }

  /** Viterbi-decode every word under the model: max-probability
    * segmentation, ties to the longest piece. Candidate frames are
    * word-type-scale; the DP is the house sorted-group fold. */
  private[graft] def viterbi(words: DataFrame, model: DataFrame, maxPiece: Int,
                             pFloor: Double): Dataset[UniPath] = {
    val spark = words.sparkSession
    import spark.implicits._
    // underflow guard (driver-side log only): best(e) >= pFloor^e
    val maxRow = words.agg(max(length(col("word")))).first()
    if (maxRow.isNullAt(0)) return spark.emptyDataset[UniPath]
    val maxLen = maxRow.getInt(0)
    require(maxLen * math.log10(pFloor) > -300,
      s"word of $maxLen chars risks probability-domain underflow at " +
        s"pFloor=$pFloor — not natural-language input")
    val cand = words
      .select(col("word"), col("cnt"),
        explode(sequence(lit(1), length(col("word")))).as("e"))
      .select(col("word"), col("cnt"), col("e"),
        explode(sequence(lit(1), least(lit(maxPiece), col("e")))).as("l"))
      .withColumn("piece", col("word").substr(col("e") - col("l") + 1, col("l")))
      // the model is genuinely vocabulary-bounded (<= topV + alphabet):
      // the one join here that SHOULD broadcast
      .join(broadcast(model.select(col("piece"), col("p"))), Seq("piece"), "left")
      .withColumn("pv",
        when(col("l") === 1, coalesce(col("p"), lit(pFloor)))
          .otherwise(coalesce(col("p"), lit(0.0))))
      .groupBy(col("word"), col("cnt"), col("e"))
      .agg(transform(array_sort(collect_list(struct(col("l"), col("pv")))),
        s => s.getField("pv")).as("ps"))
      .as[UniCand]
    cand.groupByKey(_.word).flatMapSortedGroups($"e") { (word, rows) =>
      val bests = scala.collection.mutable.ArrayBuffer(1.0)
      val backs = scala.collection.mutable.ArrayBuffer(0)
      var cnt = 0L
      rows.foreach { r =>
        cnt = r.cnt
        require(r.e == bests.length, s"non-contiguous DP position ${r.e} for '$word'")
        var b = -1.0
        var ls = 0
        var l = 1
        while (l <= r.ps.length) {
          val v = bests(r.e - l) * r.ps(l - 1)
          if (v >= b) { b = v; ls = l } // l ascending: >= pins longest-piece ties
          l += 1
        }
        require(b > 0.0,
          s"viterbi probability underflowed to zero at position ${r.e} of '$word'")
        bests += b
        backs += ls
      }
      val lens = List.newBuilder[Int]
      var p = bests.length - 1
      val rev = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (p > 0) { rev += backs(p); p -= backs(p) }
      var i = rev.length - 1
      while (i >= 0) { lens += rev(i); i -= 1 }
      val arr = lens.result().toArray
      Iterator.single(UniPath(word, cnt, arr.length.toLong, arr))
    }
  }

  /** M-step: decoded piece usage (weighted by word frequency) with an
    * add-one floor on singles (the UNK reserve — totality survives
    * pruning), multi-char pieces pruned to the `keepV` most used (ties
    * lexical). Piece extraction is by CODEPOINT (Spark/DuckDB substr
    * semantics), not UTF-16 units. Output: (piece, used). */
  private[graft] def mStep(decoded: Dataset[UniPath], singles: DataFrame,
                           keepV: Int): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    val used = decoded.flatMap { d =>
      val cps = d.word.codePoints.toArray
      var off = 0
      d.lens.iterator.map { l =>
        val s = new String(cps, off, l)
        off += l
        (s, d.cnt)
      }
    }.toDF("piece", "w").groupBy(col("piece")).agg(sum(col("w")).as("u"))
    val sf = singles.join(used.hint("shuffle_hash"), Seq("piece"), "left")
      .select(col("piece"), (coalesce(col("u"), lit(0L)) + 1L).as("used"))
    val mult = used.filter(length(col("piece")) >= 2)
      .orderBy(col("u").desc, col("piece")).limit(keepV)
      .select(col("piece"), col("u").as("used"))
    sf.unionAll(mult)
  }

  /** Train the unigram model: seed → `iters` hard-EM rounds (decode,
    * re-count, floor singles, prune to keepV). Output: (piece, used) —
    * exact integers (probabilities are derived at encode time). */
  def train(docs: DataFrame, topV: Int = 120, maxPiece: Int = 6,
            keepV: Int = 60, iters: Int = 1, textCol: String = "text"): DataFrame = {
    require(topV >= 0 && keepV >= 0, s"topV/keepV must be >= 0, got $topV/$keepV")
    require(maxPiece >= 2, s"maxPiece must be >= 2, got $maxPiece")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val words = wordTable(docs, textCol).localCheckpoint(true)
    var model = seedModel(words, topV, maxPiece).localCheckpoint(true)
    val singles = model.filter(length(col("piece")) === 1)
      .select(col("piece")).localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val (m, pFloor) = withProbs(model)
      model = mStep(viterbi(words, m, maxPiece, pFloor), singles, keepV)
        .localCheckpoint(true)
      i += 1
    }
    model
  }

  /** Viterbi-encode a corpus under a trained (piece, used) model: per
    * document the whitespace-token count and the ML-segmentation piece
    * count (the [[TextAnalysis.wordpieceEncode]] report shape, so the two
    * tokenizer families compare head-to-head). */
  def encode(docs: DataFrame, model: DataFrame, maxPiece: Int = 6,
             textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val docWords = docs
      .select(col("doc_id"), explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(col("word").isNotNull && col("word") =!= "")
    // derive the word table from docWords instead of re-tokenizing the
    // corpus a second time (one fewer corpus-scale explode pass)
    val words = docWords.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val (m, pFloor) = withProbs(model)
    val np = viterbi(words, m, maxPiece, pFloor)
      .select(col("word"), col("n_pieces").as("np"))
    // np is word-type-scale and stats-blind (typed fold output): pin the
    // build side — NEVER let Catalyst broadcast the corpus-scale side
    docWords.join(np.hint("shuffle_hash"), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ws"), sum(col("np")).as("n_pieces"))
  }
}
