package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.{Bridge, StringInputCast}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975): one pass
  * over the text counts EVERY occurrence of EVERY pattern — overlapping
  * occurrences and patterns nested inside longer matches included (dict-
  * suffix output counts are pre-collapsed per node at build time, so the
  * match loop is O(chars) amortized with no per-match chain walk).
  *
  * Built once on the driver from the bounded blocklist and shipped with
  * the plan; per-row cost is independent of the pattern count — the
  * property that makes a 10k-phrase blocklist affordable at 100 TB where
  * a regex alternation (compiled NFA over the union) degrades with every
  * added phrase. Matching is on UTF-16 code units (the Java regex
  * convention used throughout the engine); supplementary-plane characters
  * inside patterns would diverge from DuckDB's code-point `substr` — the
  * oracle fixture is ASCII, where the two coincide.
  */
final class AhoCorasick(patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "empty blocklist")
  require(patterns.forall(_.nonEmpty), "empty pattern in blocklist")
  require(patterns.distinct.length == patterns.length,
    "duplicate patterns would double-count hits")

  // build (driver-only): boxed trie maps, then FROZEN into flat sorted
  // char/next arrays — the per-row match loop does binary searches over
  // primitive arrays, no boxing, no hash probes (Character.valueOf only
  // caches code units <= 127, so a map-based loop would allocate per
  // char on any non-ASCII text)
  private val frozen: (Array[Array[Char]], Array[Array[Int]], Array[Int], Array[Long], Array[Int]) = {
    val maps = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Char, Int])
    val ends = scala.collection.mutable.ArrayBuffer(0L)
    val plen = scala.collection.mutable.ArrayBuffer(0)
    patterns.foreach { p =>
      var s = 0
      p.foreach { c =>
        maps(s).get(c) match {
          case Some(v) => s = v
          case None =>
            maps += scala.collection.mutable.TreeMap.empty[Char, Int]
            ends += 0L
            plen += 0
            maps(s).put(c, maps.length - 1)
            s = maps.length - 1
        }
      }
      ends(s) += 1
      plen(s) = p.length // distinct patterns: one end node each
    }
    val fl = new Array[Int](maps.length)
    val out = ends.toArray
    val ml = plen.toArray
    // BFS: failure links + output-count / max-match-length collapse
    // (fail(u) is shallower than u, so its values are final when u pops)
    val queue = scala.collection.mutable.ArrayDeque.empty[Int]
    maps(0).foreach { case (_, v) => fl(v) = 0; queue.append(v) }
    while (queue.nonEmpty) {
      val u = queue.removeHead()
      out(u) += out(fl(u))
      ml(u) = math.max(ml(u), ml(fl(u)))
      maps(u).foreach { case (c, v) =>
        var f = fl(u)
        while (f != 0 && !maps(f).contains(c)) f = fl(f)
        val t = maps(f).getOrElse(c, 0)
        fl(v) = if (t != v) t else 0
        queue.append(v)
      }
    }
    (maps.map(_.keysIterator.toArray).toArray,
      maps.map(_.valuesIterator.toArray).toArray, fl, out, ml)
  }
  private val charArr = frozen._1
  private val nextArr = frozen._2
  private val fail = frozen._3
  private val cumOut = frozen._4
  private val maxOutLen = frozen._5

  /** goto(state, c) with failure-link fallback; allocation-free. */
  private def step(state: Int, c: Char): Int = {
    var s = state
    while (true) {
      val cs = charArr(s)
      var lo = 0
      var hi = cs.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val cm = cs(mid)
        if (cm < c) lo = mid + 1
        else if (cm > c) hi = mid - 1
        else return nextArr(s)(mid)
      }
      if (s == 0) return 0
      s = fail(s)
    }
    0 // unreachable
  }

  /** Total match count over all patterns, overlaps included. */
  def countHits(s: String): Long = {
    var state = 0
    var hits = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      state = step(state, s.charAt(i))
      hits += cumOut(state)
      i += 1
    }
    hits
  }

  /** Scrub pass: every character inside ANY match span is masked (or
    * dropped, `remove = true`) — the union-of-spans semantics, which a
    * single longest-match per END position realizes exactly (a shorter
    * match ending at the same place lies inside the longest one, so only
    * the per-node MAX dict-suffix length matters). One automaton walk;
    * per-hit marking is O(match length), so the worst case is
    * O(chars · longest pattern) on pathological self-overlapping text and
    * O(chars) on real blocklists.
    *
    * Masking is per CODEPOINT, not per UTF-16 unit: the span convention
    * (and the DuckDB oracle's substr arithmetic) counts codepoints, so a
    * masked supplementary-plane character becomes ONE mask char, never
    * two. A valid pattern match always covers whole codepoints; a
    * codepoint counts as covered if ANY of its units is (the lone-
    * surrogate-pattern degenerate case). */
  def scrub(s: String, mask: Char, remove: Boolean): String = {
    var state = 0
    val n = s.length
    val covered = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      state = step(state, s.charAt(i))
      val ml = maxOutLen(state)
      if (ml > 0) {
        var j = i - ml + 1
        while (j <= i) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(n)
    i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      val cov = covered(i) || (w == 2 && covered(i + 1))
      if (!cov) sb.appendCodePoint(cp)
      else if (!remove) sb.append(mask)
      i += w
    }
    sb.toString
  }
}

/** Native Catalyst expression: total blocklist hits in a string column.
  * The automaton is a plan-shipped reference object; `doGenCode` emits a
  * single method call, so the expression stays inside the whole-stage
  * codegen span (the RegExpReplace pattern — referenced state, generated
  * call site) instead of falling back to interpreted eval. */
case class BlocklistHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression with StringInputCast {

  override def dataType: DataType = LongType
  override def prettyName: String = "blocklist_hits"
  override protected def withNewChildInternal(newChild: Expression): BlocklistHits =
    copy(child = newChild)

  @transient private lazy val ac = new AhoCorasick(patterns.toArray)

  override def nullSafeEval(t: Any): Any =
    ac.countHits(t.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("blocklistAc", ac,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.countHits($c.toString())")
  }
}

object BlocklistHits {
  def apply(text: Column, patterns: Seq[String]): Column =
    Bridge.column(BlocklistHits(Bridge.expression(text), patterns))
}

/** Native Catalyst expression: the [[AhoCorasick.scrub]] curation action —
  * blocklist match spans masked (offset-preserving PII/contamination
  * masking) or removed. Same plan-shipped automaton and codegen shape as
  * [[BlocklistHits]]; one walk per row regardless of blocklist size. */
case class BlocklistScrub(child: Expression, patterns: Seq[String],
                          mask: Char, remove: Boolean)
    extends UnaryExpression with StringInputCast {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "blocklist_scrub"
  override protected def withNewChildInternal(newChild: Expression): BlocklistScrub =
    copy(child = newChild)

  @transient private lazy val ac = new AhoCorasick(patterns.toArray)

  override def nullSafeEval(t: Any): Any =
    UTF8String.fromString(ac.scrub(t.asInstanceOf[UTF8String].toString, mask, remove))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("blocklistAc", ac,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString($acRef.scrub($c.toString(), (char) ${mask.toInt}, $remove))")
  }
}

object BlocklistScrub {
  def apply(text: Column, patterns: Seq[String], mask: Char = '*',
            remove: Boolean = false): Column =
    Bridge.column(BlocklistScrub(Bridge.expression(text), patterns, mask, remove))
}
