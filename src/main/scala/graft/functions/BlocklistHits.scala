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

  // trie: per-node char→child transitions, failure links, and the
  // PRE-COLLAPSED output count (own terminal count + fail-chain counts)
  private val children = {
    val buf = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(0)
    patterns.foreach { p =>
      var s = 0
      p.foreach { c =>
        val next = buf(s).get(c)
        s = if (next != null) next.intValue()
        else {
          buf += new java.util.HashMap[Character, Integer]()
          ends += 0
          buf(s).put(c, buf.length - 1)
          buf.length - 1
        }
      }
      ends(s) += 1
    }
    (buf.toArray, ends.toArray)
  }
  private val nodes: Array[java.util.HashMap[Character, Integer]] = children._1
  private val fail: Array[Int] = new Array[Int](nodes.length)
  private val cumOut: Array[Long] = {
    val out = children._2.map(_.toLong)
    // BFS: failure links + output-count collapse (parent fail before child)
    val queue = new java.util.ArrayDeque[Integer]()
    nodes(0).forEach((_, v) => { fail(v.intValue()) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      out(u) += out(fail(u))
      nodes(u).forEach { (c, v) =>
        val vi = v.intValue()
        var f = fail(u)
        while (f != 0 && !nodes(f).containsKey(c)) f = fail(f)
        val t = nodes(f).get(c)
        fail(vi) = if (t != null && t.intValue() != vi) t.intValue() else 0
        queue.add(v)
      }
    }
    out
  }

  /** Total match count over all patterns, overlaps included. */
  def countHits(s: String): Long = {
    var state = 0
    var hits = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val c = Character.valueOf(s.charAt(i))
      var t = nodes(state).get(c)
      while (t == null && state != 0) {
        state = fail(state)
        t = nodes(state).get(c)
      }
      state = if (t != null) t.intValue() else 0
      hits += cumOut(state)
      i += 1
    }
    hits
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
