package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a native `TypedImperativeAggregate`:
  * at most `k` (item, count) counters per partial buffer, merged with the
  * mergeable-summaries reduction (Agarwal et al., PODS'12) — so a
  * billion-row group shuffles ≤ k counters per partition, constant space
  * at any scale (the frequent-items complement of the HLL/percentile
  * sketches in operators/Sketches.scala).
  *
  * Deterministic guarantees (hold for ANY update/merge order, which is what
  * makes the estimate gate-checkable even though the tracked SET is
  * partition-dependent):
  *  - `est(t) ≤ true(t)` — MG never overcounts;
  *  - `est(t) ≥ true(t) − n/(k+1)` for every item (est = 0 if untracked),
  *    where n is the total count — so anything with `true(t) > n/(k+1)`
  *    is guaranteed tracked.
  *
  * Output: `array<struct<item string, est bigint>>`, est desc / item asc.
  * Null items are ignored.
  */
case class MisraGries(itemExpr: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with org.apache.spark.sql.graftglue.StringInputCast {

  require(k > 0, s"k must be positive, got $k")

  // input type contract (via StringInputCast): the item must arrive as a
  // STRING — update()'s buffer key is the item's string value, and catalyst
  // containers (UnsafeArrayData etc.) have no stable toString. Atomic
  // non-string inputs (ints, dates) implicit-cast to string at analysis;
  // arrays/structs/binary have no implicit cast and fail the query at
  // analysis instead of silently aggregating object identities.
  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))))
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = itemExpr.eval(input)
    if (v != null) {
      val s = v.toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < k => buf.update(s, 1L)
        case None =>
          // classic MG step: a full summary + unseen item decrements ALL
          // counters (the new item's +1 and k counters' −1 cancel into a
          // net −1 across k+1 distinct items)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { key =>
            val c = buf(key) - 1
            if (c == 0) dead += key else buf.update(key, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) => buf.update(s, buf.getOrElse(s, 0L) + c) }
    if (buf.size > k) {
      // mergeable-summaries reduction: subtract the (k+1)-th largest count
      // from every counter, drop the non-positive — ≤ k survive and the
      // n/(k+1) error bound is preserved
      val vs = buf.values.toArray
      java.util.Arrays.sort(vs)
      val m = vs(vs.length - 1 - k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { key =>
        val c = buf(key) - m
        if (c <= 0) dead += key else buf.update(key, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (s, c) => (-c, s) }
    new GenericArrayData(sorted.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    }.asInstanceOf[Array[Any]])
  }

  // length-prefixed raw UTF-8, not writeUTF: writeUTF throws on items
  // whose encoding exceeds 64 KB, and misra_gries is SQL-reachable on
  // arbitrary strings (e.g. whole documents as items)
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(itemExpr = newChildren(0))
}

object MisraGries {
  /** Column-API entry point: `misra_gries(item, k)`. */
  def apply(item: Column, k: Int): Column =
    Bridge.column(MisraGries(Bridge.expression(item), k).toAggregateExpression())
}
