package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity of two `array<double>`
  * columns — the hot scalar of the ANN/near-dup path, implemented with
  * `doGenCode` so it stays inside whole-stage codegen (a Scala UDF here
  * would box both arrays and break the codegen span; the higher-order
  * `zip_with`/`aggregate` composition it replaces allocates an intermediate
  * products array per row).
  *
  * Numerics: one pass, accumulating dot/‖a‖²/‖b‖² in index order —
  * bit-identical to the sequential-fold formulation and to DuckDB's
  * `list_cosine_similarity` on `DOUBLE[]` (oracle parity). Null if either
  * side is null, lengths differ, or any element is null; NaN propagates per
  * IEEE. The per-element null guard is emitted only when the input schema
  * has `containsNull=true` (parquet default), so vectors with
  * provably-non-null elements keep the branch-free loop.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // manual type check: ExpectsInputTypes' AbstractDataType is private[sql]
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def elemsNullable: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val guard = elemsNullable
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var k = 0
    while (k < n) {
      if (guard && (x.isNullAt(k) || y.isNullAt(k))) return null
      val xv = x.getDouble(k); val yv = y.getDouble(k)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      k += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val nullGuard = if (elemsNullable)
        s"if ($a.isNullAt($k) || $b.isNullAt($k)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $k = 0; $k < $n; $k++) {
         |    $nullGuard
         |    final double $xv = $a.getDouble($k);
         |    final double $yv = $b.getDouble($k);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
}
