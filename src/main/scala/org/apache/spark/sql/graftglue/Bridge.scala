package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the Column API backend-agnostic
  * and scoped the classic converters `private[sql]`, so a library adding
  * native Catalyst expressions needs this one-file shim inside the sql
  * namespace (the same pattern used by typed-Dataset/expression libraries
  * in the wild). Keep it minimal: nothing else belongs in this package.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
