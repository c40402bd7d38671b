package org.apache.spark.sql
package graftsql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge for `private[sql]` Column↔Expression converters — the
  * standard pattern for Spark extension libraries (Spark 4 hides the
  * classic Column internals behind the sql package boundary). Nothing else
  * in graft lives outside the `graft` namespace. */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
