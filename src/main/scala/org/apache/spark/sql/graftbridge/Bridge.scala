package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge.
  *
  * Spark 4 made `Column` a thin wrapper over `ColumnNode` and scoped the
  * conversion helpers `private[sql]`; this package-placed shim re-exports the
  * two calls the engine's custom expressions need. No Spark internals are
  * modified — this is the same access path `ClassicConversions` offers
  * implicitly inside Spark itself.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
