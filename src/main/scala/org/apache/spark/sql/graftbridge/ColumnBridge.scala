package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made these converters
  * `private[sql]` (`classic.ExpressionUtils`); extension libraries that
  * define custom Catalyst expressions reach them from inside the
  * `org.apache.spark.sql` namespace — the standard pattern used by Delta,
  * Iceberg, and friends.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
