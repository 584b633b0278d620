package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between public `Column`s and Catalyst `Expression`s for custom
  * expressions. Spark 4 made the Column↔Expression converters
  * `private[sql]`; this shim lives under `org.apache.spark.sql` to reach
  * them — the one sanctioned extension-point trick for libraries that add
  * native expressions without forking Spark. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
