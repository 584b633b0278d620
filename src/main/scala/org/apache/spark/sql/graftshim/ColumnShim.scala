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

  /** Bounded top-k aggregate over `c`'s values per group (array sorted
    * descending by natural ordering; `reverse` flips to k-smallest
    * ascending). `CollectTopK` is `private[sql]` in Spark 4, so the
    * constructor call lives here. */
  def collectTopK(c: Column, k: Int, reverse: Boolean): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .CollectTopK(ExpressionUtils.expression(c), k, reverse, 0, 0)
        .toAggregateExpression())

  /** Register a function into an ALREADY-RUNNING session's registry.
    * `SparkSessionExtensions` only applies while a session is being
    * constructed — a library attaching to a caller's existing session
    * (notebooks, shared test sessions) needs direct registry access,
    * which Spark 4 keeps `private[sql]`. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!registry.functionExists(name))
      registry.registerFunction(name, info, builder)
  }
}
