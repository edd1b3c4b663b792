package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Column ⇄ Expression bridge.
  *
  * Spark 4's Column wraps a `ColumnNode`, and the converters
  * (`org.apache.spark.sql.classic.*`) are `private[sql]` — this
  * one-file subpackage of `org.apache.spark.sql` re-exports exactly
  * the two conversions graft's SQL-function builders need
  * ([[graft.functions.SqlFuncs]]: argument expressions in, the
  * composed Column's expression back out). No behavior of Spark is
  * altered or shadowed here.
  *
  * The Column→Expression direction must EAGERLY run the node
  * converter: `ExpressionUtils.expression` only wraps the node in a
  * lazy `ColumnNodeExpression` placeholder, which the classic Dataset
  * API unwraps while BUILDING plans — an expression returned from a
  * FunctionRegistry builder mid-analysis never passes through that
  * unwrapping and would reach codegen still Unevaluable.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
