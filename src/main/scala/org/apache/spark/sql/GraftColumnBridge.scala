package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Bridge between the backend-agnostic `Column` (Spark 4's ColumnNode
  * form) and catalyst `Expression`s, needed to expose custom expressions
  * as user-facing Columns. The classic converters are `private[sql]`, so
  * this one-file shim lives in the sql package — the standard extension
  * technique for libraries that add native expressions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
}
