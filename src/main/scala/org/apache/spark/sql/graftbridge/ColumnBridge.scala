package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 decouples `Column` from Catalyst `Expression`; the public
  * conversion lives in `classic.ExpressionUtils`, which is
  * `private[sql]`. This bridge (inside the sql package, the standard
  * extension-library idiom) re-exports just the two conversions graft's
  * custom expressions need. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
