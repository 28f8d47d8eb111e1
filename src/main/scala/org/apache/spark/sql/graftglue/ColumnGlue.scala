package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column↔Expression converters —
  * the documented extension-library pattern for shipping native Catalyst
  * expressions with a DataFrame-API entry point (same trick used by
  * public Spark extension libraries, e.g. Sedona's expression surface).
  * Nothing else from the internal API is touched. */
object ColumnGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
