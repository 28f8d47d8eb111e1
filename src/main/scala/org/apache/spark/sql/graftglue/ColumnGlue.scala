package org.apache.spark.sql.graftglue

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column↔Expression and
  * LogicalPlan↔DataFrame converters — the documented extension-library
  * pattern for shipping native Catalyst expressions and custom logical
  * operators with a DataFrame-API entry point (same trick used by public
  * Spark extension libraries, e.g. Sedona's expression surface).
  * Nothing else from the internal API is touched. */
object ColumnGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an (already-resolved) logical plan as a DataFrame. */
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A one-row one-column DataFrame as a scalar-subquery Column — the form
    * expressions like `might_contain` require their build side in. */
  def scalarSubquery(df: DataFrame): Column =
    column(org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan))
}
