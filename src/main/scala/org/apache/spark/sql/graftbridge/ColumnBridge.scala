package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the helpers `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so libraries defining
  * native Catalyst expressions use a bridge inside the sql namespace — the
  * standard extension-library technique (same access pattern Spark's own
  * connector modules use). Only this file lives in the Spark namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** LogicalPlan → DataFrame (classic Dataset.ofRows is `private[sql]` in
    * Spark 4) — used by optimizer rules that rebuild a matched subtree
    * through the public DataFrame operators. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
