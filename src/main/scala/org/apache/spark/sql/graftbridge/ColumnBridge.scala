package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor; the sanctioned
  * bridge (classic.ExpressionUtils) is private[sql]. This shim lives inside
  * the org.apache.spark.sql package namespace solely to expose the two
  * conversions our custom Catalyst expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Same-package bridge for Dataset.ofRows (private[sql] in Spark 4): lets
  * an optimizer rule rebuild a subplan with the DataFrame API — the
  * analyzer then owns attribute deduplication for any self-referencing
  * branches, which a hand-assembled catalyst tree would have to redo.
  */
object DatasetBridge {
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
