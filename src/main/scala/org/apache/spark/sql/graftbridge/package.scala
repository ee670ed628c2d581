package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge into Spark's `private[sql]` Column <-> Expression
 * converters (Spark 4 routes Column through ColumnNode; the public
 * conversion lives in `classic.ExpressionUtils`). Lives in the
 * org.apache.spark.sql namespace solely for access; everything else
 * in this library stays under `graft`.
 */
package object graftbridge {
  def exprToColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def columnToExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `Dataset.ofRows` is `private[sql]`; custom logical plans (graft's
    * TopKPerGroup) need it to become DataFrames. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
