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

  /** `TaskContext.taskMemoryManager()` is `private[spark]`; graft's
    * TopKPerGroup final phase registers its heap table with it (as a
    * `MemoryConsumer`) so Spark's memory manager both SEES the table's
    * bytes and can FORCE it to spill under pressure — the
    * production-grade version of a row/group-count spill knob. */
  def taskMemoryManager(tc: org.apache.spark.TaskContext)
      : org.apache.spark.memory.TaskMemoryManager =
    tc.taskMemoryManager()

  /** Eager localCheckpoint that DROPS the carried plan statistics.
    *
    * Spark 4's `Dataset.localCheckpoint` copies the ORIGIN plan's
    * estimated `Statistics` onto the resulting `LogicalRDD`
    * (ExistingRDD.scala `rewriteStatsAndConstraints`). In an iterative
    * kernel that SELF-JOINS its own checkpointed output (pointer
    * jumping, transitive closure), the carried `sizeInBytes` estimate
    * SQUARES every round — the BigInt reaches millions of bits within
    * ~15 rounds and the next checkpoint's stats walk becomes the
    * entire job (observed: minutes of driver CPU inside
    * BigInteger.multiply at 2k input rows). Rebuilding the LogicalRDD
    * with originStats = None resets each round to the conf default, so
    * per-round planning cost stays constant. Linear chains (frontier ⋈
    * static edges) don't compound and keep the plain localCheckpoint. */
  def statlessLocalCheckpoint(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    ck.queryExecution.logical match {
      case lr: execution.LogicalRDD =>
        ofRows(ck.sparkSession,
          execution.LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(
            ck.sparkSession.asInstanceOf[classic.SparkSession], None, None))
      case _ => ck
    }
  }
}
