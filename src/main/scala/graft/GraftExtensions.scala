package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session extensions registering graft's native functions for SQL use:
 *
 * {{{
 * SparkSession.builder()
 *   .withExtensions(new GraftExtensions)
 *   ...
 * spark.sql("SELECT cosine_sim(a.embedding, b.embedding) FROM ...")
 * }}}
 *
 * The SparkSessionExtensions hook is the supported injection point for
 * custom expressions/rules/strategies (SURVEY §4.3 — no custom Rule or
 * Strategy is needed for parity; functions are the only injection).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
  }
}
