package graft

import graft.functions.{CosineSimilarity, SimHash64, SortedArrayJaccard}
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
 * custom expressions/rules/strategies (SURVEY §4.3). Reference PARITY
 * needs only the function injections; the group-wise top-k operator
 * (strategy + rule, `graft.plans.TopKPerGroup`) is the beyond-parity
 * whole-operator extension.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(e.injectFunction)
    // whole-operator extension (SURVEY §4.3 ladder (c)): group-wise
    // top-k logical node, its planner strategy and its optimizer rule.
    // graft.plans.TopKPerGroup.apply also self-registers these on the
    // session's experimental hooks for sessions built without
    // withExtensions — this injection covers SQL-configured sessions
    // (spark.sql.extensions=graft.GraftExtensions).
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    e.injectOptimizerRule(_ => graft.plans.CombineTopK)
  }
}

object GraftExtensions {
  /** The registered native-function surface — one list shared by the
    * session-extensions hook and the spec that drives each builder
    * through SQL. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))),
    (new FunctionIdentifier("sorted_jaccard"),
      new ExpressionInfo(classOf[SortedArrayJaccard].getName, "sorted_jaccard"),
      (exprs: Seq[Expression]) => SortedArrayJaccard(exprs(0), exprs(1))),
    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs(0))))
}
