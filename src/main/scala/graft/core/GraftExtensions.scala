package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DotProductF, DotProductL, Md5Prefix60}

/** SparkSessionExtensions hook: injects the engine's custom Catalyst
  * expressions AND planner strategies into every session built with
  * `spark.sql.extensions=graft.core.GraftExtensions` (wired by
  * [[GraftSession]]), so `dot_f`/`dot_l` resolve in SQL text and
  * [[graft.plans.TopKPerKey]] nodes plan, without per-session
  * registration calls. This is the extension tier the builder prompt's
  * preference order (c) describes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotProductF].getName, "dot_f"),
      exprs => DotProductF(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("dot_l"),
      new ExpressionInfo(classOf[DotProductL].getName, "dot_l"),
      exprs => DotProductL(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("md5_prefix60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "md5_prefix60"),
      exprs => Md5Prefix60(exprs.head)))
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKey.Strategy)
    e.injectOptimizerRule(_ => graft.plans.TopKPerKey.RowNumberToTopK)
  }
}
