package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DotProductF, DotProductL, Md5Prefix60, MinhashSignature, SimhashSignature}

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
    // `minhash_signature(hashes, k)` — k must be a foldable int (it is a
    // shape parameter: the output array length, fixed at plan time).
    e.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinhashSignature].getName,
        "minhash_signature"),
      exprs => {
        require(exprs.length == 2 && exprs(1).foldable,
          "minhash_signature(hashes, k) needs a literal int k")
        MinhashSignature(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue())
      }))
    e.injectFunction((
      new FunctionIdentifier("simhash_signature"),
      new ExpressionInfo(classOf[SimhashSignature].getName,
        "simhash_signature"),
      exprs => SimhashSignature(exprs.head)))
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKey.Strategy)
    e.injectOptimizerRule(_ => graft.plans.TopKPerKey.RowNumberToTopK)
  }
}
