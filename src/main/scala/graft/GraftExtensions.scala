package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark plugin entry point — makes the library's native Catalyst
  * expressions available to ANY session (including pure-SQL users and
  * thrift/connect servers) via
  * `spark.sql.extensions=graft.GraftExtensions`, with no programmatic
  * `register()` call. The injected functions are the engine's two
  * codegen expressions:
  *
  *  - `vec_dot(array<float>, array<float>)` — the ANN/dedup dot
  *    product ([[graft.functions.VecDot]])
  *  - `vec_dot_l` / `vec_sqdist_l` (array<bigint> × 2) — the
  *    BIGINT-exact quantized dot / squared-L2 kernels
  *    ([[graft.functions.VecDotL]], [[graft.functions.VecSqDistL]])
  *  - `extract_sites(string, array<int>)` — one-pass multi-position
  *    genome lookup ([[graft.functions.ExtractSites]])
  *
  * The programmatic `VecExpressions.register` / `SeqExpressions
  * .register` paths stay for sessions built without the config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def binary(name: String, build: (Expression, Expression) => Expression)
      (exprs: Seq[Expression]): Expression = {
    // wrong arity must be a clean analysis-time error, not a silent
    // argument drop or a raw IndexOutOfBoundsException
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"$name requires exactly 2 arguments, got ${exprs.length}")
    build(exprs(0), exprs(1))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // every registered optimizer rule (the O(n²) tail-frame → O(n)
    // running-twin rewrite; the bounded-heap top-k re-inliner) — one
    // registry shared with GraftSession, swept by RuleIdentitySpec
    for ((_, rule) <- graft.plans.GraftRules.injected)
      ext.injectOptimizerRule(_ => rule)
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[graft.functions.VecDot].getName, "vec_dot"),
      binary("vec_dot", graft.functions.VecDot.apply) _))
    ext.injectFunction((
      FunctionIdentifier("vec_dot_l"),
      new ExpressionInfo(classOf[graft.functions.VecDotL].getName, "vec_dot_l"),
      binary("vec_dot_l", graft.functions.VecDotL.apply) _))
    ext.injectFunction((
      FunctionIdentifier("vec_sqdist_l"),
      new ExpressionInfo(classOf[graft.functions.VecSqDistL].getName, "vec_sqdist_l"),
      binary("vec_sqdist_l", graft.functions.VecSqDistL.apply) _))
    ext.injectFunction((
      FunctionIdentifier("extract_sites"),
      new ExpressionInfo(classOf[graft.functions.ExtractSites].getName, "extract_sites"),
      binary("extract_sites", graft.functions.ExtractSites.apply) _))
  }
}
