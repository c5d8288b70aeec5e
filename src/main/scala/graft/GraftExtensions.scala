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
  *  - `extract_sites(string, array<int>)` — one-pass multi-position
  *    genome lookup ([[graft.functions.ExtractSites]])
  *
  * The programmatic `VecExpressions.register` / `SeqExpressions
  * .register` paths stay for sessions built without the config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[graft.functions.VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => graft.functions.VecDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("extract_sites"),
      new ExpressionInfo(classOf[graft.functions.ExtractSites].getName, "extract_sites"),
      (exprs: Seq[Expression]) => graft.functions.ExtractSites(exprs(0), exprs(1))))
  }
}
