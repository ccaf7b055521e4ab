package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProductExpression, RollingHashExpression}

/** Session-extension entry point — the deployment story for the engine's
  * native functions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * registers them in EVERY session (SQL, thriftserver, notebooks) at startup,
  * with no per-session `Shims.registerFunction` call. Injection happens at
  * the Catalyst `FunctionRegistry` level, so `rolling_hash(col)` parses to
  * the native codegen expression — not a UDF wrapper.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHashExpression].getName, "rolling_hash"),
      (children: Seq[Expression]) => {
        // real arity error, not a silent drop of extra args / head-of-empty
        if (children.size != 1)
          throw new IllegalArgumentException(
            s"rolling_hash expects exactly 1 argument, got ${children.size}")
        RollingHashExpression(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpression].getName, "dot_product"),
      (children: Seq[Expression]) => {
        if (children.size != 2)
          throw new IllegalArgumentException(
            s"dot_product expects exactly 2 arguments, got ${children.size}")
        DotProductExpression(children.head, children(1))
      }))
    // plan-level rewrite: plain-Spark HOF dot products become the native
    // codegen'd expression (see graft.plans.NativeDotProduct for the contract)
    ext.injectOptimizerRule(_ => graft.plans.NativeDotProduct)
  }
}
