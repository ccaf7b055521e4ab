package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayAggregate, Cast, Expression,
  LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.expressions.Add
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotProductExpression

/** Optimizer rule: strength-reduce the higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v) }}}
  *
  * to the native codegen'd [[graft.functions.DotProductExpression]]. The HOF
  * form is what a plain-Spark user writes, and it runs INTERPRETED: `zip_with`
  * allocates an intermediate array and every element boxes through the lambda
  * evaluator (measured ~2× slower on the q45/q54/q55/q58 hot paths). The
  * rewrite gives those users the fused primitive loop without a code change —
  * the classic `SparkSessionExtensions` win.
  *
  * Semantics-preserving by construction, so the match is deliberately narrow:
  *  - zero literal is double 0.0 and the product is DOUBLE-typed — each zip
  *    variable used bare (double arrays) or cast to double (float arrays),
  *    exactly the widen-then-multiply order the native loop uses. A float×float
  *    product (rounds each product to float first) is NOT rewritten.
  *  - merge is `acc + v` over the two untouched merge variables (either order,
  *    + is commutative on these doubles; accumulation order is unchanged).
  *  - finish is the identity lambda.
  * Null behavior already coincides: null element or length mismatch (zip_with
  * null-pads) absorbs to NULL in both forms.
  *
  * Idempotent (the result contains no ArrayAggregate), so safe in the
  * fixed-point operator-optimization batch. */
object NativeDotProduct extends Rule[LogicalPlan] {

  /** The zip variable itself, or `cast(var as double)` — the two element
    * shapes whose product equals the native widen-then-multiply. */
  private def asZipVar(e: Expression): Option[NamedLambdaVariable] = e match {
    case v: NamedLambdaVariable => Some(v)
    case c: Cast if c.dataType == DoubleType =>
      c.child match { case v: NamedLambdaVariable => Some(v); case _ => None }
    case _ => None
  }

  private def isVector(e: Expression): Boolean = e.dataType match {
    case ArrayType(t, _) => t == DoubleType || t == FloatType
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(mult: Multiply, Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable), _)),
          // bit-exact +0.0 only: Scala's boxed-double == would also match
          // -0.0, but aggregate(..., -0D, ...) starting from negative zero
          // is NOT equivalent when the true sum is -0.0 — leave it alone
          zero @ Literal(_, DoubleType),
          LambdaFunction(add: Add, Seq(lacc: NamedLambdaVariable, lv: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(lfin: NamedLambdaVariable), _))
        if (zero.value match {
            case v: java.lang.Double => java.lang.Double.doubleToRawLongBits(v) == 0L
            case _ => false
          }) &&
          mult.dataType == DoubleType && isVector(a) && isVector(b) &&
          fin.exprId == lfin.exprId &&
          (for { x <- asZipVar(mult.left); y <- asZipVar(mult.right) }
            yield Set(x.exprId, y.exprId) == Set(lx.exprId, ly.exprId)).getOrElse(false) &&
          ((add.left, add.right) match {
            case (l: NamedLambdaVariable, r: NamedLambdaVariable) =>
              Set(l.exprId, r.exprId) == Set(lacc.exprId, lv.exprId)
            case _ => false
          }) =>
      DotProductExpression(a, b)
  }
}
