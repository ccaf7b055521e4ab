package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two numeric-array columns as a native Catalyst
  * `Expression` with `doGenCode` — the hot scalar of the whole similarity
  * family (q45 brute-force scoring, q54/q55 candidate re-scoring, q58 IVF
  * assignment score |corpus|·|centroids| times per pass).
  *
  * The previous formulation, `aggregate(zip_with(a, b, x·y), 0, +)`, is
  * correct but runs INTERPRETED: higher-order lambdas allocate a result
  * array for `zip_with` and box every element through the lambda evaluator.
  * This expression is one fused primitive loop inside WholeStageCodegen —
  * same left-to-right double accumulation, so results are bit-identical to
  * the HOF form and to DuckDB's `list_dot_product` on the double-cast list
  * (the oracle). Null semantics match the HOF form too: a length mismatch or
  * a null element yields NULL (aggregate's null absorption).
  */
object DotProduct {

  /** Column-API entry point: `DotProduct(col("a"), col("b"))`. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      DotProductExpression(
        org.apache.spark.sql.graft.Shims.expression(a),
        org.apache.spark.sql.graft.Shims.expression(b)))

  /** Shared by interpreted eval and the generated code. Returns null (boxed)
    * on length mismatch or null elements — the HOF form's null absorption. */
  def dotOrNull(x: ArrayData, y: ArrayData,
                leftFloat: Boolean, rightFloat: Boolean): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

case class DotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on length mismatch / null elems
  override def prettyName: String = "dot_product"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotResult")
      s"""
         |java.lang.Double $r = graft.functions.DotProduct.dotOrNull(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpression =
    copy(left = newLeft, right = newRight)
}
