package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two 16-bit dimensions into one long —
  * the multi-dimensional clustering key behind data-layout pruning: sort a
  * table by `z(x, y)` before writing and every file's min/max footer spans a
  * small rectangle of BOTH dimensions, so a scan filtered on either (or
  * both) prunes most files. A single-column sort clusters only its own
  * column; Z-order is how lakehouse layouts (public Delta/Iceberg docs,
  * Morton 1966) make two-dimensional pruning work from one sort key.
  *
  * The interleave is the classic magic-number bit spread (public-domain
  * "Bit Twiddling Hacks" technique): O(1) per row, branch-free, codegen'd
  * straight into WholeStageCodegen — no UDF, no regex, no allocation.
  *
  * Inputs are masked to their low 16 bits (callers bucket or modulo their
  * real domain first — the clustering only needs bucket resolution, not the
  * full key domain). x occupies even bits, y odd bits.
  */
object ZOrder {

  /** Spread the low 16 bits of v across the even bit positions of a long. */
  def spread16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Shared by interpreted eval and generated code. */
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  def apply(x: Column, y: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      ZOrderExpression(
        org.apache.spark.sql.graft.Shims.expression(x),
        org.apache.spark.sql.graft.Shims.expression(y)))
}

case class ZOrderExpression(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder16"
  // integral inputs are widened to long at analysis time; a fractional
  // input is an analysis error, not a runtime ClassCastException
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.interleave16(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.ZOrder.interleave16($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderExpression =
    copy(left = newLeft, right = newRight)
}
