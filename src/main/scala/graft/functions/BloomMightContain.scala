package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainLong(key)` as a codegen'd Catalyst `Expression` — the
  * probe side of bloom-filter join pruning ([[graft.ops.Relational
  * .bloomPrunedSemiJoin]]).
  *
  * The sketch travels as its serialized bytes (a few hundred KB for tens of
  * millions of keys at 1% fpp) and is rehydrated once per task via a
  * transient lazy val, so the generated code per row is a single virtual
  * call + hash probe — no UDF boxing, and the filter stays inside
  * WholeStageCodegen where it can run before the fact table's exchange.
  */
case class BloomMightContainExpression(child: Expression, bits: Array[Byte])
    extends UnaryExpression with ImplicitCastInputTypes {
  // narrower integral keys widen at plan time — without this, an
  // IntegerType child (or a foldable one evaluated interpreted by
  // ConstantFolding) throws ClassCastException in nullSafeEval
  override def inputTypes: Seq[DataType] = Seq(LongType)

  // ImplicitCastInputTypes would also accept a STRING key (string→long is a
  // legal implicit cast): non-numeric strings cast to NULL, silently
  // filtering every row instead of failing analysis. The analyzer wraps the
  // original child in a Cast before this check runs, so look through it.
  override def checkInputDataTypes(): TypeCheckResult = child match {
    case c: Cast if c.child.dataType.isInstanceOf[StringType] =>
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain requires an integral key column, got STRING " +
          "(hash string keys to a long — e.g. xxhash64 — on BOTH the build " +
          "and probe side instead)")
    case _ => super.checkInputDataTypes()
  }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bits))

  /** Shared by interpreted eval and the generated code. */
  def test(v: Long): Boolean = bf.mightContainLong(v)

  override protected def nullSafeEval(input: Any): Any =
    test(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this)
    defineCodeGen(ctx, ev, c => s"$ref.test($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpression =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column-API entry point over a LongType key column. */
  def apply(key: Column, bloomBytes: Array[Byte]): Column =
    org.apache.spark.sql.graft.Shims.column(
      BloomMightContainExpression(
        org.apache.spark.sql.graft.Shims.expression(key), bloomBytes))

  /** Serialize a built sketch for shipping inside the expression. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
