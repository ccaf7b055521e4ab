package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp–Rabin polynomial fingerprint of a string — the document
  * fingerprinting primitive for corpus-scale dedup bookkeeping.
  *
  * `h = (h·31 + byte) mod 1_000_000_007` over the UTF-8 bytes. The prime
  * modulus keeps every intermediate inside a signed 64-bit value, which makes
  * the function replicable in engines without wrapping arithmetic (the DuckDB
  * oracle computes it with `list_reduce`). Implemented as a native Catalyst
  * `Expression` with `doGenCode`, so it participates in WholeStageCodegen
  * with zero UDF serialization overhead — the preferred extension shape when
  * built-ins can't express a scalar (SURVEY.md §4.3).
  */
object RollingHash {
  val Modulus = 1000000007L

  /** Shared by interpreted eval and the generated code. */
  def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31L + (bytes(i) & 0xffL)) % Modulus; i += 1 }
    h
  }

  /** Column-API entry point: `RollingHash(col("text"))`. */
  def apply(c: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      RollingHashExpression(org.apache.spark.sql.graft.Shims.expression(c)))
}

case class RollingHashExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash64($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpression =
    copy(child = newChild)
}
