package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace-token counter — the `\S+` match count without the regex
  * engine: a single branch-light byte loop over the UTF-8 buffer, codegen'd
  * into WholeStageCodegen. Token counting runs in the hot path of q47/q52/
  * q91 and inside the curation chain; the regex scan was the dominant cost
  * (`regexp_count` compiles once but walks the NFA per char).
  *
  * Byte-level is exact: the whitespace set is Java regex `\s` =
  * { space, \t, \n, \x0B, \f, \r } — all single-byte ASCII — and UTF-8
  * continuation/lead bytes of multi-byte characters are ≥ 0x80, never
  * whitespace, so run boundaries over bytes equal run boundaries over
  * characters (TextFunctionsSpec asserts parity with `regexp_count` on
  * unicode and pathological whitespace).
  */
object TokenCount {

  /** Shared by interpreted eval and the generated code. */
  def count64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var n = 0L
    var i = 0
    var inTok = false
    while (i < bytes.length) {
      val b = bytes(i)
      val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
      if (ws) inTok = false
      else if (!inTok) { n += 1; inTok = true }
      i += 1
    }
    n
  }

  /** Column-API entry point: `TokenCount(col("text"))`. */
  def apply(c: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      TokenCountExpression(org.apache.spark.sql.graft.Shims.expression(c)))

  /** BPE-ish token count — `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` match count as
    * a byte loop: one token per alpha run, per digit run, and per single
    * non-alnum-non-ws CHARACTER. Multi-byte UTF-8 characters count once:
    * continuation bytes (10xxxxxx) are skipped, so "é" is one symbol token
    * exactly as the regex sees it. */
  def bpeish64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var n = 0L
    var i = 0
    var run = 0 // 0 = none/ws, 1 = alpha, 2 = digit
    while (i < bytes.length) {
      val b = bytes(i)
      val alpha = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
      val digit = b >= '0' && b <= '9'
      val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
      if (alpha) { if (run != 1) { n += 1; run = 1 } }
      else if (digit) { if (run != 2) { n += 1; run = 2 } }
      else {
        run = 0
        // symbol: one token per character — count only non-continuation bytes
        if (!ws && (b & 0xC0) != 0x80) n += 1
      }
      i += 1
    }
    n
  }
}

case class TokenCountExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "token_count"

  override protected def nullSafeEval(input: Any): Any =
    TokenCount.count64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCount.count64($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCountExpression =
    copy(child = newChild)
}

/** Byte-loop twin of `regexp_count(c, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")`. */
case class BpeishCountExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpeish_token_count"

  override protected def nullSafeEval(input: Any): Any =
    TokenCount.bpeish64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCount.bpeish64($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeishCountExpression =
    copy(child = newChild)
}

object BpeishCount {
  def apply(c: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      BpeishCountExpression(org.apache.spark.sql.graft.Shims.expression(c)))
}
