package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent folding (NFD decomposition + combining-mark removal) as a
  * codegen'd Catalyst Expression — the diacritic-insensitive key pass of a
  * multilingual dedup/match pipeline: `café`, `cafe´` (combining acute) and
  * `cafe` should land in ONE dedup bucket and one vocab entry, which NFC
  * normalization ([[NfcNormalize]]) alone cannot do (it canonicalizes the
  * representation but keeps the accent).
  *
  * Same design as [[NfcNormalize]]: the JDK `Normalizer` wrapped as a
  * native `UnaryExpression` with `doGenCode` (no UDF boxing, inlines into
  * WholeStageCodegen), with the pure-ASCII zero-allocation fast path that
  * covers the overwhelming majority of a web corpus. Semantics match
  * DuckDB's `strip_accents` on Latin diacritics (the oracle's side): NFD
  * splits base + combining marks, dropping category Mn removes exactly the
  * diacritics (á→a, ü→u, ñ→n, ç→c), and everything else passes through.
  */
object StripAccents {

  /** Shared by interpreted eval and the generated code. */
  def strip(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length && bytes(i) >= 0) i += 1
    if (i == bytes.length) return s // pure ASCII: nothing to fold, zero-alloc
    val decomposed = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var j = 0
    while (j < decomposed.length) {
      val c = decomposed.charAt(j)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      StripAccentsExpression(org.apache.spark.sql.graft.Shims.expression(c)))
}

case class StripAccentsExpression(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "strip_accents"
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any =
    StripAccents.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StripAccents.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccentsExpression =
    copy(child = newChild)
}
