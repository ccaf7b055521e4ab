package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst Expression — the
  * canonical-composition pass every web-scraped corpus needs before hashing,
  * dedup, or tokenization: `e` + U+0301 (combining acute) and the precomposed
  * `é` are DIFFERENT byte strings that render identically, so un-normalized
  * text silently defeats exact dedup (q43), fingerprinting (q53), and
  * vocabulary building (the same surface word lands in two vocab entries).
  *
  * Spark has no normalization built-in; the usual fallback is a Scala UDF
  * (serialization + boxing per row, opaque to codegen). This is the same JDK
  * `java.text.Normalizer` call wrapped as a native `UnaryExpression` with
  * `doGenCode`, so it inlines into WholeStageCodegen like any built-in.
  *
  * The fast path matters at corpus scale: `Normalizer.isNormalized` is a
  * cheap scan that short-circuits the (allocating) `normalize` call, and
  * ASCII — the overwhelming majority of a web corpus — never allocates.
  * (Reference context: the collectors in `Data Collection/` store raw API
  * text verbatim; normalization is the first thing a consumer must do.)
  */
object NfcNormalize {

  /** Shared by interpreted eval and the generated code. Two-tier fast path:
    * pure-ASCII input (no high bit anywhere — the overwhelming web-corpus
    * majority) is NFC by definition and returns the SAME UTF8String with no
    * String decode and no allocation at all; otherwise `isNormalized` (a
    * scan, no allocation beyond the decoded String) still short-circuits
    * the allocating `normalize` call. */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length && bytes(i) >= 0) i += 1
    if (i == bytes.length) return s // pure ASCII: already NFC, zero-alloc
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      NfcNormalizeExpression(org.apache.spark.sql.graft.Shims.expression(c)))
}

case class NfcNormalizeExpression(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"
  // a non-string child is a plan-time AnalysisException, not a mid-job
  // executor ClassCastException
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpression =
    copy(child = newChild)
}
