package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word k-shingles of a text column as ONE fused native loop — the hottest
  * map stage of the whole dedup family (q44/q49/q217/q231/q242/q254/q262
  * all start from shingle explosion; at 100 TB this loop IS the corpus
  * pass). The declarative form —
  *
  * {{{ filter(transform(split(lower(t), "\\s+"), (x, i) ->
  *       concat_ws(' ', slice(__w, i + 1, k))), s -> size(split(s, ' ')) = k) }}}
  *
  * — runs its lambdas INTERPRETED and allocates an intermediate array per
  * higher-order function. This expression produces the identical array with
  * one pass over the token array and no intermediate allocations, inside
  * WholeStageCodegen.
  *
  * EXACT-parity discipline: tokenization calls the very UTF8String methods
  * the declarative chain bottoms out in (`toLowerCase`, `split(regex, -1)`,
  * `concatWs`), so quirks round-trip bit-for-bit — a leading-whitespace text
  * yields an empty first token whose window joins to " a b" exactly as
  * `concat_ws` does, and the tail windows shorter than k are dropped, which
  * is precisely what the `size(split(s, ' ')) = k` filter keeps (tokens
  * contain no whitespace, so window-length k ⟺ the re-split size test; the
  * only empty tokens are a leading one from leading whitespace and a
  * trailing one from trailing whitespace — `split(regex, -1)` keeps both —
  * and `concat_ws` preserves them, so the re-split size test still holds).
  * PropertySpec asserts bit-equality against the declarative form on random
  * unicode/whitespace inputs.
  *
  * `distinct = true` keeps first occurrences in order (= `array_distinct`);
  * false keeps every window with its position (the positional-shingle form —
  * full windows are the contiguous prefix i = 0..n−k, so the filtered
  * array's index IS the token offset).
  */
object WordShingles {
  private val Sep = UTF8String.fromString(" ")
  private val Ws = UTF8String.fromString("\\s+")

  def shingles(text: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    val parts = text.toLowerCase.split(Ws, -1)
    val n = parts.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef](n - k + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var i = 0
    while (i <= n - k) {
      val window = new Array[UTF8String](k)
      System.arraycopy(parts, i, window, 0, k)
      val s = UTF8String.concatWs(Sep, window: _*)
      if (!distinct || seen.add(s)) out.add(s)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point: `WordShingles(col("text"), k)`. */
  def apply(c: Column, k: Int, distinct: Boolean = true): Column =
    org.apache.spark.sql.graft.Shims.column(
      WordShinglesExpression(org.apache.spark.sql.graft.Shims.expression(c),
        k, distinct))
}

case class WordShinglesExpression(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {
  require(k >= 1, "WordShingles: k must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShingles.shingles($c, $k, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpression =
    copy(child = newChild)
}
