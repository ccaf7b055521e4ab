package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document lexicon valence sum (integer tenths) in ONE pass over the
  * text — the native-expression form of the q34 sentiment scorer.
  *
  * The relational form ([[graft.ops.Sentiment.scoreByLexiconJoin]]) explodes
  * whitespace tokens, joins the broadcast lexicon and hash-aggregates back to
  * one row per document: correct and Catalyst-visible, but the explode
  * multiplies the row count by document length and the partial/final agg
  * SHUFFLES once per scoring pass. For a 14-word lexicon that machinery is
  * all overhead — this expression computes the identical sum as a straight
  * byte loop inside WholeStageCodegen: no explode, no join, no exchange;
  * scoring becomes a pure map-side projection that composes with whatever
  * shuffle the surrounding query already has (the same reasoning as
  * [[TokenCount]] vs `regexp_count`).
  *
  * Parity contract with the join form (`SentimentModerationSpec` asserts it):
  *  - tokenization is `split(lower(text), "\\s+")`: the input is lowercased
  *    ONCE with the same `UTF8String.toLowerCase` that `lower()` uses, and
  *    token boundaries are runs of Java-regex `\s` = the six ASCII
  *    whitespace bytes — multi-byte UTF-8 units are ≥ 0x80, never
  *    whitespace, so byte walking equals regex splitting (leading-empty
  *    tokens the regex split keeps match nothing, so the sum is unaffected);
  *  - each token is matched EXACTLY (byte equality) against the bundled
  *    lexicon, valences in the same `round(v·10)` integer tenths, so the
  *    per-document sum is the same exact long the join path aggregates.
  *
  * NULL text yields NULL (standard unary null semantics); callers that need
  * the join form's "no tokens → 0" convention coalesce, as
  * [[graft.ops.Sentiment.scoreByLexiconNative]] does.
  */
object LexiconScore {

  /** Canonical bundled word → valence table (VADER's [-4, 4] convention,
    * deterministic stand-in for its lexicon — reference scorer:
    * `Data Analysis/Reddit_4chan_Analysis.py:145-163`). The single source of
    * truth: [[graft.ops.Sentiment.lexicon]] republishes this for the
    * relational and UDF forms. */
  val words: Seq[(String, Double)] = Seq(
    "good" -> 1.9, "great" -> 3.1, "love" -> 3.2, "win" -> 2.8, "fast" -> 2.1,
    "big" -> 1.2, "merge" -> 0.6, "bad" -> -2.5, "hate" -> -2.7, "slow" -> -1.8,
    "error" -> -2.2, "small" -> -0.9, "crash" -> -3.0, "fail" -> -2.3)

  // candidates bucketed by byte length (all lexicon words are ASCII, so byte
  // length = char length): the matcher compares a token only against the
  // handful of entries sharing its length — ≤ 6 candidate compares of ≤ 5
  // bytes, zero allocation per token
  private val byLen: Array[Array[(Array[Byte], Long)]] = {
    val max = words.map(_._1.length).max
    val buckets = Array.fill(max + 1)(List.empty[(Array[Byte], Long)])
    words.foreach { case (w, v) =>
      buckets(w.length) ::= (w.getBytes("UTF-8"), math.round(v * 10))
    }
    buckets.map(_.reverse.toArray)
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  private def matchTenths(bytes: Array[Byte], start: Int, len: Int): Long = {
    if (len >= byLen.length) return 0L
    val cands = byLen(len)
    var c = 0
    while (c < cands.length) {
      val (w, v) = cands(c)
      var i = 0
      while (i < len && bytes(start + i) == w(i)) i += 1
      if (i == len) return v
      c += 1
    }
    0L
  }

  /** Shared by interpreted eval and the generated code. */
  def tenths(s: UTF8String): Long = {
    val bytes = s.toLowerCase.getBytes
    var sum = 0L
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) sum += matchTenths(bytes, start, i - start)
    }
    sum
  }

  /** Column-API entry point: `LexiconScore(col("text"))` → long tenths. */
  def apply(c: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      LexiconScoreExpression(org.apache.spark.sql.graft.Shims.expression(c)))
}

case class LexiconScoreExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "lexicon_score_tenths"

  override protected def nullSafeEval(input: Any): Any =
    LexiconScore.tenths(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LexiconScore.tenths($c)")

  override protected def withNewChildInternal(newChild: Expression): LexiconScoreExpression =
    copy(child = newChild)
}
