package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding kernels — the apply side of the corpus-trained
  * merge table ([[graft.ops.Bpe]]). The merge step is greedy LEFTMOST
  * NON-OVERLAPPING: scan the token list once, and wherever
  * (tok[i], tok[i+1]) equals the merge pair emit the concatenation and
  * skip both — so a run x,x,x under pair (x,x) becomes xx,x, exactly the
  * semantics the DuckDB oracle replays with its islands-parity windows
  * and the semantics BPE reference implementations get from
  * non-overlapping regex replacement. Encoding applies the k merges in
  * learned rank order, one pass each — identical to the corpus's own
  * training evolution (round r merged exactly pair r corpus-wide).
  *
  * `merges` is the flattened pair list [x1, y1, x2, y2, ...] so the
  * codegen reference object is a plain String[]. Both expressions are
  * codegen'd single-pass kernels: no explode, no join, no shuffle at
  * scoring time — the training loop is the only thing that aggregates.
  */
object BpeKernels {

  /** Greedy leftmost non-overlapping merge of one pair over a token
    * array (shared by training's per-round step and encode).
    */
  def mergeOnce(toks: Array[String], x: String, y: String): Array[String] = {
    val out = new Array[String](toks.length)
    var i = 0
    var n = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == x && toks(i + 1) == y) {
        out(n) = toks(i) + toks(i + 1); n += 1; i += 2
      } else {
        out(n) = toks(i); n += 1; i += 1
      }
    }
    if (n == toks.length) toks else java.util.Arrays.copyOf(out, n)
  }

  /** Tokenize one word: single characters, then the merges in rank
    * order, one greedy pass each.
    */
  def tokensOf(word: String, merges: Array[String]): Array[String] = {
    var toks = new Array[String](word.length)
    var i = 0
    while (i < word.length) { toks(i) = String.valueOf(word.charAt(i)); i += 1 }
    var m = 0
    while (m + 1 < merges.length) {
      toks = mergeOnce(toks, merges(m), merges(m + 1))
      m += 2
    }
    toks
  }

  /** Static kernel for codegen: token array of one word. */
  def tokensArray(word: UTF8String, merges: Array[String]): GenericArrayData =
    new GenericArrayData(
      tokensOf(word.toString, merges).map(UTF8String.fromString(_): Any))

  /** Static kernel for codegen: Σ |tokensOf(word)| over the
    * space-separated words of an already-normalized text.
    */
  def tokenCount(text: UTF8String, merges: Array[String]): Long = {
    val s = text.toString
    var count = 0L
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) count += tokensOf(s.substring(start, i), merges).length.toLong
        start = i + 1
      }
      i += 1
    }
    count
  }

  /** Column wrapper: BPE token array of a single word. */
  def tokens(word: Column, merges: Array[String]): Column =
    bridge.toColumn(BpeTokens(bridge.toExpression(word), merges.toSeq))

  /** Column wrapper: BPE token count of a normalized text. */
  def tokenCountCol(normalizedText: Column, merges: Array[String]): Column =
    bridge.toColumn(BpeTokenCount(bridge.toExpression(normalizedText), merges.toSeq))
}

/** `bpe_tokens(word)` — token array after applying the merge table.
  *
  * `merges` is a Seq (STRUCTURAL equality), not an Array: case-class ==
  * on an Array field is reference identity, so two semantically
  * identical expressions would never compare equal under
  * canonicalized/semanticEquals, silently defeating subexpression
  * elimination and plan-equality reuse. The Array the runtime kernel
  * wants is materialized once per expression instance.
  */
case class BpeTokens(child: Expression, merges: Seq[String])
  extends UnaryExpression {

  require(merges.length % 2 == 0, "merges must be a flattened pair list")

  @transient private lazy val mergesArr: Array[String] = merges.toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string word")
  }

  override def nullSafeEval(input: Any): Any =
    BpeKernels.tokensArray(input.asInstanceOf[UTF8String], mergesArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeMerges", mergesArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeKernels.tokensArray($c, $m)")
  }

  override protected def withNewChildInternal(c: Expression): BpeTokens =
    copy(child = c)
  override def prettyName: String = "bpe_tokens"
}

/** `bpe_token_count(normalized_text)` — Σ per-word BPE token counts.
  * Merge table held as a Seq for structural plan equality (see
  * [[BpeTokens]]).
  */
case class BpeTokenCount(child: Expression, merges: Seq[String])
  extends UnaryExpression {

  require(merges.length % 2 == 0, "merges must be a flattened pair list")

  @transient private lazy val mergesArr: Array[String] = merges.toArray

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }

  override def nullSafeEval(input: Any): Any =
    BpeKernels.tokenCount(input.asInstanceOf[UTF8String], mergesArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeMerges", mergesArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeKernels.tokenCount($c, $m)")
  }

  override protected def withNewChildInternal(c: Expression): BpeTokenCount =
    copy(child = c)
  override def prettyName: String = "bpe_token_count"
}
