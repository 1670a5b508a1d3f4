package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text profiling kernels.
  *
  * The declarative forms cost one full regex traversal per measured
  * class (4 `regexp_replace` passes for ratios, 40 for the stopword
  * language-ID) and allocate an intermediate string each — per document.
  * At corpus scale the profile should be ONE scan-side pass; these
  * kernels fold every count in a single character loop.
  *
  * Class semantics are defined over CODE POINTS with regex-portable
  * classes, so the same counts come out of Java, RE2 (DuckDB), and the
  * kernel: alpha = \p{L} (`Character.isLetter(cp)`), digit = \p{N}
  * (`Character.getType(cp)` ∈ {Nd, Nl, No}), punct = POSIX ASCII
  * punctuation (\p{Punct}), space = the explicit set
  * `[\t\n\x0B\f\r ]` (NOT `Character.isWhitespace` or an engine's \s —
  * those disagree between Java and RE2 on U+000B/U+001C-1F/U+2028);
  * tokens = non-space runs; subwords = letter runs + \p{N} runs + other
  * non-space chars (the BPE-ish pre-tokenizer classes
  * `\p{L}+|\p{N}+|[^\p{L}\p{N}\t\n\x0B\f\r ]`). n_chars counts code
  * points, matching Spark `length()` and DuckDB `length()`.
  */
object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_space", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_subwords", LongType, nullable = false)))

  @inline private def isAsciiPunct(cp: Int): Boolean =
    (cp >= '!' && cp <= '/') || (cp >= ':' && cp <= '@') ||
      (cp >= '[' && cp <= '`') || (cp >= '{' && cp <= '~')

  /** The regex-portable \s subset: [\t\n\x0B\f\r ]. */
  @inline private def isSpaceClass(cp: Int): Boolean =
    cp == ' ' || (cp >= '\t' && cp <= '\r') // \t \n \x0B \f \r

  /** \p{N}: decimal digit, letter number, other number. */
  @inline private def isNumberClass(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
  }

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    var chars = 0L
    var alpha = 0L; var digit = 0L; var punct = 0L; var space = 0L
    var tokens = 0L; var subwords = 0L
    var prevClass = 0 // 0=space/none, 1=letter, 2=number, 3=other
    var prevSpace = true
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      chars += 1
      val ws = isSpaceClass(cp)
      val letter = Character.isLetter(cp)
      val dig = isNumberClass(cp)
      if (letter) alpha += 1
      if (dig) digit += 1
      if (isAsciiPunct(cp)) punct += 1
      if (ws) space += 1
      if (!ws && prevSpace) tokens += 1
      val cls = if (ws) 0 else if (letter) 1 else if (dig) 2 else 3
      // subword starts: new letter run, new number run, every "other" char
      if (cls == 3 || (cls != 0 && cls != prevClass)) subwords += 1
      prevClass = cls
      prevSpace = ws
      i += Character.charCount(cp)
    }
    InternalRow(chars, alpha, digit, punct, space, tokens, subwords)
  }
}

/** text_stats_native(text): all character-class and token counts in one pass. */
case class TextStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextStats.schema
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument")
    }

  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextStats.compute($a)")

  override protected def withNewChildInternal(c: Expression): TextStatsExpr = copy(child = c)
  override def prettyName: String = "text_stats_native"
}

/** lang_id(text): stopword-count language ID over a fixed 5-language
  * list, argmax of per-language hits, 'und' when nothing matches.
  * One lowercase/normalize pass + substring scans — no regex.
  */
object LangIdKernel {
  // language order is the tie-break order (first wins on equal hits)
  val langs: Array[String] = Array("en", "de", "fr", "es", "it")
  val stopwords: Array[Array[String]] = Array(
    Array("the", "and", "of", "to", "is", "in", "that", "it"),
    Array("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    Array("le", "la", "les", "et", "est", "une", "que", "pas"),
    Array("el", "la", "los", "y", "es", "una", "que", "no"),
    Array("il", "la", "che", "e", "di", "un", "per", "non"))

  def compute(text: UTF8String): UTF8String = {
    // normalize: lowercase, [\t\n\x0B\f\r ] runs → single space, padded
    // (the same regex-portable ws class as TextStats, for oracle parity:
    // counting " word " occurrences in this padding equals counting
    // space-split tokens equal to `word`)
    val raw = text.toString
    val sb = new java.lang.StringBuilder(raw.length + 2)
    sb.append(' ')
    var lastWs = true
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == ' ' || (c >= '\t' && c <= '\r')) {
        if (!lastWs) sb.append(' ')
        lastWs = true
      } else {
        sb.append(Character.toLowerCase(c))
        lastWs = false
      }
      i += 1
    }
    if (!lastWs) sb.append(' ')
    val padded = sb.toString
    var bestLang = "und"
    var bestHits = 0L
    var l = 0
    while (l < langs.length) {
      var hits = 0L
      val words = stopwords(l)
      var w = 0
      while (w < words.length) {
        val needle = " " + words(w) + " "
        var from = padded.indexOf(needle)
        while (from >= 0) {
          hits += 1
          // overlapping " a b a " cases: step past the word, keep its
          // trailing space as the next leading space
          from = padded.indexOf(needle, from + needle.length - 1)
        }
        w += 1
      }
      if (hits > bestHits) { bestHits = hits; bestLang = langs(l) }
      l += 1
    }
    UTF8String.fromString(bestLang)
  }
}

case class LangId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument")
    }

  override def nullSafeEval(input: Any): Any =
    LangIdKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.LangIdKernel.compute($a)")

  override protected def withNewChildInternal(c: Expression): LangId = copy(child = c)
  override def prettyName: String = "lang_id"
}

object TextProfileFunctions {
  def textStats(text: Column): Column =
    bridge.toColumn(TextStatsExpr(bridge.toExpression(text)))
  def langId(text: Column): Column =
    bridge.toColumn(LangId(bridge.toExpression(text)))
}
