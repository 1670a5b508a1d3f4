package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All pure column expressions (codegen'd, no UDFs) — they run inside
  * whole-stage codegen next to the parquet scan, so a 100 TB corpus pays
  * one pass with no extra shuffle.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword count: word-ish runs + digits + punctuation, the
    * common pre-tokenizer regex family. Counts matches of
    * `\p{L}+|\p{N}+|[^\p{L}\p{N}\s]` — an upper-bound proxy for BPE
    * token counts that needs no vocabulary.
    */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]")).cast("long")

  /** Character-class composition ratios, the backbone of quality scoring. */
  def charRatios(df: DataFrame, text: Column): DataFrame = {
    val len = length(text).cast("double")
    df.withColumn("n_chars_total", length(text).cast("long"))
      .withColumn("alpha_ratio",
        when(len === 0, 0.0).otherwise(length(regexp_replace(text, "[^\\p{L}]", "")) / len))
      .withColumn("digit_ratio",
        when(len === 0, 0.0).otherwise(length(regexp_replace(text, "[^0-9]", "")) / len))
      .withColumn("punct_ratio",
        when(len === 0, 0.0)
          .otherwise(length(regexp_replace(text, "[^\\p{Punct}]", "")) / len))
      .withColumn("space_ratio",
        when(len === 0, 0.0).otherwise(length(regexp_replace(text, "[^\\s]", "")) / len))
  }

  /** Heuristic quality score ∈ [0,1]: rewards alphabetic text of
    * reasonable length with moderate punctuation — the standard cheap
    * pre-filter before expensive model-based scoring.
    */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val alpha = when(len === 0, 0.0).otherwise(length(regexp_replace(text, "[^\\p{L}]", "")) / len)
    val punct = when(len === 0, 0.0).otherwise(length(regexp_replace(text, "[^\\p{Punct}]", "")) / len)
    val words = tokenCount(text).cast("double")
    val lenScore = least(len / 200.0, lit(1.0))
    val wordScore = least(words / 30.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punct * 4.0)
    round(greatest(lit(0.0), least(lit(1.0),
      alpha * 0.4 + lenScore * 0.2 + wordScore * 0.2 + punctPenalty * 0.2)), 6)
  }

  /** Stopword lists for the n-gram/stopword language-ID heuristic. */
  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " to ", " is ", " in ", " that ", " it "),
    "de" -> Seq(" der ", " die ", " das ", " und ", " ist ", " nicht ", " ein ", " zu "),
    "fr" -> Seq(" le ", " la ", " les ", " et ", " est ", " une ", " que ", " pas "),
    "es" -> Seq(" el ", " la ", " los ", " y ", " es ", " una ", " que ", " no "),
    "it" -> Seq(" il ", " la ", " che ", " e ", " di ", " un ", " per ", " non "))

  /** Language-ID: count stopword hits per language over the lowercased,
    * space-padded text; argmax wins, `und` (undetermined) when no hits.
    * Pure expressions — one codegen'd pass, no shuffle.
    */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    def hits(words: Seq[String]): Column =
      words.map(w => when(padded.contains(w),
        // count occurrences: (len - len(removed)) / len(word)
        ((length(padded) - length(regexp_replace(padded, w.trim, ""))) / w.trim.length)
          .cast("long")).otherwise(0L)).reduce(_ + _)
    val scored = stopwords.toSeq.map { case (lang, ws) => struct(hits(ws).as("score"), lit(lang).as("lang")) }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Deterministic document fingerprint: 64-bit xxhash of the
    * whitespace/case-normalized text. Collision-checkable at corpus scale
    * (2^64 space) and stable across partitionings.
    */
  def fingerprint64(text: Column): Column =
    xxhash64(lower(regexp_replace(text, "\\s+", " ")))

  /** MD5 fingerprint of normalized text — same normalization, hex string.
    * (Portable across engines, so it is the oracle-checkable variant.)
    */
  def fingerprintMd5(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Full per-document profile in one pass. */
  def profile(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    charRatios(docs, t)
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_subwords", subwordCount(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprintMd5(t))
  }
}
