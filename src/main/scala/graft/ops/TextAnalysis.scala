package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All pure column expressions (codegen'd, no UDFs) — they run inside
  * whole-stage codegen next to the parquet scan, so a 100 TB corpus pays
  * one pass with no extra shuffle.
  */
object TextAnalysis {

  import graft.functions.TextProfileFunctions

  /** Whitespace token count (non-space runs; one-pass native kernel). */
  def tokenCount(text: Column): Column =
    TextProfileFunctions.textStats(text).getField("n_tokens")

  /** BPE-ish subword count: letter runs + digit runs + individual other
    * non-space chars — the common pre-tokenizer classes
    * (`\p{L}+|\p{N}+|[^\p{L}\p{N}\s]`), an upper-bound proxy for BPE
    * token counts that needs no vocabulary. Native one-pass kernel.
    */
  def subwordCount(text: Column): Column =
    TextProfileFunctions.textStats(text).getField("n_subwords")

  /** Character-class composition ratios, the backbone of quality scoring.
    * All derived from ONE [[graft.functions.TextStatsExpr]] pass —
    * common-subexpression elimination collapses the struct references
    * inside whole-stage codegen.
    */
  def charRatios(df: DataFrame, text: Column): DataFrame = {
    val st = TextProfileFunctions.textStats(text)
    val len = st.getField("n_chars").cast("double")
    def ratio(field: String): Column =
      when(len === 0, 0.0).otherwise(st.getField(field) / len)
    df.withColumn("n_chars_total", st.getField("n_chars"))
      .withColumn("alpha_ratio", ratio("n_alpha"))
      .withColumn("digit_ratio", ratio("n_digit"))
      .withColumn("punct_ratio", ratio("n_punct"))
      .withColumn("space_ratio", ratio("n_space"))
  }

  /** Heuristic quality score ∈ [0,1]: rewards alphabetic text of
    * reasonable length with moderate punctuation — the standard cheap
    * pre-filter before expensive model-based scoring. One kernel pass.
    * Pure IEEE-754 arithmetic with a fixed evaluation order, so any
    * engine mirroring the formula reproduces it bit-exactly (no round()
    * step — rounding semantics differ across engines).
    */
  def qualityScore(text: Column): Column = {
    val st = TextProfileFunctions.textStats(text)
    val len = st.getField("n_chars").cast("double")
    val alpha = when(len === 0, 0.0).otherwise(st.getField("n_alpha") / len)
    val punct = when(len === 0, 0.0).otherwise(st.getField("n_punct") / len)
    val words = st.getField("n_tokens").cast("double")
    val lenScore = least(len / 200.0, lit(1.0))
    val wordScore = least(words / 30.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punct * 4.0)
    greatest(lit(0.0), least(lit(1.0),
      alpha * 0.4 + lenScore * 0.2 + wordScore * 0.2 + punctPenalty * 0.2))
  }

  /** Language-ID: stopword-count argmax over {en,de,fr,es,it}, `und`
    * when nothing hits. Native kernel ([[graft.functions.LangId]]) —
    * one normalize pass + substring scans, no per-word regex.
    */
  def langId(text: Column): Column = TextProfileFunctions.langId(text)

  /** Char-bigram LM quality score (the CCNet/KenLM stand-in — see
    * [[graft.functions.BigramLm]]): trains floor(log2(1+count)) bigram
    * weights on the corpus itself (one map-side-combined aggregation
    * over ≤ 784 keys, model = a 6 KB driver artifact — the sanctioned
    * bounded collect), then scores each document as the integer average
    * weight of its consecutive bigrams via the codegen'd kernel — one
    * pass per row, no shuffle, no join. Familiar prose scores high;
    * rare-character garbage scores near 0. All-integer, so the DuckDB
    * oracle (which replays training AND scoring as the naive
    * explode+join plan) reproduces it bit-for-bit.
    *
    * Output: (doc_id, lm_score). Documents whose normalized text has
    * fewer than 2 chars score 0.
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
      scale: Int = 1): DataFrame = {
    import graft.functions.BigramLm
    val normed = docs.select(col(idCol).as("doc_id"),
      BigramLm.normalize(col(textCol)).as("t"))
    // training: ONE scan through the 784-bin histogram aggregate — the
    // shuffle carries one 6 KB array per map task, never exploded grams
    val counts = normed
      .agg(BigramLm.bigramCounts(col("t")).as("c"))
      .head().getSeq[Long](0)
    val model = counts.map(c =>
      63L - java.lang.Long.numberOfLeadingZeros(1L + c)).toArray
    // scale > 1 scores in fixed-point (e.g. 1000 = milli-units): the
    // plain integer average is so coarse on a homogeneous corpus that
    // every document can land on one value — useless for quantile
    // splits. Still exact integer arithmetic, oracle-replayable
    normed
      .withColumn("sw", BigramLm.scoreSum(model)(col("t")))
      .withColumn("nb", (length(col("t")) - 1).cast("long"))
      .select(col("doc_id"),
        when(col("nb") >= 1, expr(s"(sw * ${scale}L) div nb"))
          .otherwise(0L).as("lm_score"))
  }

  /** \p{N} code-point count (decimal/letter/other numbers) — one-pass
    * kernel field, regex-portable (Java and RE2 agree on \p{N}).
    */
  def digitCount(text: Column): Column =
    TextProfileFunctions.textStats(text).getField("n_digit")

  /** Whitespace-run normalization with the EXPLICIT class
    * `[\t\n\x0B\f\r ]+` rather than `\s+`: Java regex \s and RE2 \s
    * disagree outside this set, and fingerprints must be engine-portable.
    */
  private val wsRun = "[\\t\\n\\x0B\\f\\r ]+"

  /** Deterministic document fingerprint: 64-bit xxhash of the
    * whitespace/case-normalized text. Collision-checkable at corpus scale
    * (2^64 space) and stable across partitionings.
    */
  def fingerprint64(text: Column): Column =
    xxhash64(lower(regexp_replace(text, wsRun, " ")))

  /** MD5 fingerprint of normalized text — same normalization, hex string.
    * (Portable across engines, so it is the oracle-checkable variant.)
    */
  def fingerprintMd5(text: Column): Column =
    md5(lower(regexp_replace(text, wsRun, " ")))

  /** Winnowing (rolling-hash) fingerprint sketch of the normalized text
    * — [[graft.functions.WinnowFingerprint]]: XXH64 over each character
    * k-gram, sliding-window-w minima kept. Two documents sharing any
    * normalized substring of ≥ w+k-1 chars share a fingerprint; the
    * sketch is ~2/(w+1) of the gram count, so all-pairs overlap joins
    * run on a fraction of [[graft.ops.Dedup.shingleHashes]]'s bytes.
    */
  def winnowFingerprint(text: Column, k: Int = 5, w: Int = 4): Column =
    graft.functions.TextHashFunctions.winnowFingerprint(text, k, w)

  /** Corpus vocabulary: top-k terms by document frequency (then total
    * occurrences, then term — a total order, so the cut is
    * deterministic). Tokenization is the portable whitespace split used
    * by the fingerprints; lowercasing first makes "The"/"the" one term.
    *
    * Scale shape: explode → two-level aggregate. The per-(term, doc)
    * distinct collapse happens map-side before any shuffle, the term
    * aggregate shuffles one slim row per distinct (term, doc), and the
    * global top-k is a TakeOrdered — no full sort of the vocabulary.
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), wsRun)).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("n_in_doc"))
      .groupBy(col("term"))
      .agg(sum(col("n_in_doc")).as("n_occurrences"),
        count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("n_occurrences").desc, col("term").asc)
      .limit(k)

  /** Per-document top-k terms by tf·idf with idf = N/df (no logarithm:
    * log is monotone in N/df, so the RANKING is identical, and the
    * output stays integer-only — (doc_id, term, tf, df, rank) — for the
    * hash-exact oracle; the score itself never leaves the plan). The
    * tf·N/df sort key is a correctly-rounded IEEE division of exact
    * integers, so any two engines order identically; ties break on the
    * term. Three shuffles at scale: tf (doc,term), the vocabulary-sized
    * df aggregate joined back on term, and the per-doc ranking window —
    * each key-partitioned, nothing corpus-sized broadcasts.
    */
  def tfidfTopTerms(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = docs
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), wsRun)).as("term"))
      .filter(col("term") =!= "")
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // document frequency as a COUNT window over the tf frame, not a
    // separate groupBy+join: a self-join's two aggregate branches don't
    // canonicalize to the same subtree (tf keeps count(1), df prunes
    // it), so AQE cannot stage-cache them and the corpus would be
    // scanned + exploded TWICE (observed in the final sf0.1 plan), with
    // the corpus-sized tf side broadcast to boot. The window form has
    // ONE lineage: scan → tf aggregate → term-partitioned window →
    // doc-partitioned ranking window — three key-partitioned exchanges,
    // one corpus scan, nothing corpus-sized broadcast.
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("term"))))
    val nDocs = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    withDf.join(broadcast(nDocs))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy((col("tf") * col("n_docs") / col("df")).desc,
            col("term").asc)))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rank"))
  }

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

  // -------------------------------------------------- pipeline cleaning

  /** RE2-safe patterns (no backrefs/lookaround), so the SAME regex runs
    * in Spark (java.util.regex) and the DuckDB oracle (RE2) with
    * identical matches.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** PII scrubbing: redact emails/phones with typed placeholders — the
    * standard pre-training cleanup pass. Pure scan-side regexp_replace
    * (codegen'd, no shuffle); count the redactions alongside so the
    * pipeline can monitor PII rates per source.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  def piiCounts(text: Column): (Column, Column) =
    (regexp_count(text, lit(emailPattern)).cast("long"),
      regexp_count(text, lit(phonePattern)).cast("long"))

  /** Boilerplate detection: word n-grams recurring across ≥ `minDocs`
    * DISTINCT documents — the repeated-n-gram heuristic of
    * MassiveText/Gopher-style cleaning (C4 uses lines; this corpus has
    * no line structure, token windows generalize). Two-level aggregate:
    * per-(gram, doc) collapse map-side, then per-gram — the shuffle
    * carries one slim row per distinct (gram, doc). Deterministic top-k
    * under the (n_docs, n_total, gram) total order.
    */
  def repeatedPhrases(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2, k: Int = 20): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        // native one-pass kernel; the declarative form
        // (filter(split(lower)) → transform(sequence, array_join(slice)))
        // runs interpreted per gram — see WordGrams scaladoc
        explode(graft.functions.TextHashFunctions.wordGrams(col(textCol), n)).as("gram"))
      .groupBy(col("gram"), col("doc_id"))
      .agg(count(lit(1)).as("n_in_doc"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_in_doc")).as("n_total"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("n_total").desc, col("gram").asc)
      .limit(k)

  /** (doc_id, seg_no, seg): consecutive `w`-word segments of each
    * document, ragged tail kept. Segment count is computed explicitly
    * and empty texts guarded — Spark's `sequence(a, b)` DESCENDS when
    * b < a, so `transform(sequence(0, nseg-1), …)` must never see
    * nseg = 0.
    */
  private def wordSegments(docs: DataFrame, idCol: String,
      textCol: String, w: Int): DataFrame = {
    require(w >= 1, "segment width must be >= 1")
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
      .withColumn("nseg",
        ((size(col("ws")) + lit(w - 1)) / lit(w)).cast("int"))
      .select(col("doc_id"), posexplode(
        when(col("nseg") <= 0, typedlit(Seq.empty[String]))
          .otherwise(transform(sequence(lit(0), col("nseg") - 1),
            g => array_join(slice(col("ws"), g * lit(w) + 1, lit(w)), " ")))))
      .toDF("doc_id", "seg_no", "seg")
  }

  /** Cross-document segment-level deduplication — the CCNet/RefinedWeb
    * "drop duplicated lines" stage, generalized to fixed `w`-word
    * segments because this corpus has no line structure. Every document
    * is split into consecutive segments, segment document-frequency is
    * counted corpus-wide, segments appearing in >= `maxDocs` distinct
    * documents are dropped everywhere, and each document is reassembled
    * from its kept segments in original order. Output per document:
    * (doc_id, n_segs, n_kept, clean) with clean = '' when everything
    * was boilerplate.
    *
    * This EXACT form keeps raw segment text in the frequency shuffle so
    * an independent engine can replay it string-for-string; the
    * corpus-scale form is [[segmentDedupHashed]], which shuffles 8-byte
    * segment hashes and broadcasts the dropped set (bounded by the Zipf
    * head — segments frequent enough to drop are few by construction).
    * Reassembly is a per-doc groupBy (the corpus's own key); order is
    * restored by sorting the collected (seg_no, seg) structs, never by
    * a global sort.
    */
  def segmentDedup(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 5, maxDocs: Int = 3): DataFrame = {
    val segs = wordSegments(docs, idCol, textCol, w)
    val freq = segs.groupBy(col("seg"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    segs.join(freq, Seq("seg"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("nd") < maxDocs, 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(when(col("nd") < maxDocs,
              struct(col("seg_no"), col("seg"))))),
            x => x.getField("seg"))).as("clean"))
  }

  /** Production form of [[segmentDedup]]: identical semantics absent a
    * 64-bit xxhash collision, but the document-frequency shuffle
    * carries (hash, doc_id) — 16 bytes/row instead of the segment
    * text — and the dropped-segment set (`nd >= maxDocs`, the Zipf
    * head) is broadcast back, so reassembly never shuffles text at
    * all: one corpus scan re-derives segments and left-joins the tiny
    * dropped set. At 100 TB this is the difference between shuffling
    * the corpus twice and shuffling 16-byte rows once.
    */
  def segmentDedupHashed(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 5, maxDocs: Int = 3): DataFrame = {
    val segs = wordSegments(docs, idCol, textCol, w)
      .withColumn("h", xxhash64(col("seg")))
    val dropped = segs.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= maxDocs)
      .select(col("h"), lit(true).as("is_dup"))
    segs.join(broadcast(dropped), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("is_dup").isNull, 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(when(col("is_dup").isNull,
              struct(col("seg_no"), col("seg"))))),
            x => x.getField("seg"))).as("clean"))
  }

  /** Fixed-size character chunking with overlap — the context-window
    * packing step. One `sequence` + `explode` per doc (starts 1,
    * 1+stride, … ≤ length), substring per chunk; no shuffle, output
    * rows carry (doc, start, chunk) so downstream tokenization stays
    * embarrassingly parallel. `size` > `overlap` required.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      size: Int = 400, overlap: Int = 100): DataFrame = {
    require(size > overlap, "chunk size must exceed overlap")
    val stride = size - overlap
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("t"))
      .select(col("doc_id"), col("t"),
        // empty text yields ZERO chunks: sequence(1, 0, +stride) throws
        // 'Illegal sequence boundaries' at runtime (the hazard
        // wordSegments guards the same way); explode of the empty
        // array drops the row, and null text already explodes to nothing
        explode(when(length(col("t")) > 0,
            sequence(lit(1), length(col("t")), lit(stride)))
          .otherwise(array().cast("array<int>"))).as("start"))
      .select(col("doc_id"), col("start").cast("long").as("start"),
        length(substring_index_safe(col("t"), col("start"), size)).cast("long").as("chunk_len"),
        md5(substring_index_safe(col("t"), col("start"), size)).as("chunk_hash"))
  }

  /** `substring` with a column start (the builtin takes literal ints). */
  private def substring_index_safe(t: Column, start: Column, len: Int): Column =
    t.substr(start, lit(len))

  /** Benchmark decontamination: flag every training document sharing at
    * least one word n-gram with the evaluation/benchmark set (the
    * GPT-3/PaLM-style overlap filter run before training). Returns one
    * row per contaminated doc: (doc_id, n_contaminated) where
    * n_contaminated counts its DISTINCT benchmark-overlapping grams.
    *
    * Scale shape: the benchmark side is eval data — thousands of
    * documents against a 100 TB corpus — so its distinct-gram set
    * broadcasts (`hashGrams=true` shrinks it to 8-byte xxhash64 values;
    * 1M grams ≈ 8 MB) and the corpus side is one scan + explode with
    * map-side (gram, doc) dedup before the per-doc count. Nothing
    * all-pairs, and the corpus never shuffles full gram strings.
    * `hashGrams=false` joins on the exact gram text — the form the
    * DuckDB gate replays verbatim, and the collision-free reference for
    * the hashed production form.
    */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8, hashGrams: Boolean = false): DataFrame = {
    def grams(df: DataFrame, cols: Column*): DataFrame = {
      // per-doc dedup INSIDE the row (array_distinct before explode):
      // the corpus side then needs no dedup shuffle at all — its only
      // exchange is the final one-row-per-contaminated-doc count
      val g = explode(array_distinct(
        graft.functions.TextHashFunctions.wordGrams(col(textCol), n))).as("g")
      val key = if (hashGrams) xxhash64(col("g")) else col("g")
      // resolve caller columns ONCE: re-applying `cols` in a second
      // select would re-resolve e.g. col(idCol) against a frame where
      // that column was already renamed (AnalysisException for any
      // idCol != "doc_id")
      val exploded = df.select(cols :+ g: _*)
      exploded.select(
        exploded.columns.filter(_ != "g").map(col).toSeq :+ key.as("gram"): _*)
    }
    val benchGrams = grams(bench).distinct()
    grams(train, col(idCol).as("doc_id"))
      .join(broadcast(benchGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated"))
  }

  /** Within-document repetition signals — the Gopher/MassiveText
    * "repetitious text" quality filters (duplicate-n-gram fraction and
    * most-frequent-n-gram share; Rae et al. 2021 §A.1.1), adapted to
    * word windows because this corpus has no line structure. Per doc:
    *
    *   n_words, n_distinct_words    — unigram repetition
    *   n_grams, n_distinct_grams    — duplicate word-`n`-gram counts
    *   top_gram_count               — occurrences of the most frequent gram
    *
    * Integer counts only (the dup *fractions* are one division away,
    * and ratios would be FP-order-unstable across engines). Everything
    * is computed INSIDE the row: gram arrays from the one-pass
    * [[graft.functions.WordGrams]] kernel, distinct counts via
    * `array_distinct`, and `top_gram_count` as a longest-equal-run scan
    * over the *sorted* gram array (sort + one `aggregate` fold). No
    * explode, no shuffle — a 100 TB corpus pays exactly one map pass,
    * where the naive unnest → groupBy(doc, gram) plan shuffles every
    * gram in the corpus (that form survives only as the DuckDB oracle
    * and the differential spec).
    */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    import graft.functions.TextHashFunctions.wordGrams
    val words = wordGrams(col(textCol), 1)
    val grams = wordGrams(col(textCol), n)
    // longest run of equal values in the sorted array == max multiplicity
    val topCount = aggregate(
      array_sort(grams),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    docs.select(
      col(idCol).as("doc_id"),
      size(words).cast("long").as("n_words"),
      size(array_distinct(words)).cast("long").as("n_distinct_words"),
      size(grams).cast("long").as("n_grams"),
      size(array_distinct(grams)).cast("long").as("n_distinct_grams"),
      topCount.as("top_gram_count"))
  }
}
