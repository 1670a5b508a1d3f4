package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("r")).collect().head.getAs[T]("r")

  test("tokenCount: empty, blank, multi-space") {
    assert(one[Long](TextAnalysis.tokenCount(lit(""))) === 0L)
    assert(one[Long](TextAnalysis.tokenCount(lit("   "))) === 0L)
    assert(one[Long](TextAnalysis.tokenCount(lit("a b  c\td"))) === 4L)
  }

  test("subwordCount: letter runs + digit runs + punctuation") {
    // "hello" "," "world" "42" "!" → 5
    assert(one[Long](TextAnalysis.subwordCount(lit("hello, world42!"))) === 5L)
    assert(one[Long](TextAnalysis.subwordCount(lit(""))) === 0L)
  }

  test("langId picks the stopword-dominant language") {
    assert(one[String](TextAnalysis.langId(
      lit("the cat and the dog sat in the garden of the house"))) === "en")
    assert(one[String](TextAnalysis.langId(
      lit("der hund und die katze sind nicht in der küche"))) === "de")
    assert(one[String](TextAnalysis.langId(
      lit("le chien et la maison est une belle chose que pas"))) === "fr")
    assert(one[String](TextAnalysis.langId(lit("xyzzy qwerty 12345"))) === "und")
  }

  test("qualityScore stays in [0,1] and ranks text sensibly") {
    val junk = one[Double](TextAnalysis.qualityScore(lit("!!! ??? ### $$$")))
    val prose = one[Double](TextAnalysis.qualityScore(lit(
      "This is a well formed paragraph of reasonable length, containing many " +
      "ordinary words and a sensible amount of punctuation marks overall.")))
    assert(junk >= 0.0 && junk <= 1.0)
    assert(prose >= 0.0 && prose <= 1.0)
    assert(prose > junk)
  }

  test("fingerprints are whitespace/case invariant") {
    val a = one[String](TextAnalysis.fingerprintMd5(lit("Hello   World")))
    val b = one[String](TextAnalysis.fingerprintMd5(lit("hello world")))
    val c = one[String](TextAnalysis.fingerprintMd5(lit("hello worlds")))
    assert(a === b)
    assert(a !== c)
    val f1 = one[Long](TextAnalysis.fingerprint64(lit("Hello   World")))
    val f2 = one[Long](TextAnalysis.fingerprint64(lit("hello world")))
    assert(f1 === f2)
  }

  test("winnow fingerprints: shared-substring guarantee, sketch compression") {
    val k = 5; val w = 4
    def sketch(s: String): Seq[Long] =
      one[scala.collection.Seq[Long]](TextAnalysis.winnowFingerprint(lit(s), k, w)).toSeq
    val shared = "a genuinely shared span of text" // >> w+k-1 chars
    val s1 = sketch(s"left prefix $shared and one tail")
    val s2 = sketch(s"другой префикс $shared totally different end")
    // winnowing guarantee: any shared normalized substring of >= w+k-1
    // chars leaves at least one common fingerprint
    assert(s1.toSet.intersect(s2.toSet).nonEmpty)
    // sorted distinct
    assert(s1 === s1.distinct.sorted)
    // compression: sketch is a strict subset of the full gram set
    val full = one[scala.collection.Seq[Long]](
      graft.functions.TextHashFunctions.shingleHashes(lit(shared * 10), k)).toSeq
    val win = sketch(shared * 10)
    assert(win.size < full.size)
    assert(win.toSet.subsetOf(full.toSet))
    // short text: single fingerprint of the whole string
    assert(sketch("ab").size === 1)
  }

  test("profile computes every column in one pass over real testdata") {
    val docs = Engine.table(spark, sfDir, "documents")
    val prof = TextAnalysis.profile(docs, "text")
    val row = prof.filter(col("doc_id") === 0).collect().head
    assert(row.getAs[Long]("n_chars_total") >= 0)
    assert(prof.columns.toSet.intersect(Set(
      "alpha_ratio", "digit_ratio", "punct_ratio", "space_ratio",
      "n_tokens", "n_subwords", "quality", "lang_pred", "fingerprint")).size === 9)
    // ratios sum to ≤ 1 + punct overlap slack; each in [0,1]
    Seq("alpha_ratio", "digit_ratio", "punct_ratio", "space_ratio").foreach { c =>
      val v = row.getAs[Double](c)
      assert(v >= 0.0 && v <= 1.0, s"$c = $v")
    }
  }
}
