package graft

import graft.functions.BpeKernels
import graft.ops.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("mergeOnce is greedy leftmost non-overlapping, including x = y runs") {
    def m(toks: Seq[String], x: String, y: String): Seq[String] =
      BpeKernels.mergeOnce(toks.toArray, x, y).toSeq
    assert(m(Seq("a", "b", "c"), "a", "b") === Seq("ab", "c"))
    assert(m(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(m(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(m(Seq("b", "a", "a", "a", "b"), "a", "a") === Seq("b", "aa", "a", "b"))
    assert(m(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
    assert(m(Seq("x"), "a", "b") === Seq("x"))
    assert(m(Seq(), "a", "b") === Seq())
  }

  test("tokensOf applies merges in rank order") {
    // merges: (l,l) then (ll,o) — "hello" -> h e ll o -> h e llo
    val merges = Array("l", "l", "ll", "o")
    assert(BpeKernels.tokensOf("hello", merges).toSeq ===
      Seq("h", "e", "llo"))
    assert(BpeKernels.tokensOf("hello", Array.empty[String]).toSeq ===
      Seq("h", "e", "l", "l", "o"))
  }

  test("tokenCount sums per-word counts over a normalized text") {
    val merges = Array("l", "l")
    // "hello hall" -> [h,e,ll,o] + [h,a,ll] = 7; empties from extra
    // spaces contribute nothing
    assert(BpeKernels.tokenCount(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello  hall "),
      merges) === 7L)
    assert(BpeKernels.tokenCount(
      org.apache.spark.unsafe.types.UTF8String.fromString(""), merges) === 0L)
  }

  test("trainMerges learns the most frequent pair first with deterministic ties") {
    // corpus: "ababab" x3 + "cd" x1 — pair (a,b) dominates (freq-weighted
    // count 9 vs (b,a) 6), so rank 1 = (a,b); after merging, (ab,ab)
    // dominates
    val docs = Seq((1L, "ababab ababab ababab cd")).toDF("doc_id", "text")
    val merges = Bpe.trainMergesUncached(docs, "text", rounds = 2)
    assert(merges.head._1 === "a")
    assert(merges.head._2 === "b")
    assert(merges.head._3 === 9L)
    assert(merges(1)._1 === "ab")
    assert(merges(1)._2 === "ab")
  }

  test("trainMerges stops early when no pairs remain") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val merges = Bpe.trainMergesUncached(docs, "text", rounds = 5)
    assert(merges.isEmpty) // every word is a single char: no pairs
  }

  test("tokens column kernel matches the driver-side tokensOf") {
    val merges = Array("a", "b")
    val got = Seq(("abab"), ("xyz"))
      .toDF("w")
      .select(BpeKernels.tokens(org.apache.spark.sql.functions.col("w"), merges))
      .as[Seq[String]].collect()
    assert(got(0) === Seq("ab", "ab"))
    assert(got(1) === Seq("x", "y", "z"))
  }

  test("trained merges segment the training corpus consistently") {
    // applying the trained table via the kernel must agree with
    // re-deriving tokens word by word through tokensOf
    val docs = Seq(
      (1L, "the quick brown fox the quick"),
      (2L, "the lazy dog sleeps the day away")).toDF("doc_id", "text")
    val merges = Bpe.trainMergesUncached(docs, "text", rounds = 4)
    val flat = Bpe.flatten(merges)
    val viaKernel = docs.select(org.apache.spark.sql.functions.col("doc_id"),
        BpeKernels.tokenCountCol(
          graft.functions.BigramLm.normalize(
            org.apache.spark.sql.functions.col("text")), flat).as("n"))
      .as[(Long, Long)].collect().toMap
    val viaDriver = docs.as[(Long, String)].collect().map { case (id, text) =>
      val norm = text.toLowerCase
      id -> norm.split(" ").filter(_.nonEmpty)
        .map(w => BpeKernels.tokensOf(w, flat).length.toLong).sum
    }.toMap
    assert(viaKernel === viaDriver)
  }

  test("trainMergesToVocab stops at the first round reaching the target vocab") {
    // mixed-word corpus: merged symbols' constituents persist in other
    // words, so each early merge grows the vocab by one net symbol
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the rat ate a hat the cat"),
      (3L, "a bat and a mat sat")).toDF("doc_id", "text")
    def vocabAfter(merges: Bpe.Merges): Long =
      Bpe.wordFreq(docs, "text")
        .select(org.apache.spark.sql.functions.explode(
          BpeKernels.tokens(org.apache.spark.sql.functions.col("w"),
            Bpe.flatten(merges))).as("t"))
        .agg(org.apache.spark.sql.functions.countDistinct(
          org.apache.spark.sql.functions.col("t"))).head().getLong(0)
    val v0 = vocabAfter(Vector.empty)
    val target = v0 + 2
    val merges = Bpe.trainMergesToVocab(docs, "text", target, maxRounds = 10)
    // targeted training is a PREFIX of fixed-round training
    assert(merges === Bpe.trainMergesUncached(docs, "text", rounds = merges.length))
    assert(merges.nonEmpty && merges.length < 10,
      s"expected a mid-run stop, got ${merges.length}")
    // stop condition: the stop round reaches the target, the round
    // before it did not
    assert(vocabAfter(merges) >= target)
    assert(vocabAfter(merges.dropRight(1)) < target)
    // a target already met by the base alphabet learns nothing
    assert(Bpe.trainMergesToVocab(docs, "text", v0, maxRounds = 10).isEmpty)
  }
}
