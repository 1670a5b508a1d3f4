package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SQL surface for the engine's native expressions.
  *
  * Two entry points, same registry:
  *  - `spark.sql.extensions=graft.GraftExtensions` — injected at session
  *    build time (the SparkSessionExtensions path for deployments);
  *  - `GraftExtensions.register(spark)` — imperative registration into a
  *    live session (tests, notebooks).
  *
  * After either, every kernel whose arguments are expressible as SQL
  * literals is callable from SQL:
  * `SELECT jaccard_sorted(shingle_hashes(a.text, 5), shingle_hashes(b.text, 5))`,
  * including the BPE pair (`bpe_tokens`/`bpe_token_count`, merge table as
  * an array literal). Model-BOUND kernels (PQ codebooks, trained
  * centroids, dense lookup tables, bigram LM weights) take driver-side
  * model artifacts as constructor arguments and are Scala-API only —
  * a KB-to-MB nested-array literal inside SQL text is not a usable
  * surface for them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.entries.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.JaccardLengthFilter)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** (name, info, builder) for every native function. */
  val entries: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("shingle_set",
      info("shingle_set", "shingle_set(text, n) - distinct character n-grams of normalized text"),
      (es: Seq[Expression]) => ShingleSet(es.head, intArg(es(1), "n"))),
    ("shingle_hashes",
      info("shingle_hashes", "shingle_hashes(text, n) - sorted distinct 64-bit n-gram hashes"),
      (es: Seq[Expression]) => ShingleHashes(es.head, intArg(es(1), "n"))),
    ("winnow_fingerprint",
      info("winnow_fingerprint",
        "winnow_fingerprint(text, k, w) - winnowing (MOSS) rolling-hash document sketch"),
      (es: Seq[Expression]) => WinnowFingerprint(es.head, intArg(es(1), "k"), intArg(es(2), "w"))),
    ("word_grams",
      info("word_grams", "word_grams(text, n) - space-joined word n-grams of lowercased text"),
      (es: Seq[Expression]) => WordGrams(es.head, intArg(es(1), "n"))),
    ("jaccard_sorted",
      info("jaccard_sorted", "jaccard_sorted(a, b) - exact Jaccard of two sorted bigint arrays"),
      (es: Seq[Expression]) => JaccardSorted(es.head, es(1))),
    ("intersect_size_sorted",
      info("intersect_size_sorted",
        "intersect_size_sorted(a, b) - exact intersection size of two sorted bigint arrays"),
      (es: Seq[Expression]) => IntersectSizeSorted(es.head, es(1))),
    ("simhash64",
      info("simhash64", "simhash64(shingles) - 64-bit SimHash of an array<string>"),
      (es: Seq[Expression]) => SimHash64(es.head)),
    ("simhash64_from_hashes",
      info("simhash64_from_hashes", "simhash64_from_hashes(hashes) - SimHash from pre-hashed shingles"),
      (es: Seq[Expression]) => SimHash64FromHashes(es.head)),
    ("minhash_signature",
      info("minhash_signature", "minhash_signature(shingles, k) - k-element MinHash signature"),
      (es: Seq[Expression]) => MinHashSignature(es.head, intArg(es(1), "k"))),
    ("minhash_from_hashes",
      info("minhash_from_hashes", "minhash_from_hashes(hashes, k) - MinHash from pre-hashed shingles"),
      (es: Seq[Expression]) => MinHashFromHashes(es.head, intArg(es(1), "k"))),
    ("cosine_similarity",
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two array<float> vectors"),
      (es: Seq[Expression]) => CosineSimilarity(es.head, es(1))),
    ("dot_product",
      info("dot_product", "dot_product(a, b) - dot product of two array<float> vectors"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))),
    ("hyperplane_sig",
      info("hyperplane_sig", "hyperplane_sig(v, planes) - random-hyperplane LSH sign bits"),
      (es: Seq[Expression]) => HyperplaneSignature(es.head, intArg(es(1), "planes"))),
    ("top_centroids",
      info("top_centroids", "top_centroids(v, n, k) - ids of the k nearest pseudo-centroids"),
      (es: Seq[Expression]) => TopCentroids(es.head, intArg(es(1), "n"), intArg(es(2), "k"))),
    ("fm_count_distinct",
      info("fm_count_distinct", "fm_count_distinct(v) - Flajolet-Martin/PCSA distinct estimate"),
      (es: Seq[Expression]) => FlajoletMartin(es.head).toAggregateExpression()),
    ("bpe_tokens",
      info("bpe_tokens",
        "bpe_tokens(word, merges) - BPE token array; merges is a flat array<string> pair list"),
      (es: Seq[Expression]) => BpeTokens(es.head, strArrayArg(es(1), "merges"))),
    ("bpe_token_count",
      info("bpe_token_count",
        "bpe_token_count(text, merges) - BPE token count of normalized text"),
      (es: Seq[Expression]) => BpeTokenCount(es.head, strArrayArg(es(1), "merges"))))

  /** A string-array literal argument: `array('a','b',…)` arrives as
    * CreateArray of literals at function-resolution time (before constant
    * folding) or as a folded Literal when the builder re-runs later.
    */
  private def strArrayArg(e: Expression, what: String): Seq[String] = e match {
    case ca: org.apache.spark.sql.catalyst.expressions.CreateArray =>
      ca.children.map {
        case org.apache.spark.sql.catalyst.expressions.Literal(
            s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
        case other =>
          throw new IllegalArgumentException(s"$what must be string literals, got $other")
      }
    case org.apache.spark.sql.catalyst.expressions.Literal(
        v: org.apache.spark.sql.catalyst.util.ArrayData,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, _)) =>
      v.toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    case other =>
      throw new IllegalArgumentException(
        s"$what must be an array literal of strings, got $other")
  }

  /** Imperative registration into a live session: functions into the
    * registry, the optimizer rule via `experimental.extraOptimizations`
    * (a live session's rule batches can't be extended any other way).
    * Idempotent — safe to call on every `getOrCreate`.
    */
  def register(spark: SparkSession): Unit = {
    entries.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.JaccardLengthFilter))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.JaccardLengthFilter
  }
}
