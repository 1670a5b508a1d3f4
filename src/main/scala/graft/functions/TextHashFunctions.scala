package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native signature kernels for the dedup operators.
  *
  * The declarative forms (64 `aggregate`-over-array columns) run as
  * INTERPRETED higher-order functions in Spark — every one of the 64 bit
  * expressions re-walks the shingle array, so a document pays
  * O(64 · |shingles|) interpreted expression evals (observed: minutes per
  * partition at sf0.1). These expressions do the same math as one tight
  * loop per row: hash each shingle ONCE with XXH64, then fold all 64
  * bit-votes / all k min-trackers from that single hash. Semantics
  * (which pairs collide) are equivalent; the constants differ from the
  * declarative form, which is fine — LSH guarantees are distributional,
  * and exact Jaccard/hamming verification runs on the candidates anyway.
  */
object TextHash {
  /** One 64-bit hash per shingle — the shared first step. */
  @inline def shingleHash(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
}

/** simhash64(shingles): bit j is the sign of Σ_s (bit j of xxh64(s) ? +1 : -1).
  * Mirrors the classic Charikar construction the reference-free dedup
  * pipeline needs; one pass, one hash per shingle.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimHash64.compute($a)")

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Static kernel so generated code and interpreted eval share it. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = TextHash.shingleHash(arr.getUTF8String(i), 0L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** minhash_signature(shingles): k-element signature, element k =
  * min over shingles of a universal-hash mix of the shingle's xxh64.
  * One xxh64 per shingle; k cheap integer mixes per shingle.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashSignature.compute(input.asInstanceOf[ArrayData], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinHashSignature.compute($a, $numHashes))")

  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {
  // odd multipliers/addends derived from splitmix64 of the hash index —
  // a standard universal-hash family over one base hash per shingle
  private def mixConstants(k: Int): (Long, Long) = {
    var z = (k + 1).toLong * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z | 1L, z ^ (z >>> 31))
  }

  def compute(arr: ArrayData, numHashes: Int): Array[Long] = {
    // skip null shingles (SimHash64.compute does the same): mapping them
    // to a constant hash would inject IDENTICAL signature components
    // into unrelated documents — a systematic false-candidate source
    val n0 = arr.numElements()
    val hashes = new Array[Long](n0)
    var m = 0
    var i = 0
    while (i < n0) {
      if (!arr.isNullAt(i)) {
        hashes(m) = TextHash.shingleHash(arr.getUTF8String(i), 42L)
        m += 1
      }
      i += 1
    }
    computeFromHashes(hashes(_), m, numHashes)
  }

  /** Shared min-tracking fold over any indexed hash source. */
  def computeFromHashes(hashAt: Int => Long, n: Int, numHashes: Int): Array[Long] = {
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) {
      val (a, b) = mixConstants(k); as(k) = a; bs(k) = b; k += 1
    }
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = hashAt(i)
      var j = 0
      while (j < numHashes) {
        val v = as(j) * x + bs(j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }
}

/** shingle_set(text, n): distinct character n-grams of the
  * whitespace-collapsed, lowercased text, in first-occurrence order;
  * texts shorter than n yield the whole normalized text as the single
  * shingle. The declarative `transform(sequence(...), substr)` form
  * re-evaluates the normalization regex per element when interpreted
  * (higher-order functions are CodegenFallback) — O(len²) per document;
  * this kernel is one O(len·n) pass.
  */
case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle length must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleSet.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ShingleSet.compute($a, $n)")

  override protected def withNewChildInternal(c: Expression): ShingleSet = copy(child = c)
  override def prettyName: String = "shingle_set"
}

object ShingleSet {
  /** The regex-portable whitespace set [\t\n\x0B\f\r ] — NOT
    * Character.isWhitespace, which disagrees with RE2 \s on
    * U+001C-001F/U+2028 and would break oracle parity on Unicode text.
    */
  @inline private[functions] def isWsClass(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')

  /** Shared normalization: collapse [\t\n\x0B\f\r ] runs to ' ', lowercase. */
  private[functions] def normalize(s: String): java.lang.StringBuilder = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var lastWs = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWsClass(c)) {
        if (!lastWs) sb.append(' ')
        lastWs = true
      } else {
        sb.append(Character.toLowerCase(c))
        lastWs = false
      }
      i += 1
    }
    sb
  }

  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val norm = normalize(text.toString).toString
    if (norm.length < n)
      return new GenericArrayData(Array[Any](UTF8String.fromString(norm)))
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    while (j + n <= norm.length) {
      seen.add(norm.substring(j, j + n))
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** shingle_hashes(text, n): SORTED distinct 64-bit hashes of the
  * character n-grams of the normalized text. The all-numeric form of
  * [[ShingleSet]]: downstream LSH (minhash mixes, simhash votes) and
  * exact-Jaccard verification only need set identity, so hashing each
  * shingle once here removes string materialization, string shuffle
  * payloads (8 B/shingle vs whole n-grams), and string-equality set ops
  * from the entire dedup pipeline. Sorted so Jaccard verification is a
  * linear merge ([[JaccardSorted]]).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle length must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ShingleHashes.compute($a, $n)")

  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  /** Each n-gram window is hashed with XXH64 over its UTF-16LE bytes —
    * an injective window encoding, so distinct shingles collide only at
    * the hash's own ~2^-64 rate (a rolling polynomial is NOT injective:
    * swapping adjacent chars (c, d) → (c+1, d-31) preserves a base-31
    * value). One flat byte buffer for the whole text; no per-window
    * allocation.
    */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    // same normalization as ShingleSet (portable ws class, lowercase)
    val sb = ShingleSet.normalize(text.toString)
    val len = sb.length
    // UTF-16LE byte image of the normalized text
    val bytes = new Array[Byte](len * 2)
    var b = 0
    while (b < len) {
      val c = sb.charAt(b)
      bytes(b * 2) = (c & 0xFF).toByte
      bytes(b * 2 + 1) = ((c >> 8) & 0xFF).toByte
      b += 1
    }
    val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    val seen = new java.util.HashSet[java.lang.Long]()
    if (len < n) {
      seen.add(XXH64.hashUnsafeBytes(bytes, off, len * 2, 42L))
    } else {
      var j = 0
      while (j + n <= len) {
        seen.add(XXH64.hashUnsafeBytes(bytes, off + j * 2L, n * 2, 42L))
        j += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}

/** winnow_fingerprint(text, k, w): the winnowing document sketch
  * (Schleimer/Wilkerson/Aiken, the MOSS fingerprinting scheme): hash
  * every character k-gram of the normalized text (rolling window, one
  * XXH64 per gram over the flat UTF-16LE buffer), then keep the minimum
  * hash of every w-gram window (rightmost on ties). Guarantee: two
  * documents sharing any substring of ≥ w+k-1 normalized chars share at
  * least one fingerprint, while the sketch is ~2/(w+1) the size of the
  * full gram set. Output: sorted distinct selected hashes — directly
  * joinable/jaccard-able like [[ShingleHashes]] output, at a fraction of
  * the bytes.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
  extends UnaryExpression {
  require(k >= 1, "gram length must be >= 1")
  require(w >= 1, "window length must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.WinnowFingerprint.compute($a, $k, $w)")

  override protected def withNewChildInternal(c: Expression): WinnowFingerprint = copy(child = c)
  override def prettyName: String = "winnow_fingerprint"
}

object WinnowFingerprint {
  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val sb = ShingleSet.normalize(text.toString)
    val len = sb.length
    val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    val bytes = new Array[Byte](len * 2)
    var b = 0
    while (b < len) {
      val c = sb.charAt(b)
      bytes(b * 2) = (c & 0xFF).toByte
      bytes(b * 2 + 1) = ((c >> 8) & 0xFF).toByte
      b += 1
    }
    // empty normalized text carries NO similarity evidence: a non-empty
    // sketch here would give every empty doc the same fingerprint and
    // pair them all quadratically at jaccard 1.0 downstream
    // (winnowSketches filters size(fp) > 0 on exactly this contract);
    // short-but-nonempty text degrades to a whole-text hash — exact-
    // content evidence, the same contract as ShingleSet's short-text
    // whole-string shingle
    if (len == 0) return new GenericArrayData(Array.empty[Long])
    if (len < k)
      return new GenericArrayData(
        Array(XXH64.hashUnsafeBytes(bytes, off, len * 2, 42L)))
    val m = len - k + 1 // gram count
    val hashes = new Array[Long](m)
    var j = 0
    while (j < m) {
      hashes(j) = XXH64.hashUnsafeBytes(bytes, off + j * 2L, k * 2, 42L)
      j += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    if (m <= w) {
      // one window: its (rightmost) minimum is the whole sketch
      var best = 0
      var i = 1
      while (i < m) { if (hashes(i) <= hashes(best)) best = i; i += 1 }
      seen.add(hashes(best))
    } else {
      // monotonic deque sliding-window minimum, O(m); `>=` eviction
      // keeps the RIGHTMOST minimal gram per window (winnowing's
      // tie-break, needed for the shared-substring guarantee)
      val dq = new Array[Int](m)
      var head = 0; var tail = 0 // [head, tail) holds candidate indices
      var i = 0
      while (i < m) {
        while (tail > head && hashes(dq(tail - 1)) >= hashes(i)) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1) seen.add(hashes(dq(head)))
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { out(x) = it.next(); x += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}

/** jaccard_sorted(a, b): exact Jaccard similarity of two SORTED distinct
  * long arrays — one linear merge, no hash sets, codegen'd. The
  * verification kernel for LSH candidates.
  */
case class JaccardSorted(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSorted.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardSorted.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSorted =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_sorted"
}

object JaccardSorted {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }
}

/** Intersection SIZE of two sorted array<bigint> sets — the same merge
  * as [[JaccardSorted]] returning the raw count, for ASYMMETRIC scores
  * (containment |A∩B|/|A|) where the caller needs the numerator as an
  * exact integer rather than a pre-divided double.
  */
case class IntersectSizeSorted(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectSizeSorted.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectSizeSorted.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectSizeSorted =
    copy(left = l, right = r)
  override def prettyName: String = "intersect_size_sorted"
}

object IntersectSizeSorted {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }
}

/** simhash64 over pre-hashed shingles: same vote fold as [[SimHash64]]
  * without re-hashing.
  */
case class SimHash64FromHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash64FromHashes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimHash64FromHashes.compute($a)")

  override protected def withNewChildInternal(c: Expression): SimHash64FromHashes = copy(child = c)
  override def prettyName: String = "simhash64_from_hashes"
}

object SimHash64FromHashes {
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** minhash signature over pre-hashed shingles: k universal-hash mixes of
  * each pre-computed hash, min-tracked — no string hashing.
  */
case class MinHashFromHashes(child: Expression, numHashes: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashFromHashes.compute(input.asInstanceOf[ArrayData], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinHashFromHashes.compute($a, $numHashes))")

  override protected def withNewChildInternal(c: Expression): MinHashFromHashes = copy(child = c)
  override def prettyName: String = "minhash_from_hashes"
}

object MinHashFromHashes {
  def compute(arr: ArrayData, numHashes: Int): Array[Long] =
    MinHashSignature.computeFromHashes(
      i => arr.getLong(i), arr.numElements(), numHashes)
}

/** word_grams(text, n): space-joined word n-grams of the lowercased
  * text, words split on the regex-portable whitespace class
  * [\t\n\x0B\f\r ]. Exactly the rows of
  * `transform(sequence(...), i -> array_join(slice(words, i, n), ' '))`
  * over `filter(split(lower(text), ws), x -> x <> '')` — but those
  * higher-order functions run interpreted and re-walk the word array
  * per gram (O(words · n) expression evals plus a slice copy per
  * position); this kernel emits every gram in one pass over the
  * lowercased bytes. Lowercasing is the full-string
  * UTF8String.toLowerCase — the same call `lower()` compiles to, so
  * oracle parity is unchanged. Returns an empty array when the text has
  * fewer than n words (explode then drops the doc, matching the
  * `size(w) >= n` pre-filter).
  */
case class WordGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram length must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument")
    }

  override def nullSafeEval(input: Any): Any =
    WordGrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.WordGrams.compute($a, $n)")

  override protected def withNewChildInternal(c: Expression): WordGrams = copy(child = c)
  override def prettyName: String = "word_grams"
}

object WordGrams {
  /** ASCII whitespace-class bytes; multibyte UTF-8 units are ≥ 0x80 so
    * scanning raw bytes can never split inside a code point.
    */
  @inline private def isWs(b: Byte): Boolean =
    b == ' '.toByte || (b >= '\t'.toByte && b <= '\r'.toByte)

  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val bytes = text.toLowerCase.getBytes
    // word spans [starts(i), ends(i))
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nWords = 0
    var i = 0
    while (i < bytes.length) {
      if (!isWs(bytes(i))) {
        val s = i
        while (i < bytes.length && !isWs(bytes(i))) i += 1
        if (nWords == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nWords * 2)
          ends = java.util.Arrays.copyOf(ends, nWords * 2)
        }
        starts(nWords) = s
        ends(nWords) = i
        nWords += 1
      } else i += 1
    }
    if (nWords < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nWords - n + 1)
    var g = 0
    while (g <= nWords - n) {
      var len = n - 1 // single-space joiners
      var w = g
      while (w < g + n) { len += ends(w) - starts(w); w += 1 }
      val gram = new Array[Byte](len)
      var pos = 0
      w = g
      while (w < g + n) {
        if (w > g) { gram(pos) = ' '.toByte; pos += 1 }
        val wl = ends(w) - starts(w)
        System.arraycopy(bytes, starts(w), gram, pos, wl)
        pos += wl
        w += 1
      }
      out(g) = UTF8String.fromBytes(gram)
      g += 1
    }
    new GenericArrayData(out)
  }
}

object TextHashFunctions {
  def wordGrams(text: Column, n: Int = 8): Column =
    bridge.toColumn(WordGrams(bridge.toExpression(text), n))
  def shingleSet(text: Column, n: Int = 5): Column =
    bridge.toColumn(ShingleSet(bridge.toExpression(text), n))
  def shingleHashes(text: Column, n: Int = 5): Column =
    bridge.toColumn(ShingleHashes(bridge.toExpression(text), n))
  def jaccardSorted(a: Column, b: Column): Column =
    bridge.toColumn(JaccardSorted(bridge.toExpression(a), bridge.toExpression(b)))
  def intersectSizeSorted(a: Column, b: Column): Column =
    bridge.toColumn(IntersectSizeSorted(bridge.toExpression(a), bridge.toExpression(b)))
  def winnowFingerprint(text: Column, k: Int = 5, w: Int = 4): Column =
    bridge.toColumn(WinnowFingerprint(bridge.toExpression(text), k, w))
  def simhash64(shingles: Column): Column =
    bridge.toColumn(SimHash64(bridge.toExpression(shingles)))
  def simhash64FromHashes(hashes: Column): Column =
    bridge.toColumn(SimHash64FromHashes(bridge.toExpression(hashes)))
  def minhashSignature(shingles: Column, numHashes: Int = 64): Column =
    bridge.toColumn(MinHashSignature(bridge.toExpression(shingles), numHashes))
  def minhashFromHashes(hashes: Column, numHashes: Int = 64): Column =
    bridge.toColumn(MinHashFromHashes(bridge.toExpression(hashes), numHashes))
}
