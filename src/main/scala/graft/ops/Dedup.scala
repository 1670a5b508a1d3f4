package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Deduplication operators for training-data pipelines, each designed
  * around its shuffle profile at 100 TB:
  *
  *  - exact: one shuffle on a 128-bit content hash (not the text itself —
  *    the shuffle carries 16 bytes + ids, not documents).
  *  - MinHash+LSH: per-row signature computed scan-side with codegen'd
  *    array expressions (no explode of shingles → no |doc|×|shingles|
  *    blow-up); the only shuffle is the band-bucket self-join, which is
  *    the textbook LSH trade: candidates ∝ collisions, not n².
  *  - SimHash: 64-bit signature scan-side; pigeonhole banding (4×16-bit
  *    chunks) turns hamming≤3 search into 4 equi-joins.
  *  - n-gram Jaccard: exact verification on LSH candidates only.
  *  - embedding near-dup: random-hyperplane LSH over `array<float>`
  *    vectors, cosine verified on candidates with the codegen'd
  *    [[graft.functions.CosineSimilarity]].
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup on normalized content: groups by MD5(normalized text),
    * keeps the smallest id per group. Output: (keep_id, n_copies).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(TextAnalysis.fingerprintMd5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // ------------------------------------------------------------- shingles

  /** Distinct character n-gram shingles of the normalized text, as an
    * array column — computed with `sequence`+`transform` so it stays
    * inside whole-stage codegen (no UDF, no explode).
    */
  def shingles(text: Column, n: Int = 5): Column = {
    val norm = lower(regexp_replace(text, "\\s+", " "))
    val len = length(norm)
    when(len < n, array(norm))
      .otherwise(array_distinct(transform(
        sequence(lit(1), len - n + 1),
        i => norm.substr(i, lit(n)))))
  }

  // ------------------------------------------------------- MinHash + LSH

  /** MinHash signature: element k = min over shingles of
    * xxhash64(seed_k, shingle). All scan-side column math.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int = 64): Column =
    array((0 until numHashes).map { k =>
      array_min(transform(shingleCol, s => xxhash64(lit(k), s)))
    }: _*)

  /** Candidate near-dup pairs by banded MinHash-LSH, verified with exact
    * Jaccard over the shingle sets. `bands`×`rowsPerBand` must equal the
    * signature length. Output: (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sig = docs.select(
      col(idCol).as("id"),
      shingles(col(textCol), n).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    // one row per (doc, band): bucket = hash of the band's slice
    val banded = sig.select(
      col("id"), col("sh"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
      }: _*)).as("bb"))
      .select(col("id"), col("sh"), col("bb.band"), col("bb.bucket"))
    val a = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("jaccard") >= threshold)
  }

  // ------------------------------------------------------------- SimHash

  /** 64-bit SimHash of the shingle set: bit j of the signature is the
    * sign of Σ_shingles (±1 depending on bit j of xxhash64(shingle)).
    * Expressed as 64 aggregate-over-array columns — scan-side, codegen'd.
    */
  def simhash64(shingleCol: Column): Column = {
    val bits = (0 until 64).map { j =>
      val votes = aggregate(
        shingleCol, lit(0L),
        (acc, s) => acc + when((shiftright(xxhash64(s), j).bitwiseAND(lit(1L))) === 1, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** SimHash near-dup pairs: pigeonhole on 4 16-bit chunks (any pair with
    * hamming ≤ 3 shares at least one chunk), verify hamming via
    * bit_count(xor). Output: (id_a, id_b, hamming).
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      maxHamming: Int = 3): DataFrame = {
    val sig = docs.select(col(idCol).as("id"),
      simhash64(shingles(col(textCol), n)).as("sig"))
    val chunked = sig.select(col("id"), col("sig"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL)).as("ckey"))
      }: _*)).as("cc"))
      .select(col("id"), col("sig"), col("cc.chunk"), col("cc.ckey"))
    val a = chunked.select(col("chunk"), col("ckey"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk"), col("ckey"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long").as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------- exact n-gram Jaccard

  /** Exact pairwise n-gram Jaccard ≥ threshold. Blocking: only pairs
    * sharing a cheap block key (here: token-count bucket + first token)
    * are compared — at corpus scale the all-pairs variant is intractable
    * by design, and LSH ([[minhashPairs]]) is the recall-complete path.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val prep = docs.select(col(idCol).as("id"),
      shingles(col(textCol), n).as("sh"))
    val a = prep.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = prep.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ------------------------------------------- embedding cosine near-dup

  /** Near-duplicate pairs by embedding cosine ≥ threshold, candidates
    * from random-hyperplane LSH (signature = sign bits of dot products
    * with `planes` pseudo-random hyperplanes, banded into byte chunks).
    */
  def embeddingPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      planes: Int = 16): DataFrame = {
    // deterministic pseudo-random hyperplane component p,d ∈ {-1,+1}
    def planeBit(v: Column, p: Int): Column = {
      val dot = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * when(pmod(xxhash64(lit(p), i), lit(2)) === 0, -1.0).otherwise(1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    val sig = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("sig", (0 until planes).map(p => planeBit(col("v"), p)).reduce(_ bitwiseOR _))
    // band the signature into two halves: hamming-tolerant candidates
    val banded = sig.select(col("id"), col("v"),
      explode(array(
        struct(lit(0).as("chunk"), col("sig").bitwiseAND(lit((1L << (planes / 2)) - 1)).as("ckey")),
        struct(lit(1).as("chunk"), shiftright(col("sig"), planes / 2).as("ckey")))).as("cc"))
      .select(col("id"), col("v"), col("cc.chunk"), col("cc.ckey"))
    val a = banded.select(col("chunk"), col("ckey"), col("id").as("id_a"), col("v").as("v_a"))
    val b = banded.select(col("chunk"), col("ckey"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosineSimilarity(col("v_a"), col("v_b")).as("cosine"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("cosine") >= threshold)
  }
}
