package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` payload columns with typed metadata —
  * the layout that keeps parquet scans prunable (metadata-only queries
  * never read the bytes) and lets the decode stage run as a distributed
  * batch map. The decode kernels themselves (JPEG/PNG/audio codecs) are
  * STUBBED with a deterministic fake — the codec libraries are not in
  * this container — but the Spark-side contract (schema, batching,
  * partition-parallel mapPartitions, feature schema) is real and tested,
  * so swapping in a real codec is a one-function change.
  */
object Multimodal {

  /** A media row: payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      modality: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  /** Extracted features per media row. */
  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      payload_hash: String,
      feature: Array[Float])

  /** Wrap any table into a media table by treating a string column as the
    * opaque payload (deterministic stand-in for real image bytes; the
    * schema and downstream plumbing are exactly what real media uses).
    * Metadata stand-ins are plain LCG arithmetic on the id — portable to
    * any SQL engine, so the whole multimodal family is oracle-checkable.
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
      modality: String = "image"): DataFrame = {
    val id = col(idCol).cast("long")
    df.select(
      id.as("media_id"),
      lit(modality).as("modality"),
      col(payloadCol).cast("binary").as("payload"),
      // pmod, not %: a negative id (or a multiply that wraps Long on a
      // huge id) would give a non-positive width/height and a negative
      // duration, poisoning resizePlan/sampleFrames downstream; pmod
      // equals % on the non-negative testdata ids, so the DuckDB oracle
      // arithmetic is unchanged where it is exercised
      (pmod(id * 48271L + 11L, lit(1920L)) + 1L).cast("int").as("width"),
      (pmod(id * 69621L + 7L, lit(1080L)) + 1L).cast("int").as("height"),
      pmod(id * 16807L + 3L, lit(600000L)).as("duration_ms"))
  }

  /** STUB decode kernel — deterministic fake feature vector derived from
    * the payload bytes. A real implementation would decode the codec and
    * pool pixel/sample data; everything around this function (schema,
    * batch shape, partition parallelism) is production-shaped.
    */
  private def decodeStub(payload: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var h = -7046029254386353131L // FNV-ish rolling state, fixed seed
    var i = 0
    while (i < payload.length) {
      h = (h ^ payload(i)) * 1099511628211L
      out(math.abs((h % dims).toInt)) += ((h >>> 32).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** Distributed feature extraction: partition-parallel map over the
    * payload bytes. `mapPartitions` is the Scala analog of a
    * `mapInPandas` iterator-of-batches UDF: per-partition init constructs
    * the decoder context once, and rows are processed in fixed-size
    * batches (the Arrow-batch shape) so a real codec/model can amortize
    * per-batch dispatch exactly like a Pandas UDF would.
    */
  def extractFeatures(
      media: DataFrame, dims: Int = 16, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init: a real impl constructs the decoder/model
        // here (the MD5 digest stands in for that per-partition context)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.grouped(batchSize).flatMap { batch =>
          // per-batch dispatch: a real impl hands `batch` to the codec as
          // one call (the mapInPandas pandas.DataFrame equivalent)
          batch.map { case (id, modality, payload) =>
            val bytes = if (payload == null) Array.emptyByteArray else payload
            md.reset()
            val hex = md.digest(bytes).map("%02x".format(_)).mkString
            MediaFeatures(
              media_id = id,
              modality = modality,
              n_bytes = bytes.length.toLong,
              payload_hash = hex,
              feature = decodeStub(bytes, dims))
          }
        }
      }
  }

  /** Banded near-dup pair search over BINARY payloads — the dedup
    * family extended past text and embeddings to opaque media bytes:
    * the signature is the DISTINCT set of xxhash64 values of
    * fixed-size byte blocks; an inverted index over block hashes
    * yields candidates (two payloads sharing ANY block — LOSSLESS for
    * any threshold > 0, the [[Dedup.winnowPairs]] screen shape, since
    * Jaccard > 0 needs a shared block); candidates verify by exact
    * Jaccard over the sorted block-hash sets with the same codegen
    * merge kernel as the text path. `maxDocFreq` is the same
    * boilerplate valve (a block in f payloads contributes f²
    * candidates — think shared media headers/watermarks).
    *
    * Scope: block alignment means this catches bit-identical and
    * block-aligned-near-identical payloads (the exact-dup and
    * appended/truncated-container class). Content-SHIFTED media
    * near-dup needs a decode-side feature ([[extractFeatures]] + the
    * embedding dedup family), not a byte screen.
    *
    * Scale shape: signatures are computed scan-side (one pass per
    * payload, ~len/blockSize longs each); the posting shuffle carries
    * slim (hash, id) longs; full signature arrays are re-joined for
    * candidate verification only. Output: (id_a, id_b, jaccard) with
    * id_a < id_b and jaccard >= threshold.
    */
  def payloadNearDupPairs(
      media: DataFrame,
      blockSize: Int = 32,
      threshold: Double = 0.5,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    require(threshold > 0.0, "the shared-block screen needs threshold > 0")
    require(blockSize > 0)
    val sig = media
      .filter(length(col("payload")) > 0) // empty payload = no evidence
      .select(col("media_id").as("id"),
        expr("array_sort(array_distinct(transform(" +
          s"sequence(0, (length(payload) - 1) div $blockSize), " +
          s"i -> xxhash64(substring(payload, i * $blockSize + 1, $blockSize)))))")
          .as("bh"))
      .repartition(media.sparkSession.sparkContext.defaultParallelism, col("id"))
    val posting = sig.select(col("id"), explode(col("bh")).as("h"))
    val screened =
      if (maxDocFreq == Int.MaxValue) posting
      else posting
        .withColumn("df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
        .filter(col("df") <= maxDocFreq).drop("df")
    val candidates = screened.as("a")
      .join(screened.as("b"), Seq("h"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
    candidates
      .join(sig.select(col("id").as("id_a"), col("bh").as("bh_a")), Seq("id_a"))
      .join(sig.select(col("id").as("id_b"), col("bh").as("bh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.TextHashFunctions.jaccardSorted(
          col("bh_a"), col("bh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Frame sampling for video-shaped rows: one output row per sampled
    * frame timestamp (every `everyMs`). Pure `sequence`+`explode` — the
    * fan-out happens scan-side, distributed.
    */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L), greatest(col("duration_ms") - 1, lit(0L)), lit(everyMs))))
      .select(col("media_id"), col("modality"), col("frame_ts_ms"),
        md5(concat(col("media_id").cast("string"), lit(":"),
          col("frame_ts_ms").cast("string"))).as("frame_ref"))

  /** Metadata-only resize plan: computes target dimensions preserving
    * aspect ratio without touching payload bytes (scan reads only the
    * int columns — payload column pruned away by Catalyst).
    */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(maxSide) / col("width"), lit(maxSide) / col("height"), lit(1.0))
    media.select(col("media_id"), col("width"), col("height"),
      ceil(col("width") * scale).cast("int").as("target_width"),
      ceil(col("height") * scale).cast("int").as("target_height"))
  }
}
