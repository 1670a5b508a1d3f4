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
      ((id * 48271L + 11L) % 1920L + 1L).cast("int").as("width"),
      ((id * 69621L + 7L) % 1080L + 1L).cast("int").as("height"),
      ((id * 16807L + 3L) % 600000L).as("duration_ms"))
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
