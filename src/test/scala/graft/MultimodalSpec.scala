package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asMediaTable(
    Seq((1L, "alpha payload"), (2L, "beta"), (3L, "")).toDF("id", "body"),
    "id", "body")

  test("media table schema: id, modality, binary payload, typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("media_id").dataType.typeName === "long")
    assert(schema("width").dataType.typeName === "integer")
    val rows = media.collect()
    assert(rows.forall(r => r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 1920))
    assert(rows.forall(r => r.getAs[Int]("height") >= 1 && r.getAs[Int]("height") <= 1080))
  }

  test("feature extraction is deterministic and sized correctly") {
    val f1 = Multimodal.extractFeatures(media, dims = 8).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, dims = 8).collect().sortBy(_.media_id)
    assert(f1.map(_.payload_hash).toSeq === f2.map(_.payload_hash).toSeq)
    assert(f1.map(_.feature.toSeq).toSeq === f2.map(_.feature.toSeq).toSeq)
    assert(f1.forall(_.feature.length === 8))
    assert(f1.find(_.media_id == 1L).get.n_bytes === "alpha payload".getBytes.length.toLong)
  }

  test("resize plan preserves aspect ratio and respects maxSide") {
    val plan = Multimodal.resizePlan(media, maxSide = 256).collect()
    plan.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (tw, th) = (r.getAs[Int]("target_width"), r.getAs[Int]("target_height"))
      assert(tw <= math.max(256, w) && th <= math.max(256, h))
      if (w <= 256 && h <= 256) { assert(tw === w); assert(th === h) }
      else {
        val scale = math.min(256.0 / w, 256.0 / h)
        assert(tw === math.ceil(w * scale).toInt)
        assert(th === math.ceil(h * scale).toInt)
      }
    }
  }

  test("frame sampling emits ceil(duration/every) frames") {
    val got = Multimodal.sampleFrames(media, everyMs = 1000L)
      .groupBy("media_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val durations = media.select("media_id", "duration_ms")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    durations.foreach { case (id, d) =>
      val expected = if (d <= 0) 1L else (d - 1) / 1000L + 1L
      assert(got(id) === expected, s"media $id duration $d")
    }
  }

  test("payload column is pruned from metadata-only plans") {
    val plan = Multimodal.resizePlan(media, maxSide = 128).queryExecution
      .optimizedPlan.toString
    assert(!plan.contains("payload"), s"payload not pruned:\n$plan")
  }

  test("payloadNearDupPairs: lossless screen, exact Jaccard, alignment scope") {
    import spark.implicits._
    val blockA = "A" * 32; val blockB = "B" * 32
    val blockC = "C" * 32; val blockD = "D" * 32
    val rows = Seq(
      (1L, blockA + blockB + blockC),        // 3 blocks
      (2L, blockA + blockB + blockC),        // exact dup of 1 -> jaccard 1.0
      (3L, blockA + blockB + blockD),        // 2 of 3 shared -> jaccard 0.5
      (4L, blockD * 3),                      // one distinct block, shares D with 3
      (5L, "x" + blockA + blockB + blockC))  // SHIFTED by one byte: no aligned block
      .toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(rows, "doc_id", "text")
    val got = Multimodal.payloadNearDupPairs(media, blockSize = 32, threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(got((1L, 2L)) === 1.0)
    assert(got((1L, 3L)) === 0.5)
    assert(got((2L, 3L)) === 0.5)
    // doc 4 shares only block D with doc 3: jaccard 1/3 < 0.5 -> absent
    assert(!got.contains((3L, 4L)))
    // byte-shifted content produces no aligned block: the documented
    // scope boundary (decode-side features catch this class)
    assert(!got.keys.exists { case (a, b) => a == 5L || b == 5L })
    // screen is lossless: banded output equals exhaustive all-pairs
    val sigs = rows.as[(Long, String)].collect().map { case (id, t) =>
      id -> t.getBytes("UTF-8").grouped(32).map(bl => new String(bl, "UTF-8")).toSet
    }.toMap
    val exhaustive = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      inter = (sigs(a) intersect sigs(b)).size
      uni = (sigs(a) union sigs(b)).size
      if inter.toDouble / uni >= 0.5
    } yield (a, b)).toSet
    assert(got.keySet === exhaustive)
    // the df valve only drops, never invents
    val capped = Multimodal.payloadNearDupPairs(media, blockSize = 32,
        threshold = 0.5, maxDocFreq = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(got.keySet))
  }
}
