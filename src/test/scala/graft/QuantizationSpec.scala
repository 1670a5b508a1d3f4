package graft

import graft.functions.PqKernels
import graft.ops.{Quantization, Similarity}
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Engine.table(spark, sfDir, "embeddings")
  private lazy val model =
    Quantization.trainPq(emb, "vec_id", "embedding", m = 16, k = 64, maxIter = 4)

  test("trainPq is deterministic and its error trace is non-increasing") {
    val again =
      Quantization.trainPq(emb, "vec_id", "embedding", m = 16, k = 64, maxIter = 4)
    assert(model.codebooks.flatten.flatten.toSeq === again.codebooks.flatten.flatten.toSeq)
    assert(model.errorTrace.length === 4)
    model.errorTrace.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-6, s"error rose: ${model.errorTrace}")
      case _ =>
    }
  }

  test("encode emits m-byte codes whose ADC self-distance is the quantization error") {
    val enc = Quantization.encode(emb, "embedding", model)
    assert(enc.filter(length(col("pq_code")) =!= model.m).isEmpty)
    // ADC(v's own code, v's own LUT) = Σ_j min-dist? No — it's the
    // distance THROUGH the assigned cells, which for the own code is
    // exactly the row's total quantization error Σ_j d(sv_j, chosen_j).
    // Recompute that independently driver-side from the collected model.
    val rows = Quantization.encode(emb.limit(50), "embedding", model)
      .select(col("embedding"), col("pq_code"),
        PqKernels.pqAdcScore(col("pq_code"),
          Quantization.adcLut(col("embedding"), model), model.k).as("self_adc"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val code = r.getAs[Array[Byte]](1)
      var want = 0.0
      for (j <- 0 until model.m) {
        val cen = model.codebooks(j)(code(j) & 0xFF)
        for (i <- 0 until model.subDim) {
          val d = v(j * model.subDim + i).toDouble - cen(i)
          want += d * d
        }
      }
      assert(math.abs(r.getDouble(2) - want) < 1e-9,
        s"kernel ADC ${r.getDouble(2)} != driver recompute $want")
    }
  }

  test("encode agrees with the training assignment path (shared tie-break)") {
    val enc = Quantization.encode(emb, "embedding", model)
    val viaTraining = emb.select(col("vec_id"), explode(transform(
        sequence(lit(0), lit(model.m - 1)),
        j => struct(j.cast("int").as("sub"),
          slice(col("embedding"), j * model.subDim + 1, lit(model.subDim)).as("sv"))))
        .as("e"))
      .select(col("vec_id"), col("e.sub").as("sub"),
        PqKernels.nearestSubCentroid(col("e.sub"), col("e.sv"), model.codebooks)
          .as("code"))
    // byte-extract via the driver: compare per-row code arrays directly
    val encMap = enc.select(col("vec_id"), col("pq_code"))
      .as[(Long, Array[Byte])].collect().toMap
    val mismatches = viaTraining.as[(Long, Int, Int)].collect().count {
      case (id, sub, code) => (encMap(id)(sub) & 0xFF) != code
    }
    assert(mismatches === 0)
  }

  test("trained and pseudo IVF-PQ agree when every bucket is probed") {
    // with nProbe = nCentroids the routing layer screens nothing — both
    // quantizers deliver the ENTIRE code corpus to the ADC shortlist, so
    // the trained-routing and pseudo-routing serving paths must produce
    // the identical top-k (bucket boundaries differ, coverage doesn't)
    import graft.ops.Clustering
    val probes = emb.filter(col("vec_id") <= 3)
    val (_, km) = Clustering.kmeans(emb, "vec_id", "embedding", k = 4, maxIter = 3)
    val trained = Quantization.ivfPqTopKTrained(emb, "vec_id", "embedding",
      probes, "vec_id", "embedding", model, km.centroids,
      nProbe = 4, shortlist = 30, topK = 5)
      .select("probe_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val pseudo = Quantization.ivfPqTopK(emb, "vec_id", "embedding",
      probes, "vec_id", "embedding", model,
      nCentroids = 4, nProbe = 4, shortlist = 30, topK = 5)
      .select("probe_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(trained === pseudo)
    assert(trained.nonEmpty)
  }

  test("ADC+rerank recall@10 clears the gate floor at EVERY test sf") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val e = Engine.table(spark, d, "embeddings")
      val mo = Quantization.trainPq(e, "vec_id", "embedding", m = 16, k = 64, maxIter = 4)
      val probes = e.filter(col("vec_id") <= 5)
      val pq = Quantization.adcRerankTopK(e, "vec_id", "embedding",
        probes, "vec_id", "embedding", mo, shortlist = 50, topK = 10)
        .select(col("probe_id"), col("corpus_id"))
      val brute = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        probes, "vec_id", "embedding", k = 10)
        .select(col("probe_id"), col("corpus_id"))
      val nb = brute.count()
      val nh = brute.join(pq, Seq("probe_id", "corpus_id"), "left_semi").count()
      assert(nh.toDouble > nb * 0.5, s"PQ recall below floor at $d: $nh/$nb")
      // re-ranked hits are ranked identically to brute force on the ties
      // they share: the exact metric and tie-break are the same code path
    }
  }

  test("the ADC corpus scan stays codegen'd (no UDFs, kernel in the plan)") {
    val enc = Quantization.encode(emb, "embedding", model)
    val df = Quantization.adcTopK(enc, "vec_id",
      emb.filter(col("vec_id") <= 5), "vec_id", "embedding", model, topK = 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"ADC path fell back to a UDF:\n$plan")
    assert(df.queryExecution.optimizedPlan.toString.contains("pq_adc_score"))
    // shortlist cap rides ahead of the ranking exchange
    assert(plan.contains("WindowGroupLimit"), s"no partial top-k:\n$plan")
  }

  test("pqEncode clamps truncated vectors instead of reading out of bounds") {
    // codebooks are trained for m*subDim dims; a shorter (corrupt/
    // truncated) row must encode from the dims it has — AIOOBE on
    // GenericArrayData, silent garbage on UnsafeArrayData otherwise
    val short = Seq((1L, Array.fill(5)(0.5f))).toDF("id", "v")
    val codes = short.select(PqKernels.pqEncode(col("v"), model.codebooks).as("c"))
      .head().getAs[Array[Byte]](0)
    assert(codes.length === 16)
  }
}
