package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{KmeansKernels, PqKernels}

/** Product quantization: training, encoding, and ADC search — the
  * compression axis of approximate nearest-neighbor search (IVF in
  * [[Similarity]] is the routing axis; a production IVF-PQ composes the
  * two). Jégou et al., TPAMI 2011.
  *
  * Scale shape (100 TB corpus): training touches a bounded sample (the
  * codebooks are m·k·subDim doubles — KB-sized, driver-held, broadcast
  * into codegen kernels as reference objects); encoding is one map pass
  * that shrinks each vector 32× (256 B float → m=8 bytes), after which
  * the compressed corpus fits where the raw one never would; a query
  * scans codes at m byte-lookups + adds per row via a probe-local LUT of
  * exact sub-distances. Nothing here shuffles the corpus — encode and
  * scan are map-only, and only top-k survivors (≤ k rows per partition,
  * WindowGroupLimit) reach the ranking exchange.
  */
object Quantization {

  /** Trained PQ codebooks + per-iteration quantization error (summed
    * squared L2 over all subspaces, measured at assignment time — for
    * exact per-subspace Lloyd's it is non-increasing, the oracle-gate
    * invariant).
    */
  final case class PqModel(
      m: Int, subDim: Int, k: Int,
      codebooks: Array[Array[Array[Double]]],
      errorTrace: Seq[Double])

  /** Train `m` independent `k`-entry codebooks with `maxIter` Lloyd's
    * iterations — ALL subspaces per pass: one scan assigns every
    * sub-vector, one (sub, code) aggregate (m·k slim rows to the driver)
    * recomputes every centroid. Deterministic: seeds are the `k` rows
    * with the smallest (xxhash64(id), id) — sliced per subspace — and
    * iteration order, accumulation order, and ties are fixed, so the
    * model is a pure function of the input. Empty codes keep their
    * previous centroid (standard Lloyd's fallback).
    */
  // Relation-keyed trained-model cache — build-once semantics, same
  // pattern as Clustering.modelCache / Q4112's dense cache: the trainer
  // is deterministic, so an unchanged relation reuses its codebooks.
  // Bounded LRU, training outside the lock — see [[BoundedModelCache]].
  private val modelCache = new BoundedModelCache[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      String, String, Int, Int, Int), PqModel](capacity = 16)

  def clearModelCache(): Unit = modelCache.clear()

  def trainPq(df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, maxIter: Int): PqModel = {
    require(m > 0 && k > 1 && k <= 256 && maxIter > 0)
    modelCache.getOrElseTrain(
      (df.queryExecution.optimizedPlan.canonicalized, idCol, vecCol, m, k, maxIter))(
      trainPqUncached(df, idCol, vecCol, m, k, maxIter))
  }

  private def trainPqUncached(df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, maxIter: Int): PqModel = {
    // NaN-bearing vectors are excluded from TRAINING (they would poison
    // codebook means through the sum aggregate); they still encode at
    // inference (argmin over NaN distances degrades to code 0)
    val proj = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .filter(!exists(col("vec"), x => isnan(x)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // unpersist on EVERY exit (require throws, task failures): a failed
    // training must not leak the persisted projection
    try trainPqOnProj(proj, m, k, maxIter)
    finally proj.unpersist(blocking = false)
  }

  private def trainPqOnProj(proj: DataFrame,
      m: Int, k: Int, maxIter: Int): PqModel = {
    val seeds = proj.orderBy(xxhash64(col("id")), col("id")).limit(k)
      .select(col("vec")).collect()
    require(seeds.length == k, s"trainPq needs >= $k rows, got ${seeds.length}")
    val dim = seeds.head.getSeq[Float](0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m

    var codebooks: Array[Array[Array[Double]]] =
      Array.tabulate(m, k) { (j, c) =>
        seeds(c).getSeq[Float](0).slice(j * subDim, (j + 1) * subDim)
          .map(_.toDouble).toArray
      }

    // (sub, sv) pairs: explode each row into its m sub-vector slices —
    // slim rows (subDim floats), reshuffled only by the (sub, code)
    // aggregate below
    val slices = proj.select(explode(transform(
        sequence(lit(0), lit(m - 1)),
        j => struct(j.cast("int").as("sub"),
          slice(col("vec"), j * subDim + 1, lit(subDim)).as("sv"))))
        .as("e"))
      .select(col("e.sub").as("sub"), col("e.sv").as("sv"))

    val trace = Seq.newBuilder[Double]
    var it = 0
    while (it < maxIter) {
      val assigned = slices
        .withColumn("code",
          PqKernels.nearestSubCentroid(col("sub"), col("sv"), codebooks))
        .withColumn("d",
          PqKernels.nearestSubDist(col("sub"), col("sv"), codebooks))
      val stats = assigned.groupBy(col("sub"), col("code")).agg(
        KmeansKernels.vectorSum(col("sv"), subDim).as("vs"),
        count(lit(1)).as("n"),
        sum(col("d")).as("err"))
        .collect()
      // fixed accumulation order: collect() returns shuffle-fetch order
      // and double addition is order-sensitive in the last ulps
      trace += stats.sortBy(r => (r.getAs[Int]("sub"), r.getAs[Int]("code")))
        .map(_.getAs[Double]("err")).sum
      val next = codebooks.map(_.map(_.clone()))
      stats.foreach { r =>
        val j = r.getAs[Int]("sub"); val c = r.getAs[Int]("code")
        val vs = r.getSeq[Double](r.fieldIndex("vs"))
        val n = r.getAs[Long]("n").toDouble
        var i = 0
        while (i < subDim) { next(j)(c)(i) = vs(i) / n; i += 1 }
      }
      codebooks = next
      it += 1
    }
    PqModel(m, subDim, k, codebooks, trace.result())
  }

  /** One-pass encode: adds `pq_code` (BinaryType, `m` bytes). */
  def encode(df: DataFrame, vecCol: String, model: PqModel): DataFrame =
    df.withColumn("pq_code", PqKernels.pqEncode(col(vecCol), model.codebooks))

  /** The probe-side ADC lookup table: flattened m×k array of EXACT
    * squared sub-distances from the probe vector to every codebook
    * entry. Declarative HOFs (probes are few; the per-row corpus work
    * stays in the codegen'd [[graft.functions.PqAdcScore]] kernel).
    */
  def adcLut(probeVec: Column, model: PqModel): Column = {
    val cbLit = typedlit(
      model.codebooks.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq)
    flatten(transform(cbLit, (book, j) =>
      transform(book, cent =>
        aggregate(
          zip_with(
            slice(probeVec, (j * model.subDim + 1).cast("int"), lit(model.subDim)),
            cent,
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (acc, v) => acc + v))))
  }

  /** ADC top-k: per probe, the `topK` corpus rows with the smallest
    * asymmetric PQ distance. Output (probe_id, corpus_id, rank).
    * The corpus streams once over its CODES (never the vectors); probes
    * + LUTs broadcast; WindowGroupLimit caps the ranking shuffle at
    * topK rows per partition per probe.
    */
  def adcTopK(encodedCorpus: DataFrame, corpusId: String,
      probes: DataFrame, probeId: String, probeVec: String,
      model: PqModel, topK: Int): DataFrame = {
    val p = probes.select(col(probeId).as("probe_id"),
      adcLut(col(probeVec), model).as("lut"))
    val scored = encodedCorpus
      .select(col(corpusId).as("corpus_id"), col("pq_code"))
      .crossJoin(broadcast(p))
      .filter(col("corpus_id") =!= col("probe_id"))
      .select(col("probe_id"), col("corpus_id"),
        PqKernels.pqAdcScore(col("pq_code"), col("lut"), model.k).as("adc_dist"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc_dist").asc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
  }

  /** The standard PQ serving pipeline: ADC over the compressed corpus
    * keeps a `shortlist` of candidates per probe, then ONLY those
    * candidates are re-ranked with the exact distance on raw vectors —
    * the expensive metric touches `shortlist` rows per probe instead of
    * the corpus. Output (probe_id, corpus_id, rank), rank by exact
    * cosine (unit-norm corpus ⇒ identical order to exact L2).
    *
    * Measured on the (uniform-random — PQ's worst case) testdata
    * corpus: 96-bit codes (m=16, k=64) + shortlist 50 put recall@10 at
    * 0.88–0.92 where raw ADC@10 sits at 0.28–0.40. The vector fetch for
    * re-ranking is a slim semi-join-shaped hash join on id: candidates
    * are probes × shortlist rows — broadcastable at any corpus size.
    */
  def adcRerankTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      probes: DataFrame, probeId: String, probeVec: String,
      model: PqModel, shortlist: Int, topK: Int): DataFrame = {
    require(shortlist >= topK)
    val enc = encode(corpus.select(col(corpusId), col(corpusVec)), corpusVec, model)
    val cand = adcTopK(enc, corpusId, probes, probeId, probeVec, model, shortlist)
      .select(col("probe_id"), col("corpus_id"))
    val cv = corpus.select(col(corpusId).as("corpus_id"), col(corpusVec).as("cv"))
    val pv = probes.select(col(probeId).as("probe_id"), col(probeVec).as("pv"))
    val exact = cand
      .join(cv, Seq("corpus_id"))
      .join(broadcast(pv), Seq("probe_id"))
      .select(col("probe_id"), col("corpus_id"),
        graft.functions.VectorFunctions.cosineSimilarity(col("cv"), col("pv"))
          .as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    exact.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
  }

  /** The composed FAISS-style IVF-PQ serving path — both index layers at
    * once: the coarse quantizer routes each probe to its `nProbe`
    * nearest of `nCentroids` buckets, the PQ-ADC score screens ONLY the
    * codes inside probed buckets down to a `shortlist`, and the exact
    * cosine re-ranks the shortlist on raw vectors. Output:
    * (probe_id, corpus_id, rank).
    *
    * 100 TB profile: the compressed corpus (ids + 96-bit codes + bucket)
    * is the only full-size relation touched; the ADC pass scans
    * ~nProbe/nCentroids of it (vs ALL of it in [[adcTopK]]); raw
    * vectors are fetched for shortlist×probes rows only, a slim id
    * equi-join. Probe side (lut + bucket fan-out) broadcasts.
    */
  def ivfPqTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      probes: DataFrame, probeId: String, probeVec: String,
      model: PqModel, nCentroids: Int, nProbe: Int,
      shortlist: Int, topK: Int): DataFrame =
    ivfPqCore(corpus, corpusId, corpusVec, probes, probeId, probeVec, model,
      Similarity.centroidId(col(corpusVec), nCentroids),
      graft.functions.VectorLshFunctions
        .topCentroids(col(probeVec), nCentroids, nProbe),
      shortlist, topK)

  /** [[ivfPqTopK]] with a TRAINED coarse quantizer: the k-means centroid
    * matrix ([[Clustering.kmeans]]) routes both the corpus bucketing and
    * the probe fan-out, completing the full FAISS composition
    * (trained IVF routing ∘ PQ-ADC screen ∘ exact re-rank) — the same
    * plan shape, with both routing kernels codegen'd against the
    * driver-held model.
    */
  def ivfPqTopKTrained(corpus: DataFrame, corpusId: String, corpusVec: String,
      probes: DataFrame, probeId: String, probeVec: String,
      model: PqModel, coarse: Array[Array[Double]], nProbe: Int,
      shortlist: Int, topK: Int): DataFrame =
    ivfPqCore(corpus, corpusId, corpusVec, probes, probeId, probeVec, model,
      graft.functions.KmeansKernels.nearestIndex(col(corpusVec), coarse),
      graft.functions.KmeansKernels.topIndices(col(probeVec), coarse, nProbe),
      shortlist, topK)

  private def ivfPqCore(corpus: DataFrame, corpusId: String, corpusVec: String,
      probes: DataFrame, probeId: String, probeVec: String,
      model: PqModel, corpusBucket: Column, probeBuckets: Column,
      shortlist: Int, topK: Int): DataFrame = {
    require(shortlist >= topK)
    val encB = encode(corpus.select(col(corpusId), col(corpusVec)), corpusVec, model)
      .select(col(corpusId).as("corpus_id"), col("pq_code"),
        corpusBucket.as("bucket"))
    // LUT computed BEFORE the bucket explode: one m×k table per probe
    // in the broadcast, not nProbe duplicate copies of it
    val probeB = probes
      .select(col(probeId).as("probe_id"),
        adcLut(col(probeVec), model).as("lut"),
        probeBuckets.as("buckets"))
      .select(col("probe_id"), col("lut"), explode(col("buckets")).as("bucket"))
    val screened = encB.join(broadcast(probeB), Seq("bucket"))
      .filter(col("corpus_id") =!= col("probe_id"))
      .select(col("probe_id"), col("corpus_id"),
        PqKernels.pqAdcScore(col("pq_code"), col("lut"), model.k).as("adc_dist"))
    val ws = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc_dist").asc, col("corpus_id").asc)
    val cand = screened.withColumn("srank", row_number().over(ws))
      .filter(col("srank") <= shortlist)
      .select(col("probe_id"), col("corpus_id"))
    val cv = corpus.select(col(corpusId).as("corpus_id"), col(corpusVec).as("cv"))
    val pv = probes.select(col(probeId).as("probe_id"), col(probeVec).as("pv"))
    val exact = cand
      .join(cv, Seq("corpus_id"))
      .join(broadcast(pv), Seq("probe_id"))
      .select(col("probe_id"), col("corpus_id"),
        graft.functions.VectorFunctions.cosineSimilarity(col("cv"), col("pv"))
          .as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    exact.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
  }
}
