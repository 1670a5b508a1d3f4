package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.KmeansKernels

/** Trained k-means (Lloyd's iteration) over an `array<float>` embedding
  * column, plus the cluster-stratified diversity sampler built on it.
  *
  * The training-data-pipeline uses: semantic bucketing for topic
  * balancing, diversity-aware subsampling, and supplying REAL (learned)
  * centroids to the IVF index in [[Similarity.ivfTopK]] (whose
  * pseudo-centroid quantizer stands in for exactly this model).
  *
  * 100 TB shape: per iteration, ONE pass over the data — assignment is a
  * codegen'd argmin against a driver-held k×dim matrix (reference object,
  * no per-row allocation), the centroid update is a partial/merge/final
  * [[graft.functions.VectorSumAgg]] whose exchange carries k×dim doubles
  * per partition (scale-free in the row count), and only k summary rows
  * reach the driver. The projected (id, vec) columns are persisted across
  * iterations so parquet decode is paid once, not maxIter times.
  */
object Clustering {

  /** Final centroids + the per-iteration inertia trace (Σ squared L2 to
    * the assigned centroid, measured at assignment time — non-increasing
    * for exact Lloyd's, the oracle-gate invariant).
    */
  final case class KmeansModel(
      centroids: Array[Array[Double]], inertiaTrace: Seq[Double])

  /** Run `maxIter` Lloyd's iterations; returns (assignments, model).
    * Assignments: the input frame's id column + `cluster` (0-based int).
    *
    * Deterministic: farthest-point seeding from the min-xxhash64 row
    * (see init comment), fixed iteration order, fixed double accumulation
    * order, and fixed tie-breaks — the trained model is a pure function
    * of the input.
    * Empty clusters keep their previous centroid (standard Lloyd's
    * fallback; no re-seeding, which would break determinism).
    */
  // Relation-keyed model cache (same build-once pattern as
  // Q4112's dense/stats caches): the trainer is deterministic — a pure
  // function of (relation, idCol, vecCol, k, maxIter) — so a repeated
  // query over an UNCHANGED relation reuses the trained model instead
  // of re-running maxIter Lloyd's passes. Keyed on the CANONICALIZED
  // logical plan (Spark's own sameResult notion); bounded LRU, training
  // outside the lock — see [[BoundedModelCache]].
  private val modelCache = new BoundedModelCache[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      String, String, Int, Int), KmeansModel](capacity = 16)

  def clearModelCache(): Unit = modelCache.clear()

  def kmeans(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, maxIter: Int): (DataFrame, KmeansModel) = {
    require(k > 0 && maxIter > 0)
    val key = (df.queryExecution.optimizedPlan.canonicalized,
      idCol, vecCol, k, maxIter)
    val model = modelCache.getOrElseTrain(key)(
      train(df, idCol, vecCol, k, maxIter))
    val assignments = df.select(col(idCol),
      KmeansKernels.nearestIndex(col(vecCol), model.centroids).as("cluster"))
    (assignments, model)
  }

  private def train(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, maxIter: Int): KmeansModel = {
    // corrupt (NaN-bearing) vectors are excluded from TRAINING: one NaN
    // row would otherwise poison its cluster's mean through the sum
    // aggregate (NaN propagates) and, unguarded, the farthest-point
    // seeding. Such rows still get an assignment at inference
    // (nearestIndex defaults to 0 when every distance is NaN).
    val proj = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .filter(!exists(col("vec"), x => isnan(x)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // unpersist on EVERY exit: a mid-training task failure or require
    // throw must not leak the persisted projection for the session
    // lifetime (the Bpe.trainMergesUncached pattern)
    try trainOnProj(proj, k, maxIter)
    finally proj.unpersist(blocking = false)
  }

  private def trainOnProj(
      proj: DataFrame, k: Int, maxIter: Int): KmeansModel = {

    // Deterministic farthest-point (k-center greedy) init: seed 1 is the
    // row with the smallest xxhash64(id); each further seed is the row
    // maximizing squared distance to its nearest already-chosen seed
    // (ties → larger id; exact, deterministic). One small aggregate per
    // seed (k-1 extra jobs over the cached projection) buys what random
    // init can't guarantee: well-separated blobs get one seed each, so
    // Lloyd's doesn't start in a merged/split local optimum.
    val first = proj
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(1)
      .select(col("vec"))
      .collect()
    require(first.nonEmpty, "kmeans: empty input")
    var centroids: Array[Array[Double]] =
      Array(first.head.getSeq[Float](0).map(_.toDouble).toArray)
    val dim = centroids.head.length
    while (centroids.length < k) {
      val nearest = KmeansKernels.nearestIndex(col("vec"), centroids)
      val far = proj
        .withColumn("d", KmeansKernels.sqDistAt(col("vec"), nearest, centroids))
        // NaN ranks LARGEST under struct ordering, so one corrupt vector
        // would become every remaining seed; rank it last instead
        .withColumn("d", when(isnan(col("d")), lit(-1.0)).otherwise(col("d")))
        .select(max(struct(col("d"), col("id"), col("vec"))).as("m"))
        .select(col("m.vec"))
        .collect()
      centroids = centroids :+ far.head.getSeq[Float](0).map(_.toDouble).toArray
    }

    val trace = Seq.newBuilder[Double]
    var it = 0
    while (it < maxIter) {
      val assigned = proj.withColumn(
        "cluster", KmeansKernels.nearestIndex(col("vec"), centroids))
      // one aggregate per iteration: vector sums + counts + inertia,
      // k rows to the driver
      val stats = assigned.groupBy("cluster").agg(
        KmeansKernels.vectorSum(col("vec"), dim).as("vs"),
        count(lit(1)).as("n"),
        sum(KmeansKernels.sqDistAt(col("vec"), col("cluster"), centroids))
          .as("inertia"))
        .collect()
      // sort before summing: collect() order is shuffle-fetch order, and
      // double addition is not associative — the trace must be a pure
      // function of the data, not of fetch races
      trace += stats.sortBy(_.getAs[Int]("cluster"))
        .map(_.getAs[Double]("inertia")).sum
      val next = centroids.map(_.clone())
      stats.foreach { r =>
        val c = r.getAs[Int]("cluster")
        val vs = r.getSeq[Double](r.fieldIndex("vs"))
        val n = r.getAs[Long]("n").toDouble
        var i = 0
        while (i < dim) { next(c)(i) = vs(i) / n; i += 1 }
      }
      centroids = next
      it += 1
    }

    KmeansModel(centroids, trace.result())
  }

  /** Cluster-stratified diversity sample: at most `perCluster` rows from
    * every k-means cluster, picked by deterministic hash rank within the
    * cluster. The standard diversity-aware subsample: coverage of every
    * semantic bucket instead of frequency-weighted duplication.
    *
    * One window over the slim (id, cluster) frame — ranking shuffles
    * 12-byte rows, never embeddings; `WindowGroupLimit` keeps ≤
    * `perCluster` rows per cluster per partition ahead of the exchange.
    */
  def diverseSample(assignments: DataFrame, idCol: String, perCluster: Int): DataFrame = {
    val w = Window.partitionBy(col("cluster"))
      .orderBy(xxhash64(col(idCol)), col(idCol))
    assignments
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= perCluster)
      .select(col(idCol), col("cluster"))
  }
}
