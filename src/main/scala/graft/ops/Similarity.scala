package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  *  - [[bruteForceTopK]] is the exact baseline: broadcast the probe set,
  *    one codegen'd pass over the corpus per probe batch, per-probe top-k
  *    via ranked window. Cost |corpus|×|probes| cosines — right whenever
  *    the probe set is small (the common "query a trained index" case);
  *    at 100 TB the corpus stays partition-parallel and nothing shuffles
  *    except the k×|probes| result rows.
  *  - [[ivfTopK]] is the scale path: corpus vectors are bucketed once by
  *    their nearest of `nCentroids` deterministic pseudo-centroids
  *    (IVF-style coarse quantizer); a probe only scans the `nProbe`
  *    closest buckets. Recall < 1 by design; the candidate scan shrinks
  *    by ~nCentroids/nProbe.
  */
object Similarity {

  /** Exact cosine top-k: for each probe row, the k most-similar corpus
    * rows (excluding self-matches by id). Output:
    * (probe_id, corpus_id, cosine, rank).
    */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      probes: DataFrame, probeId: String, probeVec: String,
      k: Int = 10): DataFrame = {
    val c = corpus.select(col(corpusId).as("corpus_id"), col(corpusVec).as("cv"))
    val p = probes.select(col(probeId).as("probe_id"), col(probeVec).as("pv"))
    val scored = c.crossJoin(broadcast(p))
      .filter(col("corpus_id") =!= col("probe_id"))
      .select(col("probe_id"), col("corpus_id"),
        VectorFunctions.cosineSimilarity(col("cv"), col("pv")).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic pseudo-centroid c,d ∈ [-1, 1] (seeded hash — stands in
    * for trained k-means centroids, which would arrive as a broadcast
    * table in a real pipeline; the plumbing is identical).
    */
  private def centroidComponent(c: Int, d: Column): Column =
    (pmod(xxhash64(lit(c), d), lit(2000001L)) - 1000000L).cast("double") / 1000000.0

  /** Nearest-centroid id for a vector: argmax over c of cos(v, centroid_c)
    * ≈ argmax of dot(v, unit-ish centroid). Computed as a single
    * expression tree (greatest over per-centroid structs).
    */
  def centroidId(v: Column, nCentroids: Int): Column = {
    val scored = (0 until nCentroids).map { cid =>
      val dot = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * centroidComponent(cid, i)),
        lit(0.0), (acc, x) => acc + x)
      struct(dot.as("score"), lit(cid).as("cid"))
    }
    greatest(scored: _*).getField("cid")
  }

  /** IVF-style ANN: corpus bucketed by nearest pseudo-centroid; each
    * probe fans out to its `nProbe` nearest buckets; candidates within a
    * bucket are scored exactly and top-k kept per probe.
    * Output: (probe_id, corpus_id, cosine, rank).
    */
  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      probes: DataFrame, probeId: String, probeVec: String,
      k: Int = 10, nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val c = corpus.select(col(corpusId).as("corpus_id"), col(corpusVec).as("cv"))
      .withColumn("bucket", centroidId(col("cv"), nCentroids))
    // probe → its nProbe best buckets, ranked by centroid dot product
    val probeBuckets = probes.select(col(probeId).as("probe_id"), col(probeVec).as("pv"))
      .withColumn("bucket_scores", array((0 until nCentroids).map { cid =>
        val dot = aggregate(
          zip_with(col("pv"), sequence(lit(0), size(col("pv")) - 1),
            (x, i) => x * centroidComponent(cid, i)),
          lit(0.0), (acc, x) => acc + x)
        struct(dot.as("score"), lit(cid).as("cid"))
      }: _*))
      .withColumn("bucket",
        explode(slice(transform(array_sort(col("bucket_scores"),
          (a, b) => when(a.getField("score") > b.getField("score"), -1)
            .when(a.getField("score") < b.getField("score"), 1).otherwise(0)),
          s => s.getField("cid")), 1, nProbe)))
      .select(col("probe_id"), col("pv"), col("bucket"))
    val scored = c.join(broadcast(probeBuckets), Seq("bucket"))
      .filter(col("corpus_id") =!= col("probe_id"))
      .select(col("probe_id"), col("corpus_id"),
        VectorFunctions.cosineSimilarity(col("cv"), col("pv")).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
