package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.{Quantization, Similarity}

/** PQ-at-scale measurement harness (SCALING.md): synthesizes an
  * n-vector unit-norm corpus (deterministic, hash-derived — no RNG
  * state), trains codebooks on a strided sample, then times the three
  * phases a production ANN deployment separates:
  *
  *   encode  — one-time map pass producing 16-byte codes (21× smaller)
  *   adc     — per-query compressed scan (shortlist 50 per probe)
  *   brute   — per-query exact cosine scan over raw vectors (baseline)
  *
  * Usage: runMain graft.PqScale [nVectors] [reps] [dim]
  */
object PqScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val reps = if (args.length > 1) args(1).toInt else 3
    val dim = if (args.length > 2) args(2).toInt else 64
    val spark = Engine.session()
    import org.apache.spark.sql.DataFrame

    def timeIt(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // unit-norm synthetic corpus: element i of row id is a hash-derived
    // uniform in [-1, 1); one normalize pass. HOFs are fine here —
    // generation is not a timed phase (the corpus is cached first).
    val raw = spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("id") * 64 + i), lit(1000000L)).cast("double")
          / 500000.0 - 1.0).cast("float")).as("v0"))
    val norm = sqrt(aggregate(col("v0"), lit(0.0),
      (a, x) => a + x.cast("double") * x.cast("double")))
    val corpus = raw
      .select(col("id"), transform(col("v0"), x => (x / norm).cast("float")).as("vec"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[pqscale] corpus n=${corpus.count()} dim=$dim")

    // train on a ~20k strided sample (the production recipe: codebooks
    // from a bounded sample, never the full corpus)
    val stride = math.max(1L, n / 20000L)
    val sample = corpus.filter(pmod(col("id"), lit(stride)) === 0)
    val t0 = System.nanoTime()
    val model = Quantization.trainPq(sample, "id", "vec", m = 16, k = 64, maxIter = 4)
    println(f"[pqscale] train ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"(sample=${sample.count()}) trace=${model.errorTrace.map(_.round).mkString(",")}")

    // one-time encode pass (timed, then cached: the serving state)
    val tEnc = timeIt { exec(Quantization.encode(corpus, "vec", model)
      .select(col("id"), col("pq_code"))) }
    val enc = Quantization.encode(corpus, "vec", model)
      .select(col("id"), col("pq_code")).persist(StorageLevel.MEMORY_AND_DISK)
    enc.count()
    println(f"[pqscale] encode pass $tEnc%.2f s (${n / tEnc / 1e6}%.1f M rows/s)")

    val probes = corpus.filter(col("id") < 8)
    def adcOnce(): Unit =
      exec(Quantization.adcTopK(enc, "id", probes, "id", "vec", model, topK = 50))
    def bruteOnce(): Unit =
      exec(Similarity.bruteForceTopK(corpus, "id", "vec", probes, "id", "vec", k = 10))

    val adc = (1 to reps).map(_ => timeIt(adcOnce()))
    val brute = (1 to reps).map(_ => timeIt(bruteOnce()))
    println(f"[pqscale] adc   reps=${adc.map(t => f"$t%.2f").mkString(",")} " +
      f"best=${adc.min}%.2f s (${n * 8 / adc.min / 1e6}%.0f M code-probes/s)")
    println(f"[pqscale] brute reps=${brute.map(t => f"$t%.2f").mkString(",")} " +
      f"best=${brute.min}%.2f s (${n * 8 / brute.min / 1e6}%.0f M vec-probes/s)")
    println(f"[pqscale] speedup=${brute.min / adc.min}%.2fx  " +
      f"bytes/row: codes=${model.m} raw=${dim * 4}")
    spark.stop()
  }
}
