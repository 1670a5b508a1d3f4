package graft

import graft.functions.VectorFunctions
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private def vec(seed: Int): Array[Float] =
    Array.tabulate(dim)(d => (((seed * 131 + d * 17) % 19) - 9) / 9.0f)

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  private lazy val corpus = (1 to 50).map(i => (i.toLong, vec(i))).toDF("id", "v")
  private lazy val probes = (1 to 3).map(i => (i.toLong, vec(i))).toDF("id", "v")

  test("cosine_similarity expression matches scala computation") {
    val rows = corpus.as[(Long, Array[Float])].collect()
    val a = rows.head._2
    val got = spark.range(1)
      .select(VectorFunctions.cosineSimilarity(
        typedLit(a.toSeq).cast("array<float>"),
        typedLit(rows(5)._2.toSeq).cast("array<float>")).as("c"))
      .collect().head.getDouble(0)
    assert(math.abs(got - cosine(a, rows(5)._2)) < 1e-6)
  }

  test("brute-force top-k returns the exact cosine ranking") {
    val k = 5
    val got = Similarity.bruteForceTopK(corpus, "id", "v", probes, "id", "v", k)
      .select("probe_id", "corpus_id", "rank").as[(Long, Long, Int)]
      .collect().groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap

    val corpusRows = (1 to 50).map(i => (i.toLong, vec(i)))
    (1 to 3).foreach { p =>
      val pv = vec(p)
      val expected = corpusRows.filter(_._1 != p.toLong)
        .map { case (id, v) => (id, cosine(pv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)
      assert(got(p.toLong) === expected, s"probe $p")
    }
  }

  test("IVF with nProbe == nCentroids recovers the brute-force result") {
    val k = 5
    val n = 4
    val brute = Similarity.bruteForceTopK(corpus, "id", "v", probes, "id", "v", k)
      .select("probe_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
    val ivfFull = Similarity.ivfTopK(corpus, "id", "v", probes, "id", "v",
      k = k, nCentroids = n, nProbe = n)
      .select("probe_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(ivfFull === brute)
  }

  test("IVF with nProbe < nCentroids keeps recall on self-similar probes") {
    // a probe identical to a corpus vector lands in the same bucket, so
    // rank-1 must be its twin even with 1 probe bucket
    val twin = Seq((999L, vec(7))).toDF("id", "v")
    val got = Similarity.ivfTopK(corpus, "id", "v", twin, "id", "v",
      k = 1, nCentroids = 4, nProbe = 1)
      .select("corpus_id").as[Long].collect()
    assert(got.headOption === Some(7L))
  }

  test("range search returns exactly the pairs with cosine >= threshold") {
    val threshold = 0.3
    val got = Similarity.rangeSearch(corpus, "id", "v", probes, "id", "v", threshold)
      .as[(Long, Long)].collect().toSet
    val rows = corpus.as[(Long, Array[Float])].collect()
    val ps = probes.as[(Long, Array[Float])].collect()
    val want = (for {
      (pid, pv) <- ps
      (cid, cv) <- rows
      if cid != pid && cosine(cv, pv) >= threshold
    } yield (pid, cid)).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }
}
