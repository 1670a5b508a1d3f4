package graft

import graft.functions.KmeansKernels
import graft.ops.Clustering
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4

  /** 3 well-separated blobs around (0,…), (100,…), (200,…) with small
    * deterministic jitter — any sane k=3 clustering recovers them.
    */
  private def blob(center: Float, seed: Int): Array[Float] =
    Array.tabulate(dim)(d => center + (((seed * 31 + d * 7) % 11) - 5) / 10.0f)

  private lazy val blobs = (0 until 30).map { i =>
    val g = i % 3
    (i.toLong, g, blob(g * 100.0f, i))
  }.toDF("id", "truth", "v")

  test("kmeans recovers well-separated blobs exactly") {
    val (assigned, model) = Clustering.kmeans(blobs, "id", "v", k = 3, maxIter = 5)
    assert(model.centroids.length === 3)
    // every truth-group maps to exactly one cluster label and vice versa
    val pairs = assigned.join(blobs, "id").select("truth", "cluster")
      .as[(Int, Int)].collect().toSet
    assert(pairs.size === 3, s"clusters not pure: $pairs")
    assert(pairs.map(_._2).size === 3, "two truth groups merged")
  }

  test("inertia trace is non-increasing (Lloyd's invariant)") {
    val (_, model) = Clustering.kmeans(blobs, "id", "v", k = 3, maxIter = 6)
    val tr = model.inertiaTrace
    assert(tr.nonEmpty)
    tr.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-6, s"inertia rose: $tr")
      case _ =>
    }
  }

  test("kmeans is deterministic across runs") {
    val (a1, m1) = Clustering.kmeans(blobs, "id", "v", k = 3, maxIter = 4)
    val (a2, m2) = Clustering.kmeans(blobs, "id", "v", k = 3, maxIter = 4)
    assert(m1.centroids.map(_.toSeq).toSeq === m2.centroids.map(_.toSeq).toSeq)
    assert(a1.orderBy("id").collect().toSeq === a2.orderBy("id").collect().toSeq)
  }

  test("k larger than distinct points keeps empty clusters valid") {
    val tiny = (0 until 4).map(i => (i.toLong, blob(i * 100.0f, i))).toDF("id", "v")
    val (assigned, model) = Clustering.kmeans(tiny, "id", "v", k = 6, maxIter = 3)
    assert(model.centroids.length === 6)
    val cl = assigned.select("cluster").as[Int].collect()
    assert(cl.forall(c => c >= 0 && c < 6))
    assert(cl.length === 4)
  }

  test("nearest_centroid_index matches declarative HOF argmin") {
    val cents = Array(
      Array.tabulate(dim)(_.toDouble),
      Array.tabulate(dim)(d => 50.0 + d),
      Array.tabulate(dim)(d => 150.0 - d))
    val vecs = (0 until 40).map(i => (i.toLong, blob((i % 3) * 70.0f, i)))
      .toDF("id", "v")
    val cLit = typedlit(cents.map(_.toIndexedSeq).toIndexedSeq)
    val dists = transform(cLit, c =>
      aggregate(
        zip_with(col("v"), c, (x, cv) => (x.cast("double") - cv) * (x.cast("double") - cv)),
        lit(0.0), (acc, x) => acc + x))
    val rows = vecs
      .withColumn("kernel", KmeansKernels.nearestIndex(col("v"), cents))
      .withColumn("hof",
        (array_position(dists, array_min(dists)) - 1).cast("int"))
      .select("kernel", "hof").as[(Int, Int)].collect()
    rows.foreach { case (k2, h) => assert(k2 === h) }
  }

  test("vector_sum aggregate matches posexplode groupBy sum") {
    val vecs = (0 until 25).map(i => (i.toLong, i % 2, blob(i * 3.0f, i)))
      .toDF("id", "g", "v")
    val got = vecs.groupBy("g")
      .agg(KmeansKernels.vectorSum(col("v"), dim).as("vs"))
      .as[(Int, Seq[Double])].collect().toMap
    val expected = vecs.select(col("g"), posexplode(col("v")))
      .groupBy("g", "pos").agg(sum(col("col").cast("double")).as("s"))
      .as[(Int, Int, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    expected.foreach { case (g, exp) =>
      val gs = got(g)
      exp.zip(gs).foreach { case (e, x) => assert(math.abs(e - x) < 1e-6) }
    }
  }

  test("sq_dist_at matches scala computation") {
    val cents = Array(Array.tabulate(dim)(_.toDouble), Array.tabulate(dim)(d => 9.0 - d))
    val v = blob(5.0f, 7)
    val got = Seq((1L, v)).toDF("id", "v")
      .select(
        KmeansKernels.sqDistAt(col("v"), lit(0), cents).as("d0"),
        KmeansKernels.sqDistAt(col("v"), lit(1), cents).as("d1"))
      .as[(Double, Double)].collect().head
    def sq(c: Array[Double]) = v.zip(c).map { case (x, cv) =>
      val d = x.toDouble - cv; d * d }.sum
    assert(math.abs(got._1 - sq(cents(0))) < 1e-9)
    assert(math.abs(got._2 - sq(cents(1))) < 1e-9)
  }

  test("diverse sample takes exactly min(perCluster, size) per cluster") {
    val (assigned, _) = Clustering.kmeans(blobs, "id", "v", k = 3, maxIter = 4)
    val sample = Clustering.diverseSample(assigned, "id", perCluster = 4)
    val sizes = assigned.groupBy("cluster").count()
      .as[(Int, Long)].collect().toMap
    val samp = sample.groupBy("cluster").count()
      .as[(Int, Long)].collect().toMap
    sizes.foreach { case (c, n) =>
      assert(samp.getOrElse(c, 0L) === math.min(4L, n), s"cluster $c")
    }
    // deterministic
    val s2 = Clustering.diverseSample(assigned, "id", perCluster = 4)
      .orderBy("id").collect().toSeq
    assert(sample.orderBy("id").collect().toSeq === s2)
  }

  test("a NaN-bearing vector cannot poison training") {
    // without the guards a corrupt row becomes EVERY farthest-point
    // seed (NaN ranks largest under struct ordering) and its NaN
    // propagates into a cluster mean through the sum aggregate
    Clustering.clearModelCache()
    val bad = Seq((9999L, 0, Array(Float.NaN, 1f, 1f, 1f))).toDF("id", "truth", "v")
    val (_, model) = Clustering.kmeans(blobs.union(bad), "id", "v", k = 3, maxIter = 4)
    assert(model.centroids.forall(_.forall(d => !d.isNaN)),
      s"NaN leaked into centroids: ${model.centroids.map(_.toSeq).toSeq}")
    // all three blob centers recovered (≈ 0, 100, 200 in coordinate 0)
    val c0 = model.centroids.map(_.head).sorted
    assert(math.abs(c0(0) - 0.0) < 20 && math.abs(c0(1) - 100.0) < 20 &&
      math.abs(c0(2) - 200.0) < 20, s"blob centers not recovered: ${c0.toSeq}")
  }

  test("vectorSum rejects non-float arrays at analysis time") {
    // getFloat on an array<double> buffer would silently misread bytes;
    // the aggregate must fail analysis, not produce garbage centroids
    val dd = Seq(Tuple1(Array(1.0, 2.0))).toDF("v")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      dd.agg(KmeansKernels.vectorSum(col("v"), 2)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<float>"),
      s"unexpected analysis error: ${e.getMessage}")
  }
}
