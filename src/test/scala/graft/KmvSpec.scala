package graft

import org.apache.spark.sql.functions._
import graft.ops.{Kmv, Sampling}

/** KMV bottom-k sketch: partial-pass losslessness, estimator accuracy,
  * Jaccard overlap, and the exactly-k-per-group sample built on the same
  * md5 priorities.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("sketch equals naive bottom-k distinct regardless of partitioning") {
    val ids = (1 to 5000).map(i => i * 37 % 4096) // dups on purpose
    for (parts <- Seq(1, 7)) {
      val df = ids.toDF("id").repartition(parts)
      val sk = Kmv.sketch(df, col("id"), 64).as[Long].collect().toSeq
      val naive = df.select(Kmv.priority(col("id")).as("pri"))
        .distinct().orderBy("pri").limit(64).as[Long].collect().toSeq
      assert(sk == naive, s"parts=$parts")
      assert(sk == sk.sorted && sk.distinct == sk)
    }
  }

  test("sketch ignores NULL keys (distinct-count semantics) instead of crashing") {
    // priority(NULL) is NULL and the Long encoder rejects it at runtime
    // without the filter; count(distinct) ignores NULLs, so must we
    val df = Seq(Some(1L), Some(2L), None, Some(2L), None).toDF("k")
    val sk = Kmv.sketch(df, col("k"), 8)
    assert(sk.count() === 2L)
  }

  test("ndv estimate is exact below k and within 4 sigma above it") {
    val small = (1 to 40).toDF("id")
    val estSmall = Kmv.ndvEstimate(Kmv.sketch(small, col("id"), 256), 256)
      .as[Long].collect()(0)
    assert(estSmall == 40L) // NDV < k: the sketch IS the distinct set

    val big = (1 to 20000).toDF("id").repartition(5)
    val est = Kmv.ndvEstimate(Kmv.sketch(big, col("id"), 256), 256)
      .as[Long].collect()(0)
    // sigma ~ ndv/sqrt(k-2) ~ 1255; allow 4 sigma
    assert(math.abs(est - 20000L) <= 5100, s"est=$est")
  }

  test("jaccard estimate tracks exact overlap") {
    // A = 1..6000, B = 4001..10000 -> |A∩B|=2000, |A∪B|=10000, J=0.2
    val a = (1 to 6000).toDF("id").repartition(3)
    val b = (4001 to 10000).toDF("id").repartition(4)
    val k = 512
    val est = Kmv.jaccardEstimate(
      Kmv.sketch(a, col("id"), k), Kmv.sketch(b, col("id"), k), k)
      .select(col("n_union_sk"), col("n_both"), col("jaccard_bp_est"))
      .collect()(0)
    assert(est.getLong(0) == k)
    // sigma = sqrt(J(1-J)/k) ~ 177 bp; allow 4 sigma around 2000 bp
    assert(math.abs(est.getLong(2) - 2000L) <= 710, s"est=$est")
  }

  test("jaccard estimate: disjoint and empty inputs degrade to zero") {
    val a = (1 to 100).toDF("id")
    val b = (1001 to 1100).toDF("id")
    val d = Kmv.jaccardEstimate(
      Kmv.sketch(a, col("id"), 64), Kmv.sketch(b, col("id"), 64), 64)
      .select(col("jaccard_bp_est")).as[Long].collect()(0)
    assert(d == 0L)
    val empty = a.filter(col("id") < 0)
    val e = Kmv.jaccardEstimate(
      Kmv.sketch(empty, col("id"), 64), Kmv.sketch(empty, col("id"), 64), 64)
      .select(col("jaccard_bp_est")).as[Long].collect()(0)
    assert(e == 0L) // guarded division, not null/error
  }

  test("bottomKPerGroup: exactly k rows per group, stable under repartition") {
    val rows = for (g <- Seq("x", "y", "z"); i <- 1 to 50) yield (g, g + i)
    val df = rows.toDF("grp", "id")
    def run(parts: Int) =
      Sampling.bottomKPerGroup(df.repartition(parts), col("id"), col("grp"), 5)
        .select(col("grp"), col("id"), col("rk"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
        .toSet
    val r1 = run(1)
    assert(r1.size == 15 && r1.groupBy(_._1).forall(_._2.size == 5))
    assert(r1.forall { case (_, _, rk) => rk >= 1 && rk <= 5 })
    assert(run(8) == r1)
    // ranks follow the md5 priority order the oracle replays
    val expected = Seq("x", "y", "z").flatMap { g =>
      (1 to 50).map(i => g + i)
        .sortBy(id => (java.security.MessageDigest.getInstance("MD5")
          .digest(id.getBytes("UTF-8")).map("%02x".format(_)).mkString, id))
        .take(5).zipWithIndex.map { case (id, j) => (g, id, j + 1) }
    }.toSet
    assert(r1 == expected)
  }
}
