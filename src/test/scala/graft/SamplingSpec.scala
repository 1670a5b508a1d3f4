package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows =
    (0L until 1000L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "s")

  test("deterministic split is stable and partitions every row exactly once") {
    val s1 = Sampling.deterministicSplit(rows, col("id"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val s2 = Sampling.deterministicSplit(rows.repartition(7), col("id"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(s1 === s2)                       // partitioning-independent
    assert(s1.values.sum === 1000L)         // total partition
    assert(s1.keySet === Set("train", "valid", "test"))
    assert(s1("train") > s1("valid") && s1("train") > s1("test"))
  }

  test("split assignment is per-row deterministic (same id, same split)") {
    val a = Sampling.deterministicSplit(rows, col("id"))
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.deterministicSplit(rows.orderBy(col("id").desc), col("id"))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a === b)
  }

  test("deterministic sample keeps a subset and pct=100 keeps everything") {
    val kept = Sampling.deterministicSample(rows, col("id"), 30)
      .select("id").as[Long].collect().toSet
    val all = Sampling.deterministicSample(rows, col("id"), 100).count()
    assert(all === 1000L)
    assert(kept.size < 1000 && kept.nonEmpty)
    // sampled ids are a subset of the full table's and re-derivable
    val again = Sampling.deterministicSample(rows, col("id"), 30)
      .select("id").as[Long].collect().toSet
    assert(kept === again)
  }

  test("stratified sample respects per-stratum percentages") {
    val got = Sampling.stratifiedSample(rows, col("id"), col("s"),
      Map("a" -> 100, "b" -> 0)).select("s").as[String].collect()
    assert(got.toSet === Set("a"))
    assert(got.length === rows.filter(col("s") === "a").count())
    // a mid percentage keeps a strict, deterministic subset
    val half = Sampling.stratifiedSample(rows, col("id"), col("s"),
      Map("a" -> 50), defaultPct = 100)
    val aKept = half.filter(col("s") === "a").count()
    assert(aKept > 0 && aKept < rows.filter(col("s") === "a").count())
    assert(half.filter(col("s") === "b").count() ===
      rows.filter(col("s") === "b").count())
  }

  test("mixture resample: weights steer the per-domain budget; uniform = weights 1") {
    val docs = (0L until 3000L)
      .map(i => (i, Seq("web", "code", "papers")(((i % 10) min 2).toInt)))
      .toDF("id", "dom")
    // uniform: every domain gets budget/k docs targeted → rate ∝ 1/n_domain
    val uni = Sampling.mixtureResample(docs, "id", "dom",
        docs.select(col("dom")).distinct().withColumn("weight", lit(1L)))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val n = 3000L; val k = 3L
    uni.foreach { case (_, (_, nd, w, rate, _)) =>
      assert(w === 1L)
      assert(rate === math.min(10000L, (n * 3 / 10 / k) * 10000L / nd))
    }
    // non-uniform: a domain with weight 3 gets 3x the weight-1 target
    val wdf = docs.select(col("dom")).distinct()
      .withColumn("weight", when(col("dom") === "web", 3L).otherwise(1L))
    val wt = Sampling.mixtureResample(docs, "id", "dom", wdf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val wTotal = 5L
    wt.foreach { case (_, (dom, nd, w, rate, smp)) =>
      val expW = if (dom == "web") 3L else 1L
      assert(w === expW)
      assert(rate === math.min(10000L, (n * 3 / 10 * expW / wTotal) * 10000L / nd))
      assert(smp >= 0L && smp <= nd)
    }
    // the accepted set is deterministic: same inputs, same counts
    val again = Sampling.mixtureResample(docs, "id", "dom", wdf)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(again === wt.values.toSet)
  }
}
