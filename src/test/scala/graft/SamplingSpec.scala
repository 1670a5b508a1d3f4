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
}
