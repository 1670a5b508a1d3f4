package graft

import graft.ops.Aggregates
import org.apache.spark.sql.functions._

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  // skewed data: key 7 holds 90% of rows (the hh-config shape)
  private lazy val skewed = (0L until 5000L)
    .map(i => (if (i % 10 == 0) i % 5 else 7L, i % 100))
    .toDF("k", "v")

  test("salted aggregation equals direct groupBy on skewed data") {
    val direct = skewed.groupBy($"k")
      .agg(sum($"v").as("sum_value"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val salted = Aggregates.saltedSumCount(skewed, $"k", $"v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(salted.toSeq === direct.toSeq)
  }

  test("global topK equals sort-take") {
    val df = (0L until 1000L).map(i => (i, (i * 37) % 911)).toDF("id", "score")
    val got = Aggregates.topK(df, 5, $"score".desc, $"id".asc)
      .select("id").as[Long].collect().toSeq
    val expected = (0L until 1000L).map(i => (i, (i * 37) % 911))
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    assert(got === expected)
  }

  test("per-group topK equals per-group sort-take") {
    val df = (0L until 1000L).map(i => (i % 7, i, (i * 13) % 101)).toDF("g", "id", "score")
    val got = Aggregates.topKPerGroup(df, Seq($"g"), 3, $"score".desc, $"id".asc)
      .select("g", "id").as[(Long, Long)].collect().sorted
    val expected = (0L until 1000L).map(i => (i % 7, i, (i * 13) % 101))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy { case (_, id, s) => (-s, id) }.take(3).map(r => (r._1, r._2))
      }.sorted
    assert(got.toSeq === expected)
  }

  test("exact distinct count per group matches collections") {
    val df = (0L until 2000L).map(i => (i % 3, i % 251)).toDF("g", "v")
    val got = Aggregates.distinctExact(df, $"g", $"v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = (0L until 2000L).map(i => (i % 3, i % 251))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size.toLong }
    assert(got === expected)
  }

  test("FM estimate is a power of two within 4x of the truth") {
    val n = 5000L
    val df = (0L until n).map(i => Tuple1(i * 2654435761L % 1000003L)).toDF("v")
    val est = Aggregates.distinctFm(df, $"v").collect().head.getLong(0)
    assert((est & (est - 1)) === 0L, s"estimate $est not a power of two")
    val exact = (0L until n).map(i => i * 2654435761L % 1000003L).distinct.size
    assert(est >= exact / 4 && est <= exact.toLong * 8, s"estimate $est vs exact $exact")
  }

  test("FM hashes binary values by CONTENT, not array identity") {
    // distinct-count sketches are multiplicity-insensitive: repeating
    // the same 64 binary values 1000x must not move the estimate. With
    // the identity-based Array[Byte].hashCode fallback every ROW hashes
    // differently and the repeated frame estimates ~row count instead
    val once = (1 to 64).map(i => Tuple1(s"key$i".getBytes)).toDF("b")
    val repeated = (1 to 64000).map(i => Tuple1(s"key${i % 64 + 1}".getBytes)).toDF("b")
    val estOnce = Aggregates.distinctFm(once, $"b").collect().head.getLong(0)
    val estRep = Aggregates.distinctFm(repeated, $"b").collect().head.getLong(0)
    assert(estRep === estOnce,
      s"multiplicity moved the binary estimate: $estOnce vs $estRep")
  }

  test("FM estimate rounds up: estimate >= distinct for small cardinalities") {
    // the reference rounds UP to a power of two to size its hash table
    // (q4112.c:356-371) — for tiny inputs the estimate must not undershoot
    // so hard the table overflows; sanity-check a few cardinalities
    for (n <- Seq(1, 10, 100)) {
      val df = (0 until n).map(i => Tuple1(i.toLong)).toDF("v")
      val est = Aggregates.distinctFm(df, $"v").collect().head.getLong(0)
      assert(est >= 1, s"n=$n est=$est")
    }
  }

  test("approx_percentile within rank-error bound of the exact percentile") {
    // GK sketch at accuracy a has rank error <= n/a; with a=10000 and
    // n=20000 the returned value sits within 2 ranks of the exact one
    val n = 20000
    val vals = (0 until n).map(i => (i.toLong * 2654435761L) % 10007L)
    val df = vals.map(Tuple1(_)).toDF("v")
    val approx = df.agg(
      expr("approx_percentile(v, array(0.25, 0.5, 0.95), 10000)").as("p"))
      .collect().head.getSeq[Long](0)
    val sorted = vals.sorted
    for ((q, got) <- Seq(0.25, 0.5, 0.95).zip(approx)) {
      val rank = (q * (n - 1)).toInt
      val lo = sorted(math.max(0, rank - 4))
      val hi = sorted(math.min(n - 1, rank + 4))
      assert(got >= lo && got <= hi, s"q=$q got=$got expected in [$lo,$hi]")
    }
  }

  test("HLL estimate within 3*rsd of the truth") {
    val df = (0L until 10000L).map(i => (i % 2, i % 1237)).toDF("g", "v")
    val got = Aggregates.distinctHll(df, $"g", $"v", rsd = 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    got.values.foreach { est =>
      assert(math.abs(est - 1237.0) / 1237.0 < 0.15, s"estimate $est vs 1237")
    }
  }
}
