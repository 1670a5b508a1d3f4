package graft

import org.apache.spark.sql.functions._
import graft.gen.Q4112Gen
import graft.model.GenConfig

/** DataSource V2 generator source: bit-equality with the declarative
  * generator, column pruning, id-range predicate pushdown (the source
  * never PRODUCES out-of-range rows), and planner statistics.
  */
class SourceV2Spec extends SparkSpec {

  private val rows = 5000L
  private val seed = 42L
  private val valMax = 1000000L

  private def v2 = spark.read.format("graft.sources.GenSource")
    .option("rows", rows).option("seed", seed)
    .option("valMax", valMax).option("partitions", 7).load()

  private def declarative = Q4112Gen.items(spark, GenConfig(
    innerTuples = rows, innerSelectivity = 1.0, innerValMax = valMax,
    outerTuples = rows, outerSelectivity = 1.0, outerValMax = 100L,
    groups = 1L, hhGroups = 0L, hhProbability = 0.0, seed = seed)).toDF()

  test("v2 source rows equal the declarative generator bit-for-bit") {
    val a = v2.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = declarative.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.length === rows)
    assert(a.toSeq === b.toSeq)
  }

  test("column pruning reaches the source: price-only read emits 1-column batches") {
    val df = v2.select(col("price"))
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    assert(scan.output.map(_.name) === Seq("price"),
      s"scan not pruned: ${scan.output}")
  }

  test("id-range filters push into generation: the scan emits only in-range rows") {
    val df = v2.filter(col("id") >= 100L && col("id") <= 199L)
    assert(df.count() === 100L)
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    df.collect()
    val produced = scan.metrics("numOutputRows").value
    assert(produced === 100L,
      s"filter not pushed: source produced $produced rows for a 100-row range")
  }

  test("source statistics reach the planner with zero jobs") {
    val stats = v2.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(rows)),
      s"rowCount missing from source stats: $stats")
  }

  test("micro-batch stream drains the range in bounded batches, equal to the batch read") {
    val stream = spark.readStream.format("graft.sources.GenSource")
      .option("rows", 1000L).option("seed", seed)
      .option("valMax", valMax).option("partitions", 4)
      .option("batchRows", 300L).load()
    val q = stream.writeStream.format("memory").queryName("gen_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("gen_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = spark.read.format("graft.sources.GenSource")
        .option("rows", 1000L).option("seed", seed).option("valMax", valMax)
        .load().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch)
      assert(streamed.size === 1000)
      // admission control: 1000 rows at ≤300/batch needs ≥4 micro-batches
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 4, s"expected ≥4 bounded micro-batches, saw $batches")
    } finally q.stop()
  }

  private def hasAggregate(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isDefined

  test("aggregate pushdown: COUNT/MIN/MAX/SUM(id) answered analytically, Aggregate node gone") {
    val df = v2.agg(count(lit(1)), min(col("id")), max(col("id")), sum(col("id")))
    assert(!hasAggregate(df), "complete pushdown should remove the Aggregate")
    val r = df.collect()(0)
    assert(r.getLong(0) === rows)
    assert(r.getLong(1) === 1L)
    assert(r.getLong(2) === rows)
    assert(r.getLong(3) === rows * (rows + 1) / 2)
  }

  test("aggregate pushdown composes with pushed id filters (narrowed range)") {
    val df = v2.filter(col("id") > 1000L && col("id") <= 2000L)
      .agg(count(lit(1)), min(col("id")), max(col("id")), sum(col("id")))
    assert(!hasAggregate(df))
    val r = df.collect()(0)
    assert(r.getLong(0) === 1000L)
    assert(r.getLong(1) === 1001L)
    assert(r.getLong(2) === 2000L)
    assert(r.getLong(3) === (1001L to 2000L).sum)
  }

  test("aggregate pushdown declines price aggregates and grouped aggregates") {
    val priceAgg = v2.agg(sum(col("price")))
    assert(hasAggregate(priceAgg), "sum(price) is not analytic — must not push")
    val grouped = v2.groupBy(col("price") % 2).agg(count(lit(1)))
    assert(hasAggregate(grouped), "grouped aggregation must not push")
    // and the declined path still computes the right answer
    assert(priceAgg.collect()(0).getLong(0) ===
      declarative.agg(sum(col("price"))).collect()(0).getLong(0))
  }

  test("aggregate pushdown declines when a residual filter survives") {
    val df = v2.filter(col("price") >= 0L).agg(count(lit(1)))
    assert(hasAggregate(df), "post-scan filter must block aggregate pushdown")
    assert(df.collect()(0).getLong(0) === rows)
  }

  test("limit pushdown narrows generation: the scan produces exactly n rows") {
    val df = v2.limit(137)
    assert(df.count() === 137L)
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    df.collect()
    val produced = scan.metrics("numOutputRows").value
    assert(produced === 137L,
      s"limit not pushed: source produced $produced rows for limit 137")
    // composes with a pushed filter: limit applies to the narrowed range
    val filtered = v2.filter(col("id") > 4000L).limit(50)
    assert(filtered.collect().map(_.getLong(0)).toSeq ===
      (4001L to 4050L))
  }

  test("builder never narrows a pushed limit under a pushed aggregate") {
    import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
    val b = new graft.sources.GenScanBuilder(rows, seed, valMax, 7, 1000L)
    assert(b.pushAggregation(new Aggregation(
      Array(new CountStar), Array.empty)), "count(*) must push")
    // pre-fix this narrowed [lo, hi) and the pushed COUNT would have
    // counted the truncated range (advice r9 #4)
    assert(!b.pushLimit(10), "limit must be refused once an aggregate is pushed")
    val scan = b.build()
    assert(scan.isInstanceOf[graft.sources.GenAggScan])
    assert(scan.description().contains("COUNT(*)"))
  }

  test("SUM(id) pushdown declines when the exact series overflows a long") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Sum}
    // 5e9 ids sum to ~1.25e19 > Long.MaxValue: the pushed answer would
    // wrap where ANSI mode's own Sum would throw (advice r9 #5)
    val big = new graft.sources.GenScanBuilder(5000000000L, seed, valMax, 7, 1000L)
    val sumAgg = new Aggregation(
      Array(new Sum(Expressions.column("id"), false)), Array.empty)
    assert(!big.pushAggregation(sumAgg), "overflowing SUM(id) must not push")
    // counts remain analytic on the same range
    assert(big.pushAggregation(new Aggregation(Array(new CountStar), Array.empty)))
    // and a fitting range still pushes SUM
    val small = new graft.sources.GenScanBuilder(rows, seed, valMax, 7, 1000L)
    assert(small.pushAggregation(sumAgg), "in-range SUM(id) must still push")
  }

  test("aggregate pushdown on an empty pushed range: count 0, null min/max/sum") {
    val df = v2.filter(col("id") > rows).agg(count(lit(1)),
      min(col("id")), max(col("id")), sum(col("id")))
    val r = df.collect()(0)
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }
}
