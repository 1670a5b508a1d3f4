package graft

import graft.ops.Joins
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
    .toDF("lk", "lv")
  private lazy val right = Seq((2L, "x"), (3L, "y"), (3L, "z"), (5L, "w"))
    .toDF("rk", "rv")

  test("semi join keeps exactly the left rows with a match, once each") {
    val got = Joins.semi(left, right, left("lk") === right("rk"))
      .select("lk").as[Long].collect().sorted
    assert(got.toSeq === Seq(2L, 3L))
  }

  test("anti join keeps exactly the left rows without a match") {
    val got = Joins.anti(left, right, left("lk") === right("rk"))
      .select("lk").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 4L))
  }

  test("semi/anti leave the strategy to Catalyst (no forced broadcast)") {
    // a forced broadcast(right) OOMs when the right side is large; with
    // the broadcast threshold off, the planner must be free to pick a
    // shuffled strategy
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Joins.semi(left, right, left("lk") === right("rk"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), s"forced broadcast:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bloom prefilter refuses join types that must keep unmatched fact rows") {
    val e = intercept[IllegalArgumentException] {
      Joins.bloomPrefilteredJoin(left, right, col("lk"), col("rk"), 10L, "left_outer")
    }
    assert(e.getMessage.contains("unsound"))
    // empty dim: sound types degrade to the plain-join answer, not a crash
    val emptyDim = right.filter(lit(false))
    assert(Joins.bloomPrefilteredJoin(left, emptyDim,
      col("lk"), col("rk"), 10L, "inner").count() === 0L)
  }

  test("non-equi join matches the naive predicate evaluation") {
    val got = Joins.nonEqui(left, right, left("lk") < right("rk"))
      .select("lk", "rk").as[(Long, Long)].collect().sorted
    val expected = for {
      l <- Seq(1L, 2L, 3L, 4L); r <- Seq(2L, 3L, 3L, 5L) if l < r
    } yield (l, r)
    assert(got.toSeq === expected.sorted)
  }

  test("broadcast/shuffled-hash/sort-merge strategies agree") {
    val cond = left("lk") === right("rk")
    val a = Joins.broadcastRight(left, right, cond).select("lk", "rv").collect().map(_.toString).sorted
    val b = Joins.shuffledHash(left, right, cond).select("lk", "rv").collect().map(_.toString).sorted
    val c = Joins.sortMerge(left, right, cond).select("lk", "rv").collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq === c.toSeq)
  }

  test("asof join picks the latest right row at or before each left time") {
    val quotes = Seq( // (key, t, qid)
      (1L, 10L, 100L), (1L, 20L, 101L), (1L, 30L, 102L),
      (2L, 15L, 200L))
      .toDF("k", "qt", "qid")
    val trades = Seq( // (key, t, tid)
      (1L, 5L, 1L),   // before any quote → null
      (1L, 10L, 2L),  // == quote ts → inclusive match 100
      (1L, 25L, 3L),  // between 20 and 30 → 101
      (1L, 99L, 4L),  // after all → 102
      (2L, 14L, 5L),  // before key-2 quote → null
      (3L, 50L, 6L))  // key with no quotes → null
      .toDF("k", "tt", "tid")
    val got = Joins.asof(trades, quotes,
      keyCols = Seq("k"), leftTime = "tt", rightTime = "qt",
      leftCols = Seq("tid"), rightCols = Seq("qid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(1L -> -1L, 2L -> 100L, 3L -> 101L, 4L -> 102L, 5L -> -1L, 6L -> -1L))
  }

  test("forward asof picks the earliest right row at or after, tolerance voids far matches") {
    val quotes = Seq(
      (1L, 10L, 100L), (1L, 20L, 101L), (1L, 30L, 102L),
      (2L, 15L, 200L))
      .toDF("k", "qt", "qid")
    val trades = Seq(
      (1L, 5L, 1L),   // next quote at 10 → 100
      (1L, 20L, 2L),  // == quote ts → inclusive 101
      (1L, 25L, 3L),  // next at 30 → 102
      (1L, 99L, 4L),  // nothing after → null
      (2L, 16L, 5L))  // key-2 quote is before → null
      .toDF("k", "tt", "tid")
    def run(tol: Long) = Joins.asof(trades, quotes,
      keyCols = Seq("k"), leftTime = "tt", rightTime = "qt",
      leftCols = Seq("tid"), rightCols = Seq("qid"),
      direction = "forward", tolerance = tol)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(run(-1L) === Map(1L -> 100L, 2L -> 101L, 3L -> 102L, 4L -> -1L, 5L -> -1L))
    // tolerance 4: trade 1 (gap 5) and trade 3 (gap 5) now void
    assert(run(4L) === Map(1L -> -1L, 2L -> 101L, 3L -> -1L, 4L -> -1L, 5L -> -1L))
  }

  test("backward asof with tolerance voids stale matches only") {
    val quotes = Seq((1L, 10L, 100L)).toDF("k", "qt", "qid")
    val trades = Seq((1L, 12L, 1L), (1L, 99L, 2L)).toDF("k", "tt", "tid")
    val got = Joins.asof(trades, quotes,
      keyCols = Seq("k"), leftTime = "tt", rightTime = "qt",
      leftCols = Seq("tid"), rightCols = Seq("qid"), tolerance = 5L)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(1L -> 100L, 2L -> -1L))
  }

  test("band range join equals broadcast range join") {
    val points = (0L until 200L).map(i => (i, i % 97)).toDF("pid", "v")
    val ranges = Seq((0L, 0L, 10L), (1L, 5L, 25L), (2L, 90L, 97L), (3L, 40L, 41L))
      .toDF("rid", "lo", "hi")
    val viaBroadcast = Joins.rangeJoin(points, col("v"), ranges, col("lo"), col("hi"))
      .select("pid", "rid").as[(Long, Long)].collect().sorted
    val viaBand = Joins.bandRangeJoin(points, col("v"), ranges, col("lo"), col("hi"), bucketWidth = 8L)
      .select("pid", "rid").as[(Long, Long)].collect().sorted
    assert(viaBand.toSeq === viaBroadcast.toSeq)
    assert(viaBroadcast.nonEmpty)
  }

  test("salted skew join equals the plain join on skewed data") {
    // 90% of fact rows hit one hot key — the reference's hh_probability shape
    val fact = (0L until 1000L)
      .map(i => (if (i % 10 == 0) i % 7 else 3L, i)).toDF("fk", "payload")
    val dim = (0L until 7L).map(k => (k, s"dim_$k")).toDF("dk", "name")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .groupBy(col("name")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Joins.saltedSkewJoin(fact, dim, col("fk"), col("dk"), saltBuckets = 4)
      .groupBy(col("name")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
    assert(plain("dim_3") > 800L)
  }

  test("tableDiff classes partition the key universe and count each change kind") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // old: keys 1..100; new: drops %7=0, adds 101..110, rewrites %11=0
    val oldDf = (1L to 100L).map(k => (k, s"v$k")).toDF("k", "p")
    val newDf = ((1L to 100L).filter(_ % 7 != 0) ++ (101L to 110L))
      .map(k => (k, if (k <= 100 && k % 11 == 0) "CHANGED" else s"v$k"))
      .toDF("k", "p")
    val classes = Joins.tableDiff(oldDf, newDf, "k", "p")
      .as[(String, Long)].collect().toMap
    val removed = (1L to 100L).count(k => k % 7 == 0)
    val changed = (1L to 100L).count(k => k % 7 != 0 && k % 11 == 0)
    assert(classes("added") === 10L)
    assert(classes("removed") === removed.toLong)
    assert(classes("changed") === changed.toLong)
    assert(classes.values.sum === 110L) // |keys(old) ∪ keys(new)|
  }

  test("intervalOverlapJoin equals the naive cross-filter, each pair once") {
    // deterministic pseudo-random intervals engineered to include:
    // band-boundary starts (multiples of 10), spans over many bands,
    // touching endpoints (closed-interval semantics), and disjoint pairs
    val ivals = (1L to 60L).map { i =>
      val lo = (i * 37) % 199
      val span = (i * 13) % 45
      (i, lo, lo + span)
    }
    val a = ivals.toDF("id_a", "lo_a", "hi_a")
    val b = ivals.toDF("id_b", "lo_b", "hi_b")
    val got = Joins.intervalOverlapJoin(a, "lo_a", "hi_a", b, "lo_b", "hi_b",
        bandWidth = 10L, extraOn = col("id_a") < col("id_b"))
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val want = for {
      (i, li, hi) <- ivals; (j, lj, hj) <- ivals
      if i < j && li <= hj && lj <= hi
    } yield (i, j)
    assert(got.length === got.distinct.length, "a pair surfaced twice")
    assert(got.toSet === want.toSet)
    assert(want.nonEmpty && want.size < ivals.size * (ivals.size - 1) / 2,
      "fixture must be neither empty nor all-pairs")
  }

  test("intervalOverlapJoin never falls to a cartesian/BNLJ plan") {
    val ivals = (1L to 200L).map(i => (i, i * 3, i * 3 + 7)).toDF("id_a", "lo_a", "hi_a")
    val other = (1L to 200L).map(i => (i, i * 5, i * 5 + 4)).toDF("id_b", "lo_b", "hi_b")
    val df = Joins.intervalOverlapJoin(ivals, "lo_a", "hi_a",
      other, "lo_b", "hi_b", bandWidth = 16L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"banding must yield an equi-join:\n$plan")
    assert(df.count() > 0)
  }

  test("intervalOverlapJoin: touching endpoints overlap, adjacent bands don't leak") {
    val a = Seq((1L, 0L, 10L), (2L, 25L, 30L)).toDF("id_a", "lo_a", "hi_a")
    val b = Seq((10L, 10L, 20L), (20L, 31L, 40L)).toDF("id_b", "lo_b", "hi_b")
    val got = Joins.intervalOverlapJoin(a, "lo_a", "hi_a", b, "lo_b", "hi_b",
        bandWidth = 10L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // [0,10] meets [10,20] at the closed endpoint; [25,30] and [31,40] are disjoint
    assert(got === Set((1L, 10L)))
  }
}
