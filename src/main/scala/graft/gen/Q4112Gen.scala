package graft.gen

import graft.model.{GenConfig, Item, Order}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed, seeded, deterministic port of the reference generator's
  * *contract* (q4112.h:19-41; the reference's q4112_gen.o is a closed
  * binary — README.md:26-28 — so we reproduce the parameter semantics,
  * not the byte stream).
  *
  * Built on `spark.range` + codegen'd `xxhash64` column expressions: every
  * row's values are pure functions of (seed, row id), so generation is
  * embarrassingly parallel, splittable, and identical at any partition
  * count — the property that lets the same generator run on 1e6 rows
  * locally and 1e9+ rows on a cluster.
  *
  * Contract reproduced:
  *  - items.id unique, never 0 (ids are 1..innerTuples)      q4112.h:14
  *  - price ∈ [0, innerValMax]                               q4112.h:16-18
  *  - a `outerSelectivity` fraction of orders rows carry an item_id that
  *    exists in items; the rest reference keys outside the id range
  *    (so they never match)                                  q4112.h:32-35
  *  - matching FKs draw uniformly from the first
  *    ceil(innerTuples * innerSelectivity) item ids, so an
  *    `innerSelectivity` fraction of items is reachable      q4112.h:19-23
  *  - store_id ∈ [1, groups], never 0; every group appears at least once
  *    (first `groups` rows are a permutation-free 1..groups run), then
  *    `hhProbability` of remaining rows land on the first `hhGroups`
  *    heavy-hitter ids                                       q4112.h:36-41
  *  - quantity ∈ [0, outerValMax]                            q4112.h:28-29
  */
object Q4112Gen {

  /** Scale of the fixed-point uniform draw used for selectivity /
    * heavy-hitter branching.
    */
  private val UnitScale = 1L << 30

  def items(spark: SparkSession, cfg: GenConfig): Dataset[Item] = {
    import spark.implicits._
    spark
      .range(1L, cfg.innerTuples + 1L)
      .select(
        $"id",
        pmod(xxhash64(lit(cfg.seed), $"id"), lit(cfg.innerValMax + 1L)).as("price"))
      .as[Item]
  }

  def orders(spark: SparkSession, cfg: GenConfig): Dataset[Order] = {
    import spark.implicits._
    val matchedInner = math.max(1L, math.ceil(cfg.innerTuples * cfg.innerSelectivity).toLong)
    val matchCut = (cfg.outerSelectivity * UnitScale).toLong
    val hhCut = (cfg.hhProbability * UnitScale).toLong

    val row = spark.range(0L, cfg.outerTuples)
    val matches = pmod(xxhash64(lit(cfg.seed + 1), $"id"), lit(UnitScale)) < lit(matchCut)
    val itemId = when(matches, pmod(xxhash64(lit(cfg.seed + 2), $"id"), lit(matchedInner)) + 1L)
      // non-matching keys live strictly above the items id range → never join
      .otherwise(pmod(xxhash64(lit(cfg.seed + 2), $"id"), lit(1L << 40)) + cfg.innerTuples + 1L)

    val storeId =
      if (cfg.groups == 0L) lit(0L)
      else {
        val uniform = pmod(xxhash64(lit(cfg.seed + 4), $"id"), lit(cfg.groups)) + 1L
        val heavy =
          if (cfg.hhGroups > 0L)
            when(pmod(xxhash64(lit(cfg.seed + 3), $"id"), lit(UnitScale)) < lit(hhCut),
              pmod(xxhash64(lit(cfg.seed + 5), $"id"), lit(cfg.hhGroups)) + 1L)
              .otherwise(uniform)
          else uniform
        // first `groups` rows enumerate every group once (q4112.h:38-39)
        when($"id" < cfg.groups, $"id" + 1L).otherwise(heavy)
      }

    row
      .select(
        itemId.as("itemId"),
        storeId.as("storeId"),
        pmod(xxhash64(lit(cfg.seed + 6), $"id"), lit(cfg.outerValMax + 1L)).as("quantity"))
      .as[Order]
  }

  /** Independent collections-based oracle for the full q4112 query
    * (avg over groups of avg(price*quantity) — q4112.c semantics, integer
    * floor division at both levels, q4112.c:326 and :576). Used by tests
    * at small scale; replicates `assert(gen_res == run_res)` at
    * q4112_main.c:127. Returns None when no group has any matching row.
    */
  def oracleFull(items: Seq[Item], orders: Seq[Order]): Option[Long] = {
    val price = items.map(i => i.id -> i.price).toMap
    val perGroup = collection.mutable.Map.empty[Long, (Long, Long)] // store -> (sum, count)
    orders.foreach { o =>
      price.get(o.itemId).foreach { p =>
        val (s, c) = perGroup.getOrElse(o.storeId, (0L, 0L))
        perGroup(o.storeId) = (s + p * o.quantity, c + 1L)
      }
    }
    if (perGroup.isEmpty) None
    else {
      val avgs = perGroup.values.map { case (s, c) => s / c }
      Some(avgs.sum / avgs.size)
    }
  }

  /** Oracle for the part-1 query (single ungrouped integer AVG —
    * q4112_hj_1.c:76).
    */
  def oraclePart1(items: Seq[Item], orders: Seq[Order]): Option[Long] = {
    val price = items.map(i => i.id -> i.price).toMap
    var sum = 0L
    var count = 0L
    orders.foreach { o =>
      price.get(o.itemId).foreach { p => sum += p * o.quantity; count += 1L }
    }
    if (count == 0L) None else Some(sum / count)
  }

  /** Distributed oracles for scales where a driver-side collect is no
    * longer reasonable: same integer arithmetic as the collections
    * oracles, computed through the RDD API — a different join and
    * aggregation machinery than the Catalyst/codegen plan under test, so
    * the cross-check stays independent while both sides scale.
    *
    * The items side is NOT joined: `items.id` is contiguous 1..inner and
    * `price` is a pure function of (seed, id), so the oracle resolves
    * prices with the generator's own closed form (`priceOf`) — the same
    * move as the reference, whose generator returns the expected answer
    * it computed while emitting the data (q4112.h:41, q4112_main.c:127).
    * An RDD shuffle join of the 1e9-row probe side against a 100-row
    * build side was the 1e9-scale bottleneck; what stays under
    * independent re-test is the engine's join+agg machinery vs a plain
    * scan-fold / reduceByKey.
    */
  private[graft] def priceOf(cfg: GenConfig, id: Long): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val h = XXH64.hashLong(id, XXH64.hashLong(cfg.seed, 42L))
    val m = cfg.innerValMax + 1L
    ((h % m) + m) % m // pmod, matching the generator's column expression
  }

  def oraclePart1Rdd(orders: Dataset[Order], cfg: GenConfig): Option[Long] = {
    val inner = cfg.innerTuples
    val sc = orders.rdd
      .mapPartitions { it =>
        var sum = 0L; var count = 0L
        it.foreach { o =>
          if (o.itemId <= inner) { // non-matching FKs are > innerTuples
            sum += priceOf(cfg, o.itemId) * o.quantity; count += 1L
          }
        }
        Iterator.single((sum, count))
      }
      .fold((0L, 0L))((a, b) => (a._1 + b._1, a._2 + b._2))
    if (sc._2 == 0L) None else Some(sc._1 / sc._2)
  }

  /** Giant-group oracle for LOCAL mode: the reference's own algorithm —
    * a shared-memory CAS aggregation table (q4112.c:169-201) — run
    * across the one JVM's task threads. One scan of the cached probe
    * rows, no shuffle, no per-task maps: at 1e8 groups the RDD
    * `reduceByKey` oracle OOMs exactly like any partial-aggregation
    * plan (each task's combine map holds ~groups/π distinct entries),
    * while two AtomicLongArrays cost a flat 16 B/group. Only valid on
    * `local[*]` (task closures share the driver's statics) — which is
    * where the 1e9-row matrix runs; it is still engine-independent:
    * no Catalyst plan, prices resolved by the generator closed form.
    */
  def oracleFullCas(orders: Dataset[Order], cfg: GenConfig): Option[Long] = {
    require(cfg.groups > 0 && cfg.groups < Int.MaxValue.toLong, s"CAS oracle needs int-indexable groups")
    require(orders.sparkSession.sparkContext.isLocal, "CAS oracle is local-mode-only")
    val inner = cfg.innerTuples
    val n = cfg.groups.toInt + 1
    // task closures are serialized per task even on local[*], so a
    // captured array would be copied, not shared — the tasks reach the
    // one shared table through the static object field instead
    CasTable.synchronized {
      CasTable.sums = new java.util.concurrent.atomic.AtomicLongArray(n)
      CasTable.counts = new java.util.concurrent.atomic.AtomicLongArray(n)
      val cfgB = cfg
      orders.foreachPartition { (it: Iterator[Order]) =>
        val s = CasTable.sums
        val c = CasTable.counts
        val nLocal = s.length()
        if (nLocal <= (1 << 22)) {
          // small tables: 32 threads CAS-ing into few slots is a
          // cache-line contention storm (the reference's reason for
          // thread-local pre-agg, README-2.txt:32-43) — accumulate
          // per-partition arrays, merge once
          val ls = new Array[Long](nLocal)
          val lc = new Array[Long](nLocal)
          it.foreach { o =>
            if (o.itemId <= inner) {
              val g = o.storeId.toInt
              ls(g) += priceOf(cfgB, o.itemId) * o.quantity
              lc(g) += 1L
            }
          }
          var g = 0
          while (g < nLocal) {
            if (lc(g) > 0L) { s.addAndGet(g, ls(g)); c.addAndGet(g, lc(g)) }
            g += 1
          }
        } else {
          it.foreach { o =>
            if (o.itemId <= inner) {
              val g = o.storeId.toInt
              s.addAndGet(g, priceOf(cfgB, o.itemId) * o.quantity)
              c.incrementAndGet(g)
            }
          }
        }
      }
      var sumAvg = 0L
      var nGroups = 0L
      var g = 0
      while (g < n) {
        val c = CasTable.counts.get(g)
        if (c > 0L) { sumAvg += CasTable.sums.get(g) / c; nGroups += 1L }
        g += 1
      }
      CasTable.sums = null
      CasTable.counts = null
      if (nGroups == 0L) None else Some(sumAvg / nGroups)
    }
  }

  /** Shared-JVM aggregation table for [[oracleFullCas]] (local mode). */
  private[graft] object CasTable {
    @volatile var sums: java.util.concurrent.atomic.AtomicLongArray = _
    @volatile var counts: java.util.concurrent.atomic.AtomicLongArray = _
  }

  def oracleFullRdd(orders: Dataset[Order], cfg: GenConfig): Option[Long] = {
    val inner = cfg.innerTuples
    val perGroup = orders.rdd
      .flatMap { o =>
        if (o.itemId <= inner)
          Some((o.storeId, (priceOf(cfg, o.itemId) * o.quantity, 1L)))
        else None
      }
      .reduceByKey((a, b) => (a._1 + b._1, a._2 + b._2)) // map-side combine
      .map { case (_, (s, c)) => (s / c, 1L) }
      .fold((0L, 0L))((a, b) => (a._1 + b._1, a._2 + b._2))
    if (perGroup._2 == 0L) None else Some(perGroup._1 / perGroup._2)
  }
}
