package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.FlajoletMartin

/** Aggregation operators beyond the fused q4112 pipeline.
  *
  * Spark's `HashAggregateExec` already implements the reference's
  * partial/final split (q4112_hj.c:119-121 + 256-263) and its
  * contention-avoiding thread-local cache (q4112.c:225-297) as map-side
  * partial aggregation. What we add:
  *
  *  - [[saltedAgg]]: explicit two-phase salted aggregation for the skew
  *    case partial aggregation can't fix — when ONE group is so hot that
  *    its final-aggregation task dominates the stage. Salting splits the
  *    hot group across `saltBuckets` reducers, then a second (cheap)
  *    aggregation merges the per-salt partials. This is the distributed
  *    analog of the reference's heavy-hitter configs (hh_groups /
  *    hh_probability, q4112.h:39-41).
  *  - [[topK]]: per-group or global top-k without a global sort —
  *    `TakeOrderedAndProject` (global) or window + filter (per group).
  *  - distinct counts: exact, HLL++ (`approx_count_distinct`), and the
  *    reference's FM/PCSA estimator ([[graft.functions.FlajoletMartin]]).
  */
object Aggregates {

  /** Two-phase salted SUM/COUNT groupBy: phase 1 groups on
    * (key, hash(row) % saltBuckets) — hot keys fan out across reducers —
    * phase 2 merges the ≤ saltBuckets partials per key. Result is
    * identical to a direct `groupBy(key).agg(sum, count)`.
    */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      value: Column,
      saltBuckets: Int = 32): DataFrame = {
    df.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(sum(value).as("ps"), count(lit(1)).as("pc"))
      .groupBy(col("k"))
      .agg(sum(col("ps")).as("sum_value"), sum(col("pc")).as("cnt"))
  }

  /** Global top-k by `ordering` — compiles to TakeOrderedAndProject:
    * each partition keeps a k-sized heap, driver merges k×partitions
    * rows. No global sort, no single-reducer bottleneck.
    */
  def topK(df: DataFrame, k: Int, ordering: Column*): DataFrame =
    df.orderBy(ordering: _*).limit(k)

  /** Per-group top-k via ranked window — shuffle on the group key only.
    * This is ALREADY two-phase physically: Catalyst's
    * InsertWindowGroupLimit plants a `WindowGroupLimit(Partial)` before
    * the exchange (each map task keeps ≤ k rows per group — the
    * partial/final split the reference hand-writes for aggregation,
    * q4112_hj.c:119-121 + 256-263) and a `Final` pass after it, so only
    * ≤ k·partitions rows per group ever shuffle. No hand-rolled salting
    * needed; the remaining scale lever is input parallelism (the partial
    * sort runs per input partition).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], k: Int,
      ordering: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols: _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Exact distinct count per group. */
  def distinctExact(df: DataFrame, group: Column, value: Column): DataFrame =
    df.groupBy(group).agg(countDistinct(value).as("n_distinct"))

  /** HLL++ estimate (Spark-native, the pragmatic default at scale). */
  def distinctHll(df: DataFrame, group: Column, value: Column,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(group).agg(approx_count_distinct(value, rsd).as("n_distinct_hll"))

  /** Reference-faithful FM/PCSA estimate (q4112.c:105-117, 336-377). */
  def distinctFm(df: DataFrame, value: Column): DataFrame =
    df.agg(FlajoletMartin.fmCountDistinct(value).as("n_distinct_fm"))
}
