package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's one query, generalized: inner equi-join (FK→PK) then
  * integer-average aggregation, ungrouped (part 1 — q4112_hj_1.c:10-77)
  * or grouped by a key with a final integer avg-of-avgs (part 2 —
  * q4112.c:470-577).
  *
  * All averages are 64-bit integer floor division (`sum DIV count`), NOT
  * Spark's float `avg()` — the reference mandates integer-only arithmetic
  * (4112_project_2.pdf p.3; divisions at q4112.c:326, :576).
  *
  * Physical mapping (scale rationale):
  *  - The build side is broadcast when small (the reference hard-codes
  *    items as build side — q4112.h:45-50); callers pick the strategy via
  *    [[JoinStrategy]], which maps 1:1 onto the reference's four engines.
  *  - The grouped aggregate relies on Spark's partial aggregation
  *    (map-side combine) — the same design as the reference's
  *    thread-local pre-aggregation cache (q4112.c:225-297): hot groups
  *    collapse before the shuffle, so heavy-hitter skew (hh configs)
  *    costs one combiner entry per partition, not a hot reducer.
  *  - The final avg-of-avgs is a single ungrouped aggregate over one row
  *    per group — negligible at any scale.
  */
object Q4112 {

  /** The reference's four interchangeable physical engines (Makefile:7)
    * surfaced as join strategy hints. Catalyst + AQE pick the best
    * strategy on `Auto`; the explicit variants exist for parity and
    * benchmarking, exactly like the reference's one-binary-per-algorithm
    * layout.
    */
  sealed trait JoinStrategy { def hint: Option[String] }
  case object Auto extends JoinStrategy { val hint = None }
  case object BroadcastHash extends JoinStrategy { val hint = Some("broadcast") }
  case object ShuffledHash extends JoinStrategy { val hint = Some("shuffle_hash") }
  case object SortMerge extends JoinStrategy { val hint = Some("merge") }

  /** Integer division `sumCol div cntCol` (both Long; non-negative in all
    * reference configs, so truncating and floor division coincide).
    */
  def intDiv(sumCol: Column, cntCol: Column): Column =
    call_function("div", sumCol, cntCol)

  /** items ⋈ orders with the chosen physical strategy.
    * @param items  (key, price)  — build side
    * @param orders (fkey, group, quantity) — probe side
    */
  def join(
      items: DataFrame,
      orders: DataFrame,
      itemKey: String,
      orderKey: String,
      strategy: JoinStrategy = BroadcastHash): DataFrame = {
    val hinted = strategy.hint.fold(items)(h => items.hint(h))
    orders.join(hinted, orders(orderKey) === hinted(itemKey), "inner")
  }

  /** Build the broadcast value array for the dense-key probe path.
    * Requires the build side's keys to form a contiguous integer domain
    * (verified; throws otherwise) — the shape of every dimension table
    * with a surrogate key, and of the reference's items.id (q4112.h:14).
    */
  def denseValuesArray(
      items: DataFrame,
      itemKey: String,
      valueCol: String): (org.apache.spark.broadcast.Broadcast[Array[Long]], Long) = {
    val s = items.agg(min(col(itemKey)), max(col(itemKey)), count(lit(1))).head()
    val (mn, mx, n) = (s.getLong(0), s.getLong(1), s.getLong(2))
    require(mx - mn + 1L == n,
      s"dense-key path requires a contiguous domain: [$mn,$mx] holds $n keys")
    require(n <= Int.MaxValue, s"domain too large for one array: $n")
    // pack (key, value) into primitive arrays per partition in parallel,
    // so the driver receives ~16 bytes/row with no per-row boxing
    val chunks = items.select(col(itemKey), col(valueCol)).rdd.mapPartitions { it =>
      val ks = new scala.collection.mutable.ArrayBuilder.ofLong
      val vs = new scala.collection.mutable.ArrayBuilder.ofLong
      it.foreach { r => ks += r.getLong(0); vs += r.getLong(1) }
      Iterator.single((ks.result(), vs.result()))
    }.collect()
    val arr = new Array[Long](n.toInt)
    chunks.foreach { case (ks, vs) =>
      var i = 0
      while (i < ks.length) { arr((ks(i) - mn).toInt) = vs(i); i += 1 }
    }
    (items.sparkSession.sparkContext.broadcast(arr), mn)
  }

  /** Part 1 via the dense-key array probe ([[graft.functions.DenseArrayLookup]]):
    * the "perfect hash join" plan a hand-tuner would write for a dense
    * dimension — no hash, no probe chain, the whole join is one codegen'd
    * bounds-check + array index per probe row.
    */
  def part1Dense(
      items: DataFrame,
      orders: DataFrame,
      itemKey: String,
      orderKey: String,
      priceCol: String,
      quantityCol: String): DataFrame = {
    val (bc, mn) = denseValuesArray(items, itemKey, priceCol)
    orders
      .select(graft.functions.DenseLookup(bc, mn)(col(orderKey)).as("price"),
        col(quantityCol).as("q"))
      .where(col("price").isNotNull) // inner-join drop semantics
      .agg(sum(col("price") * col("q")).as("s"), count(lit(1)).as("c"))
      .select(expr("s div c").as("avg_value"))
  }

  /** Part 2 via the dense-key array probe: lookup + filter + two-level
    * integer aggregation, no join operator in the plan at all.
    */
  def part2Dense(
      items: DataFrame,
      orders: DataFrame,
      itemKey: String,
      orderKey: String,
      priceCol: String,
      quantityCol: String,
      groupCol: String): DataFrame = {
    val (bc, mn) = denseValuesArray(items, itemKey, priceCol)
    orders
      .select(graft.functions.DenseLookup(bc, mn)(col(orderKey)).as("price"),
        col(quantityCol).as("q"), col(groupCol))
      .where(col("price").isNotNull)
      .groupBy(col(groupCol))
      .agg(sum(col("price") * col("q")).as("s"), count(lit(1)).as("c"))
      .select(expr("s div c").as("avg_value"))
      .agg(sum(col("avg_value")).as("ss"), count(lit(1)).as("cc"))
      .select(expr("ss div cc").as("avg_avg_value"))
  }

  /** Part 1: SELECT avg(price * quantity) — single integer average
    * (q4112_hj_1.c:49-77). Output column: `avg_value` (Long).
    */
  def part1(
      items: DataFrame,
      orders: DataFrame,
      itemKey: String,
      orderKey: String,
      priceCol: String,
      quantityCol: String,
      strategy: JoinStrategy = BroadcastHash): DataFrame =
    join(items, orders, itemKey, orderKey, strategy)
      .agg(
        sum(col(priceCol) * col(quantityCol)).as("s"),
        count(lit(1)).as("c"))
      .select(expr("s div c").as("avg_value"))

  /** Part 2 intermediate: per-group integer average
    * (q4112.c:210-331, A2+A4 first level). Output: (group, avg_value).
    */
  def grouped(
      items: DataFrame,
      orders: DataFrame,
      itemKey: String,
      orderKey: String,
      priceCol: String,
      quantityCol: String,
      groupCol: String,
      strategy: JoinStrategy = BroadcastHash): DataFrame =
    join(items, orders, itemKey, orderKey, strategy)
      .groupBy(col(groupCol))
      .agg(
        sum(col(priceCol) * col(quantityCol)).as("s"),
        count(lit(1)).as("c"))
      .select(col(groupCol), expr("s div c").as("avg_value"))

  /** Part 2 full: avg over groups of the per-group average, both levels
    * integer floor division (q4112.c:553-576). Output column:
    * `avg_avg_value` (Long).
    */
  def part2(
      items: DataFrame,
      orders: DataFrame,
      itemKey: String,
      orderKey: String,
      priceCol: String,
      quantityCol: String,
      groupCol: String,
      strategy: JoinStrategy = BroadcastHash): DataFrame =
    grouped(items, orders, itemKey, orderKey, priceCol, quantityCol, groupCol, strategy)
      .agg(sum(col("avg_value")).as("ss"), count(lit(1)).as("cc"))
      .select(expr("ss div cc").as("avg_avg_value"))
}
