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
    val t0 = System.nanoTime()
    val s = items.agg(min(col(itemKey)), max(col(itemKey)), count(lit(1))).head()
    val (mn, mx, n) = (s.getLong(0), s.getLong(1), s.getLong(2))
    require(mx - mn + 1L == n,
      s"dense-key path requires a contiguous domain: [$mn,$mx] holds $n keys")
    require(n <= Int.MaxValue, s"domain too large for one array: $n")
    // pack each partition into primitive arrays; when the partition's keys
    // are already an ascending contiguous run — true for every
    // range-partitioned surrogate-key dim, e.g. spark.range output or a
    // key-sorted parquet file — ship ONLY the values (8 B/key, keys
    // reconstructed from the run start) and fill with one arraycopy.
    // Non-contiguous partitions fall back to (keys, values) pairs. Either
    // way the driver-side assembly is the same data path Spark's own
    // BroadcastExchangeExec uses (executeCollect → build relation), at
    // half the bytes on the fast path.
    val chunks = items.select(col(itemKey), col(valueCol)).rdd.mapPartitions { it =>
      val ks = new scala.collection.mutable.ArrayBuilder.ofLong
      val vs = new scala.collection.mutable.ArrayBuilder.ofLong
      var first = Long.MinValue
      var prev = Long.MinValue
      var contiguous = true
      it.foreach { r =>
        val k = r.getLong(0)
        if (first == Long.MinValue) first = k
        else if (contiguous && k != prev + 1L) contiguous = false
        prev = k
        if (!contiguous) ks += k
        vs += r.getLong(1)
      }
      val varr = vs.result()
      if (first == Long.MinValue) Iterator.empty
      else if (contiguous) Iterator.single((first, null: Array[Long], varr))
      else {
        // keys recorded only after the break — rebuild the full key array
        val tail = ks.result()
        val all = new Array[Long](varr.length)
        val nContig = varr.length - tail.length
        var i = 0
        while (i < nContig) { all(i) = first + i; i += 1 }
        System.arraycopy(tail, 0, all, nContig, tail.length)
        Iterator.single((first, all, varr))
      }
    }.collect()
    val arr = new Array[Long](n.toInt)
    chunks.foreach { case (first, ks, vs) =>
      if (ks == null) System.arraycopy(vs, 0, arr, (first - mn).toInt, vs.length)
      else {
        var i = 0
        while (i < ks.length) { arr((ks(i) - mn).toInt) = vs(i); i += 1 }
      }
    }
    val bc = items.sparkSession.sparkContext.broadcast(arr)
    System.err.println(f"[dense-build] n=$n build=${(System.nanoTime() - t0) / 1e9}%.3f s")
    (bc, mn)
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

  /** The joined (group, v = price*quantity) projection, via the dense
    * array probe when the build side is a contiguous-key dimension, else
    * a broadcast hash join — the common front half of every part-2 plan.
    */
  private def groupedValues(
      items: DataFrame,
      orders: DataFrame,
      itemKey: String,
      orderKey: String,
      priceCol: String,
      quantityCol: String,
      groupCol: String,
      dense: Boolean): DataFrame =
    if (dense) {
      val (bc, mn) = denseValuesArray(items, itemKey, priceCol)
      orders
        .select(graft.functions.DenseLookup(bc, mn)(col(orderKey)).as("price"),
          col(quantityCol).as("q"), col(groupCol))
        .where(col("price").isNotNull)
        .select(col(groupCol), (col("price") * col("q")).as("v"))
    } else
      join(items, orders, itemKey, orderKey, BroadcastHash)
        .select(col(groupCol), (col(priceCol) * col(quantityCol)).as("v"))

  /** Part 2 with map-side partial aggregation BYPASSED: pre-partition the
    * slim (group, v) rows on the group key, so the one exchange ships raw
    * 16-byte rows and aggregation happens post-shuffle over complete
    * groups, with a bounded (≈ groups / numPartitions)-entry map per
    * reducer.
    *
    * This is the right plan when groups ≈ rows (singleton-heavy): partial
    * aggregation collapses nothing for singleton groups yet still builds a
    * per-task hash map of every distinct group the task sees — tens of
    * millions of entries that overflow the aggregation memory, spill, and
    * sort-merge, all for zero exchange savings. The reference faces the
    * identical decision and resolves it with the same information: its FM
    * sketch (q4112.c:336-377) estimates the group count up front, sizes
    * the global table from it, and its thread-local pre-aggregation only
    * pays off when groups are few enough to cache (README-2.txt:32-43).
    * [[part2Adaptive]] reuses our A5 operator (FlajoletMartin) to make
    * exactly that call.
    */
  def part2Bypass(
      items: DataFrame,
      orders: DataFrame,
      itemKey: String,
      orderKey: String,
      priceCol: String,
      quantityCol: String,
      groupCol: String,
      numPartitions: Int,
      dense: Boolean = false): DataFrame =
    groupedValues(items, orders, itemKey, orderKey, priceCol, quantityCol, groupCol, dense)
      .repartition(numPartitions, col(groupCol))
      .groupBy(col(groupCol))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .select(expr("s div c").as("avg_value"))
      .agg(sum(col("avg_value")).as("ss"), count(lit(1)).as("cc"))
      .select(expr("ss div cc").as("avg_avg_value"))

  /** [[part2Bypass]] with the exchange rows PACKED into one long:
    * group ⋅ 2^34 + v (valid while group < 2^29 and v < 2^34 — checked
    * against the reference value caps: v = price·quantity ≤ 99999², and
    * the matrix tops out at 1e8 groups). Cuts the dominant cost of the
    * singleton-group shape — the raw-row exchange through disk — from
    * 24 B to 16 B per UnsafeRow. The groupBy keys on the unpack
    * expression, which canonicalizes equal to the repartition
    * expression, so the plan keeps exactly ONE exchange
    * (PackedBypassSpec pins this).
    */
  def part2BypassPacked(
      items: DataFrame,
      orders: DataFrame,
      itemKey: String,
      orderKey: String,
      priceCol: String,
      quantityCol: String,
      groupCol: String,
      numPartitions: Int,
      dense: Boolean = false): DataFrame = {
    val packed = groupedValues(items, orders, itemKey, orderKey, priceCol, quantityCol,
      groupCol, dense)
      .select((shiftleft(col(groupCol), 34) + col("v")).as("p"))
    val g = shiftright(col("p"), 34)
    packed
      .repartition(numPartitions, g)
      .groupBy(g.as("g"))
      .agg(sum(col("p").bitwiseAND(lit((1L << 34) - 1))).as("s"), count(lit(1)).as("c"))
      .select(expr("s div c").as("avg_value"))
      .agg(sum(col("avg_value")).as("ss"), count(lit(1)).as("cc"))
      .select(expr("ss div cc").as("avg_avg_value"))
  }

  /** Reducer count for the bypass plan: ~500k groups per reducer map
    * (a few tens of MB — L3-resident), floored at the session shuffle
    * parallelism, capped to keep task-launch overhead sane.
    */
  def bypassPartitions(estGroups: Long, sessionShuffle: Int): Int =
    math.min(4096L, math.max(sessionShuffle.toLong, estGroups / 500000L)).toInt

  /** Part 2 with the physical aggregation plan chosen from a MEASURED
    * statistic — the same decision the reference drives with its A5
    * sketch (estimate the group profile, then shape the aggregation,
    * q4112.c:336-377; thread-local pre-agg only pays when groups cache,
    * README-2.txt:32-43). The statistic here is SHARED-KEY MASS from a
    * ~2M-row deterministic sample: the fraction of rows whose group key
    * recurs within the sample. An ndv estimate alone cannot tell an
    * all-singleton table (partial agg collapses nothing, spills, and the
    * exchange ships ~every row anyway) from a skewed one with the same
    * ndv (heavy groups collapse map-side to one combiner entry per
    * task) — measured at 1e9 rows, the bypass wins the first shape
    * (96 s vs 307 s/OOM) and loses the second (69 s vs 32 s), and
    * shared mass separates them where ndv cannot. Low shared mass means
    * partial aggregation cannot collapse most of the input → skip
    * straight to the (packed) raw exchange; anything else keeps
    * Catalyst's partial/final split.
    */
  def part2Adaptive(
      items: DataFrame,
      orders: DataFrame,
      itemKey: String,
      orderKey: String,
      priceCol: String,
      quantityCol: String,
      groupCol: String,
      dense: Boolean = false,
      bypassRatio: Long = 16L): DataFrame = {
    val t0 = System.nanoTime()
    // one ~2M-row deterministic sample carries the whole decision AND the
    // reducer sizing: shared mass (collapse profile), sample ndv
    // (extrapolates to an upper-ish group-count bound — singleton-biased,
    // which for sizing errs toward MORE, smaller reducer maps), and total
    // rows. A full-scan FM estimate was measured at 3.5-16 s per run at
    // 1e9 rows (TypedImperativeAggregate, outside codegen) — more than
    // many queries it was steering; the sample costs ~1 s and decides
    // identically on every measured shape. FM remains the standalone A5
    // surface (distinct_fm, Aggregates.distinctFm).
    val rows = orders.count()
    val frac = math.min(1.0, 2e6 / math.max(1.0, rows.toDouble))
    val s = orders.sample(withReplacement = false, frac, seed = 42)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt")).as("tot"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("shared"),
        count(lit(1)).as("sndv")).head()
    val tot = if (s.isNullAt(0)) 0L else s.getLong(0)
    val shared = if (s.isNullAt(1)) 0L else s.getLong(1)
    val sampleNdv = s.getLong(2)
    val sharedMass = if (tot == 0L) 1.0 else shared.toDouble / tot
    // sharedMass < 0.4 already implies partial aggregation would leave
    // ≥60% of the rows uncollapsed — it subsumes the ndv-ratio test
    // (bypassRatio is kept in the signature for source compatibility)
    val _ = bypassRatio
    val bypass = tot > 0L && sharedMass < 0.4
    // packing bound, measured only when it matters: group·2^34 + v must
    // fit a signed long, v exact
    val packable = bypass && {
      val mx = orders.agg(max(col(groupCol)), max(col(quantityCol))).head()
      val (maxGroup, maxQty) = (mx.getLong(0), mx.getLong(1))
      val maxPrice = items.agg(max(col(priceCol))).head().getLong(0)
      maxGroup > 0 && maxGroup < (1L << 29) && maxQty >= 0 && maxPrice >= 0 &&
        maxQty <= ((1L << 34) - 1) / math.max(1L, maxPrice) // overflow-safe v bound
    }
    System.err.println(f"[part2-adaptive] rows=$rows sampleNdv=$sampleNdv " +
      f"sharedMass=$sharedMass%.3f bypass=$bypass packable=$packable " +
      f"est=${(System.nanoTime() - t0) / 1e9}%.3f s")
    if (bypass) {
      val shuffle = items.sparkSession.sessionState.conf.numShufflePartitions
      val estGroups = (sampleNdv / math.max(1e-12, frac)).toLong
      val parts = bypassPartitions(estGroups, shuffle)
      if (packable)
        part2BypassPacked(items, orders, itemKey, orderKey, priceCol, quantityCol,
          groupCol, parts, dense)
      else
        part2Bypass(items, orders, itemKey, orderKey, priceCol, quantityCol,
          groupCol, parts, dense)
    } else if (dense)
      part2Dense(items, orders, itemKey, orderKey, priceCol, quantityCol, groupCol)
    else
      part2(items, orders, itemKey, orderKey, priceCol, quantityCol, groupCol, BroadcastHash)
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
