package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generalized join surface.
  *
  * The reference implements two physical engines for one logical join —
  * nested-loop (q4112_nlj.c) and hash (q4112_hj.c) over `items.id =
  * orders.item_id`. On Spark the logical surface widens to every join
  * type Catalyst supports; the physical choice (broadcast-hash /
  * shuffled-hash / sort-merge / broadcast-nested-loop) is Catalyst's,
  * steered by hints — the Spark analog of the reference's
  * one-binary-per-algorithm build (Makefile:7).
  *
  * Scale notes baked into the helpers:
  *  - `broadcastRight` pins the dimension side into every executor —
  *    O(|small|) memory, zero shuffle of the fact side; the 100 TB
  *    default whenever the dim fits in memory (same reasoning as the
  *    reference fixing items as build side, q4112.h:45-50).
  *  - `shuffledHash`/`sortMerge` shuffle both sides on the key — the
  *    fallbacks when both sides are large; AQE converts between them and
  *    splits skewed partitions at runtime.
  *  - `nonEqui` is a broadcast nested-loop — O(n·m) work; only valid
  *    when one side is small, which the API makes explicit by taking the
  *    small side second.
  */
object Joins {

  def broadcastRight(left: DataFrame, right: DataFrame, cond: Column,
      joinType: String = "inner"): DataFrame =
    left.join(broadcast(right), cond, joinType)

  def shuffledHash(left: DataFrame, right: DataFrame, cond: Column,
      joinType: String = "inner"): DataFrame =
    left.join(right.hint("shuffle_hash"), cond, joinType)

  def sortMerge(left: DataFrame, right: DataFrame, cond: Column,
      joinType: String = "inner"): DataFrame =
    left.join(right.hint("merge"), cond, joinType)

  /** EXISTS — rows of `left` with at least one match; no right columns
    * materialized, so the probe side streams (no output amplification).
    * Strategy is left to Catalyst: a small right side broadcasts under
    * the threshold, a large one gets a shuffled semi join — forcing
    * `broadcast(right)` here would OOM on a large right side.
    */
  def semi(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  /** NOT EXISTS. Same strategy note as [[semi]]. */
  def anti(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

  /** Non-equi join (theta); `small` is broadcast, giving
    * BroadcastNestedLoopJoin — the J1/J2 nested-loop engines of the
    * reference (q4112_nlj_1.c:5-28) generalized to arbitrary predicates.
    */
  def nonEqui(large: DataFrame, small: DataFrame, cond: Column,
      joinType: String = "inner"): DataFrame =
    large.join(broadcast(small), cond, joinType)

  /** Range join: `left.key ∈ [right.lo, right.hi)`. With a broadcast
    * small side this is a BNLJ; at scale, bucketize the range into a
    * band-join (equi-join on overlapping buckets then residual filter) —
    * provided here as the scalable path.
    */
  def rangeJoin(left: DataFrame, leftKey: Column, right: DataFrame,
      lo: Column, hi: Column): DataFrame =
    left.join(broadcast(right), leftKey >= lo && leftKey < hi, "inner")

  /** As-of join: for each left row, the single nearest right row at or
    * before (`direction = "backward"`, default) or at or after
    * (`"forward"`) the left time, within the same key (LEFT-join
    * semantics — unmatched left rows keep NULL right columns). An
    * optional `tolerance` (same units as the time columns) voids matches
    * further than that from the left time.
    *
    * Implementation is the scalable sort-based form, NOT a range join:
    * tag both sides, union, and carry the nearest right payload
    * along the time order with a `last(_, ignoreNulls)` running window —
    * one shuffle on the key, no |left|×|right| candidate blow-up, works
    * at any time density. Right rows sort before left rows at equal
    * timestamps, so the match is inclusive; ties among right rows at the
    * same timestamp break deterministically to the lexicographically
    * greatest `rightCols` payload. Right payload columns must be
    * non-null to count as a match, and output names must not clash with
    * left's.
    */
  def asof(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String],
      leftTime: String, rightTime: String,
      leftCols: Seq[String], rightCols: Seq[String],
      direction: String = "backward",
      tolerance: Long = -1L): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    import org.apache.spark.sql.expressions.Window
    val backward = direction == "backward"
    val ls = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(0).as("__side")) ++
        leftCols.map(c => col(c).as(s"__l_$c")): _*)
    val rs = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(1).as("__side"),
          col(rightTime).as("__rt")) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)
    val u = ls.unionByName(rs, allowMissingColumns = true)
    val tOrd = if (backward) col("__t").asc else col("__t").desc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tOrd +: col("__side").desc +:
        rightCols.map(c => col(s"__r_$c").asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = ("__rt" +: rightCols.map(c => s"__r_$c")).foldLeft(u) { (df, c) =>
      df.withColumn(s"__m_$c", last(col(c), ignoreNulls = true).over(w))
    }
    val withinTol =
      if (tolerance < 0L) lit(true)
      else if (backward) col("__t") - col("__m___rt") <= tolerance
      else col("__m___rt") - col("__t") <= tolerance
    filled.filter(col("__side") === 0)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        rightCols.map(c =>
          when(withinTol, col(s"__m___r_$c")).otherwise(lit(null)).as(c)): _*)
  }

  /** Salted equi-join for a skew-dominated fact side. AQE's skew-join
    * split is the first answer; this is the explicit form for when the
    * skew is stable and known (the reference's heavy-hitter configs,
    * q4112.h:39-41): the fact side gets a per-row salt in [0, buckets),
    * the dim side is replicated once per salt value, and the join key
    * becomes (key, salt) — a hot key's rows spread over `buckets`
    * reducers instead of one. Dim-side cost: |dim|·buckets rows, so use
    * it with genuinely small dims. Result identical to the plain join.
    */
  def saltedSkewJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: Column, dimKey: Column,
      saltBuckets: Int = 16): DataFrame = {
    val sf = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    val sd = dim.withColumn("__dsalt",
      explode(array((0 until saltBuckets).map(lit(_)): _*)))
    sf.join(sd, factKey === dimKey && col("__salt") === col("__dsalt"), "inner")
      .drop("__salt", "__dsalt")
  }

  /** Bloom-prefiltered equi-join: build a bloom filter over the dim-side
    * keys, drop fact rows that cannot match BEFORE the join, then run
    * the exact join (which also removes the bloom's false positives —
    * the result is identical to the plain join).
    *
    * This is Catalyst's own runtime-filter pattern
    * (`InjectRuntimeFilter` wraps keys in xxhash64 and plants a
    * BloomFilterAggregate/BloomFilterMightContain pair) exposed as an
    * explicit operator for when the filter should cross a stage Catalyst
    * can't see through — e.g. pruning a 100 TB fact scan down to the
    * ~selectivity of a filtered dim before a shuffle join. The bloom is
    * O(bits) driver-side (like a broadcast variable), never O(|dim|).
    */
  def bloomPrefilteredJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: Column, dimKey: Column,
      expectedDimRows: Long,
      joinType: String = "inner"): DataFrame = {
    // the prefilter drops fact rows that cannot match, so it is only
    // sound for join types whose output drops unmatched fact rows
    // anyway; a left_outer/left_anti/full join must KEEP those rows
    // and would silently lose them here
    require(Set("inner", "leftsemi", "rightouter", "cross")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"bloom prefilter is unsound for join type '$joinType': it drops " +
        "unmatched fact rows before the join; use the plain join for " +
        "left_outer/left_anti/full semantics")
    val prefiltered = keyBloom(dim, dimKey, Some(expectedDimRows)) match {
      case Some(bf) => fact.filter(bloomMightContain(bf, factKey))
      case None => fact.limit(0) // empty dim: no fact row can match
    }
    prefiltered.join(dim, factKey === dimKey, joinType)
  }

  /** Bloom filter over `xxhash64(key)` of `df` — the build side of the
    * runtime-filter pattern, shared with Dedup's standing-index probe.
    * None when `df` is empty (the aggregate returns NULL), which callers
    * must treat as "nothing can match", not "everything might".
    */
  private[graft] def keyBloom(df: DataFrame, key: Column,
      expectedRows: Option[Long] = None): Option[Array[Byte]] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.bridge
    val child = bridge.toExpression(xxhash64(key))
    val agg = expectedRows match {
      case Some(n) => new BloomFilterAggregate(child, n)
      case None => new BloomFilterAggregate(child)
    }
    Option(df.agg(bridge.toColumn(agg.toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]](0))
  }

  /** Probe-side predicate for a [[keyBloom]] filter. */
  private[graft] def bloomMightContain(bloom: Array[Byte], key: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(BloomFilterMightContain(
      bridge.toExpression(lit(bloom)), bridge.toExpression(xxhash64(key))))
  }

  /** Band (bucketized) range join for two LARGE sides: both sides emit
    * one row per covered bucket of width `bucketWidth`, the join becomes
    * an equi-join on the bucket id (shuffle, not cross product), and the
    * residual predicate removes false candidates. This is the 100 TB
    * form of [[rangeJoin]].
    */
  def bandRangeJoin(
      left: DataFrame, leftKey: Column,
      right: DataFrame, lo: Column, hi: Column,
      bucketWidth: Long): DataFrame = {
    val lb = left.withColumn("__bucket", (leftKey / bucketWidth).cast("long"))
    val rb = right.withColumn("__buckets",
      sequence((lo / bucketWidth).cast("long"), ((hi - 1) / bucketWidth).cast("long")))
      .withColumn("__bucket", explode(col("__buckets")))
      .drop("__buckets")
    lb.join(rb, Seq("__bucket"), "inner")
      .filter(leftKey >= lo && leftKey < hi)
      .drop("__bucket")
  }

  /** Interval × interval OVERLAP join (closed intervals:
    * `aLo <= bHi && bLo <= aHi`) — the two-large-sides generalization
    * of [[bandRangeJoin]], where BOTH inputs are interval sets (session
    * co-presence, genomic region intersection, validity-period
    * reconciliation). Never a cross join: each interval explodes to the
    * fixed-width bands it touches, the sides meet in an equi-join on
    * the band id, and the overlap predicate runs as a residual filter.
    *
    * A pair overlapping k shared bands would surface k times; instead
    * of a `distinct` (a full extra shuffle of the output), each pair is
    * emitted EXACTLY once — in the band containing `greatest(aLo,
    * bLo)`, which both sides provably touch. `extraOn` pushes caller
    * predicates (e.g. `user_a < user_b`) into the join itself.
    *
    * 100 TB shape: the only exchange is the band-keyed shuffle; band
    * width trades replication (span/width copies per interval) against
    * per-band block size — set it near the median interval span.
    * Bounds must be non-negative (epoch-ms domain: `/` + cast
    * truncation == floor division).
    */
  def intervalOverlapJoin(
      a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String,
      bandWidth: Long,
      extraOn: Column = lit(true)): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    def bands(df: DataFrame, lo: String, hi: String, out: String) =
      df.withColumn(out, explode(sequence(
        (col(lo) / bandWidth).cast("long"),
        (col(hi) / bandWidth).cast("long"))))
    val ab = bands(a, aLo, aHi, "__band_a")
    val bb = bands(b, bLo, bHi, "__band_b")
    ab.join(bb,
        col("__band_a") === col("__band_b") &&
          col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
          col("__band_a") ===
            (greatest(col(aLo), col(bLo)) / bandWidth).cast("long") &&
          extraOn)
      .drop("__band_a", "__band_b")
  }

  /** Snapshot reconciliation: classify every key of two table versions
    * as added / removed / changed / unchanged and count each class —
    * the dataset-versioning diff (complementing [[mergeUpsert]] /
    * SCD-2, which APPLY changes; this one MEASURES them).
    *
    * 100 TB shape: both sides reduce to (key, md5(payload)) BEFORE the
    * full-outer join, so the shuffle carries 16-byte digests + keys,
    * never payload columns — diffing two wide snapshots moves the same
    * bytes as diffing two narrow ones. One co-partitioned exchange per
    * side, then a tiny 4-row aggregate.
    *
    * Precondition: `keyCol` is unique within each snapshot (the standard
    * snapshot-diff contract) — duplicate keys fan out in the full-outer
    * join and inflate the class counts.
    */
  def tableDiff(
      oldDf: DataFrame, newDf: DataFrame,
      keyCol: String, payloadCol: String): DataFrame = {
    // presence is a separate non-null flag: md5(NULL) is NULL, so keying
    // absence off hash nullity would misclassify a NULL payload as an
    // absent row. The hash covers an explicit is-null flag alongside the
    // value (NULL -> "true|", value v -> "false|v") so NO payload string
    // can collide with the NULL encoding - a string-sentinel coalesce
    // would classify a NULL -> that-sentinel-string change as unchanged.
    def side(df: DataFrame, h: String, in: String) =
      df.select(col(keyCol).as("k"),
        md5(concat(col(payloadCol).isNull.cast("string"), lit("|"),
          coalesce(col(payloadCol).cast("string"), lit("")))).as(h),
        lit(true).as(in))
    side(oldDf, "h_old", "in_old")
      .join(side(newDf, "h_new", "in_new"), Seq("k"), "full_outer")
      .select(when(col("in_old").isNull, "added")
        .when(col("in_new").isNull, "removed")
        .when(col("h_old") =!= col("h_new"), "changed")
        .otherwise("unchanged").as("diff_class"))
      .groupBy(col("diff_class"))
      .agg(count(lit(1)).as("n_rows"))
  }
}
