package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * Bucketing (sources/Tables.writeBucketed) optimizes ONE key; a table
  * queried by several independent columns needs a layout where min/max
  * file statistics stay tight on ALL of them. Interleaving the key bits
  * (Morton order) and range-partitioning + sorting by the interleaved
  * value gives every output file a small hyper-rectangle of the key
  * space, so a min/max-indexed reader (parquet row groups, or any
  * file-stats catalog) prunes files for a predicate on EITHER column —
  * the standard lakehouse answer (e.g. Delta/Iceberg Z-ORDER) to
  * "bucketed on A, but half my queries filter B".
  *
  * `LayoutSpec` measures the effect directly: candidate files whose
  * [min, max] admit a point predicate on the NON-sort column drop from
  * all files (linear single-key sort) to a small fraction (Z-order).
  */
object Layout {

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative keys: result bit 2i is a's bit i, bit 2i+1 is b's
    * bit i. Pure shift/and/or column arithmetic — codegen'd, engine-
    * portable (the DuckDB oracle replays the same expression), and
    * monotone-compatible with range partitioning. Keys above 2^bits
    * still map deterministically (high bits ignored); size `bits` to
    * the key domain — 21 bits covers 2M distinct values per dimension
    * in a 42-bit z-value.
    */
  def mortonInterleave(a: Column, b: Column, bits: Int = 21): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** The matching SQL expression for an external engine (same shifts,
    * same bit positions) — used by the oracle gate.
    */
  def mortonSql(aCol: String, bCol: String, bits: Int = 21): String =
    (0 until bits).map { i =>
      s"((($aCol >> $i) & 1) << ${2 * i}) | ((($bCol >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Write `df` as `files` parquet files clustered by the z-value of
    * (colA, colB): range-partition on z (files own disjoint z-ranges =
    * disjoint hyper-rectangles), sort within each file (row groups
    * inherit tight stats too). One range-exchange at write time — the
    * same pay-once trade as the bucketed layout.
    *
    * Both dimensions are first NORMALIZED to a common `bits`-wide rank
    * range (linear min/max scaling; the same move Delta/Iceberg Z-ORDER
    * makes with range-partition ids). Interleaving RAW keys of unequal
    * domain widths degrades to a single-key sort — the wider key's high
    * bits monopolize the z-value's top bits and the narrow column's
    * file stats stay wide (measured: 28/32 candidate files raw vs 6/32
    * normalized in LayoutSpec's setup). Min/max come from one tiny
    * aggregate at write time (catalog stats would do too).
    */
  def writeZOrdered(
      df: DataFrame, path: String, colA: String, colB: String,
      files: Int, bits: Int = 10): Unit = {
    val r = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    if (r.isNullAt(0) || r.isNullAt(2)) {
      // empty input (or an all-NULL key): no stats to z-order by —
      // write what there is instead of NPEing on the null aggregate
      df.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    val (minA, maxA, minB, maxB) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val hi = (1L << bits) - 1
    // the WHOLE normalization runs in double space: both `up - lo` and
    // `c - lo` wrap in Long arithmetic once the domain spans more than
    // Long.MaxValue (mixed-sign keys, e.g. signed-hash ids), silently
    // wrecking the layout. Double subtraction cannot overflow, and the
    // lost low bits are irrelevant for rank bucketing (hi ≤ 2^21 ≪
    // 2^53); clamp guards the up==c edge rounding to hi+1
    def norm(c: Column, lo: Long, up: Long): Column =
      if (up == lo) lit(0L)
      else least(lit(hi), greatest(lit(0L),
        ((c.cast("double") - lit(lo.toDouble)) / lit(up.toDouble - lo.toDouble)
          * lit(hi.toDouble)).cast("long")))
    df.withColumn("__z", mortonInterleave(
        norm(col(colA), minA, maxA).cast("long"),
        norm(col(colB), minB, maxB).cast("long"), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
