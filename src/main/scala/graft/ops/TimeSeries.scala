package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential time-series recurrences (the `ts_*` family's non-window
  * member). Beyond-reference capability: the reference has no ordered
  * per-key folds (SURVEY.md §2.5).
  */
object TimeSeries {

  /** Per-key integer EWMA (alpha = 1/2 fixed-point: `s := (s + v) / 2`,
    * truncating integer division — Spark's `div`) over `(t, e)`-ordered
    * events, seeded with the key's first value, plus the per-key count
    * and min(v) (the caller's non-negativity invariant: truncating and
    * flooring division only agree when every `acc + v` stays ≥ 0).
    *
    * A sequential recurrence no window frame expresses. The scale-safe
    * shape: hash-repartition on the key, sort WITHIN each partition by
    * (key, t, e), then ONE streaming pass with O(1) state per key — a
    * key's events are contiguous after the partition-local sort, so the
    * fold never materializes a per-key array (the previous
    * collect_list + in-row fold held each key's full history in one row:
    * a single-row OOM at 100× event volume). mapPartitions is justified
    * here for the same reason as in [[Multimodal]]: genuinely imperative
    * per-partition sequential state.
    *
    * Input columns must all be LongType (cast upstream). Output:
    * (key, n_events, ewma, min_v) — column names taken from `keyCol`.
    */
  def ewmaIntFold(
      events: DataFrame,
      keyCol: String, tsCol: String, seqCol: String, valCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val slim = events
      .select(col(keyCol).cast("long").as("k"), col(tsCol).cast("long").as("t"),
        col(seqCol).cast("long").as("e"), col(valCol).cast("long").as("v"))
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("t"), col("e"))
      .as[(Long, Long, Long, Long)]
    slim.mapPartitions { rows =>
      val it = rows.buffered
      new Iterator[(Long, Long, Long, Long)] {
        override def hasNext: Boolean = it.hasNext
        override def next(): (Long, Long, Long, Long) = {
          val (k, _, _, v0) = it.next()
          var acc = v0
          var n = 1L
          var mn = v0
          while (it.hasNext && it.head._1 == k) {
            val v = it.next()._4
            acc = (acc + v) / 2 // truncating, == Spark `div` on longs
            n += 1
            if (v < mn) mn = v
          }
          (k, n, acc, mn)
        }
      }
    }.toDF(keyCol, "n_events", "ewma", "min_v")
  }
}
