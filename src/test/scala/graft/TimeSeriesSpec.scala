package graft

import org.apache.spark.sql.functions._

/** Specs for the time-series / sketch-prune / fuzzy-join round-2 query
  * semantics (the oracle gate re-checks them against DuckDB at sf0.01;
  * these pin the semantics on constructed edge-case frames).
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("ts_ewma fold is order-deterministic and matches the hand recurrence") {
    // s0 = v0; s := (s + v) div 2 in (ts, event_id) order — input rows
    // shuffled to prove the sort_array(collect_list(struct)) ordering,
    // not input order, decides the fold
    val rows = Seq(
      (7L, 30L, 3L, 100L), (7L, 10L, 1L, 8L), (7L, 20L, 2L, 4L),
      (8L, 10L, 1L, 42L)) // single-event user: ewma = the value itself
      .toDF("user_id", "ts_ms", "event_id", "v")
    import org.apache.spark.sql.functions._
    val got = rows
      .select(col("user_id"), struct(col("ts_ms").as("t"),
        col("event_id").as("e"), col("v")).as("x"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("x"))).as("xs"))
      .select(col("user_id"), expr("transform(xs, x -> x.v)").as("l"))
      .select(col("user_id"),
        expr("aggregate(slice(l, 2, size(l) - 1), l[0], (acc, x) -> (acc + x) div 2)")
          .as("ewma"))
      .as[(Long, Long)].collect().toMap
    // user 7: s=8 → (8+4)/2=6 → (6+100)/2=53
    assert(got === Map(7L -> 53L, 8L -> 42L))
  }

  test("ewmaIntFold matches the hand recurrence with O(1) per-key state") {
    import graft.ops.TimeSeries
    // the scale-safe production form (repartition + sortWithinPartitions
    // + streaming fold): same recurrence, no per-key array — asserted
    // against the same hand-computed expectations as the in-row fold,
    // with input rows shuffled across the partition order
    val rows = Seq(
      (7L, 30L, 3L, 100L), (8L, 10L, 1L, 42L),
      (7L, 10L, 1L, 8L), (7L, 20L, 2L, 4L))
      .toDF("user_id", "t", "e", "v")
      .repartition(5) // scatter each user's rows before the fold
    val got = TimeSeries.ewmaIntFold(rows, "user_id", "t", "e", "v")
      .select(col("user_id"), col("n_events"), col("ewma"), col("min_v"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((7L, 3L, 53L, 4L), (8L, 1L, 42L, 42L)))
    // determinism: a second evaluation is identical
    val again = TimeSeries.ewmaIntFold(rows, "user_id", "t", "e", "v")
      .select(col("user_id"), col("n_events"), col("ewma"), col("min_v"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(again === got)
  }

  test("ewmaIntFold keeps every key's events in one fold across many keys") {
    import graft.ops.TimeSeries
    // 100 keys × 20 events in adversarial input order: each key's fold
    // must see ALL its rows (hash repartition makes them co-partitioned,
    // the partition-local sort makes them contiguous and ordered)
    val rows = (for (e <- 19 to 0 by -1; k <- 0 until 100)
      yield (k.toLong, e.toLong, e.toLong, (k + e).toLong))
      .toDF("user_id", "t", "e", "v")
    val got = TimeSeries.ewmaIntFold(rows, "user_id", "t", "e", "v")
      .select(col("user_id"), col("n_events"), col("ewma"), col("min_v"))
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length === 100)
    assert(got.forall(_._2 === 20L), "every key folds all 20 events")
    got.foreach { case (k, _, ewma, mn) =>
      val expected = (1 to 19).foldLeft(k) { (acc, e) => (acc + k + e) / 2 }
      assert(ewma === expected, s"key $k")
      assert(mn === k)
    }
  }

  test("gap-fill densifies each key's own span and zero-fills gaps") {
    val day = 86400000L
    val events = Seq(
      (1L, 0L * day), (1L, 0L * day), (1L, 3L * day), // user1: 4-day span, 2 gaps
      (2L, 5L * day))                                 // user2: single day
      .toDF("user_id", "ms")
      .select(col("user_id"), timestamp_millis(col("ms")).as("day"))
    val daily = events.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"))
    val spans = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val filled = spans
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"), expr("interval 1 day"))).as("day"))
      .join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), unix_millis(col("day")).as("day_ms"),
        coalesce(col("n_events"), lit(0L)).as("n"))
      .as[(Long, Long, Long)].collect().sorted
    assert(filled === Array(
      (1L, 0L, 2L), (1L, day, 0L), (1L, 2 * day, 0L), (1L, 3 * day, 1L),
      (2L, 5 * day, 1L)))
  }

  test("CMS prune keeps a superset of the exact heavy hitters") {
    // key i appears i times: exact HHs at threshold 40 are keys 40..49
    val rows = (1L to 49L).flatMap(k => Seq.fill(k.toInt)(k)).toDF("k")
    val cms = rows.stat.countMinSketch("k", 5, 1 << 16, 42)
    val candidates = (1L to 49L).filter(cms.estimateCount(_) >= 40L)
    assert((40L to 49L).forall(candidates.contains), "CMS must never under-count")
    val exact = rows.filter(col("k").isin(candidates: _*))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 40).as[(Long, Long)].collect().sorted
    assert(exact === (40L to 49L).map(k => (k, k)).toArray)
  }

  test("fixed-point PageRank: star center outranks leaves, mass is conserved") {
    import graft.ops.Graph
    // star: 1 is the hub of 2,3,4 (symmetrized internally)
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val scores = Graph.pageRankFixedPoint(pairs, "id_a", "id_b", iterations = 10)
      .as[(Long, Long)].collect().toMap
    assert(scores.size === 4)
    assert(Seq(2L, 3L, 4L).forall(l => scores(1L) > scores(l)),
      s"hub must outrank leaves: $scores")
    assert(scores(2L) === scores(3L) && scores(3L) === scores(4L))
    // integer truncation only loses mass: total ≤ 4·scale, close to it
    val total = scores.values.sum
    assert(total <= 4000000L && total > 3900000L, s"total $total")
    // deterministic: a second evaluation is bit-identical
    val again = Graph.pageRankFixedPoint(pairs, "id_a", "id_b", iterations = 10)
      .as[(Long, Long)].collect().toMap
    assert(again === scores)
  }

  test("levenshtein blocking filters never drop a within-threshold pair") {
    val parts = Seq((1L, "b", "blue bolt"), (2L, "b", "blue belt"),
      (3L, "b", "red gear"), (4L, "c", "blue bolt")) // 4: right name, other brand
      .toDF("id", "brand", "name")
    val a = parts.select(col("id").as("id_a"), col("brand"), col("name").as("name_a"))
    val b = parts.select(col("id").as("id_b"), col("brand"), col("name").as("name_b"))
    val got = a.join(b, Seq("brand"))
      .filter(col("id_a") < col("id_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= 3 &&
        levenshtein(col("name_a"), col("name_b"), 3) >= 0)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().sorted
    // only (1,2) qualifies: same brand, distance 1; (1,4) blocked by brand
    assert(got === Array((1L, 2L)))
  }

  /** Write a constructed events table to a temp dir so the SparkEntry
    * query runs against it exactly as it runs against the driver's
    * testdata: (event_id, epoch-ms ts, user_id, type, value).
    */
  private def withEvents[A](rows: Seq[(Long, Long, Long, String, Double)])(
      f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ts").toString
    try {
      rows.toDF("event_id", "ms", "user_id", "event_type", "value")
        .select(col("event_id"), timestamp_millis(col("ms")).as("ts"),
          col("user_id"), col("event_type"), col("value"),
          lit(null).cast("string").as("props"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      f(dir)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("ts_interpolate draws the integer line between observations") {
    val day = 86400000L
    // user 1: days 0 and 3 observed (2000 / 8000 milli) — days 1, 2 are
    // thirds of the span; user 2: truncation case, (5 + 10) div 2 = 7;
    // user 1 day 0 has TWO events that must sum before interpolation
    val got = withEvents(Seq(
      (1L, 0L, 1L, "view", 1.5), (2L, 1000L, 1L, "view", 0.5),
      (3L, 3 * day, 1L, "view", 8.0),
      (4L, 0L, 2L, "view", 0.005), (5L, 2 * day, 2L, "view", 0.010))) { d =>
      SparkEntry.queries("ts_interpolate")(spark, d)
        .select(col("user_id"), col("day_ms"), col("v_milli"),
          col("is_interp"), col("nonneg_ok"))
        .as[(Long, Long, Long, Boolean, Boolean)].collect().toSet
    }
    assert(got === Set(
      (1L, 0L, 2000L, false, true),
      (1L, day, 4000L, true, true), // (2000·2 + 8000·1) div 3
      (1L, 2 * day, 6000L, true, true), // (2000·1 + 8000·2) div 3
      (1L, 3 * day, 8000L, false, true),
      (2L, 0L, 5L, false, true),
      (2L, day, 7L, true, true), // (5 + 10) div 2 — truncated, not rounded
      (2L, 2 * day, 10L, false, true)))
  }

  test("window_gaps_islands splits streaks exactly at the gap") {
    val day = 86400000L
    // user 1: days 0,1,2 then 5,6 → streaks 3 and 2; a second event on
    // day 1 must not double-count the day
    val got = withEvents(Seq(
      (1L, 0L, 1L, "view", 1.0), (2L, day, 1L, "view", 1.0),
      (3L, day + 5L, 1L, "click", 1.0), (4L, 2 * day, 1L, "view", 1.0),
      (5L, 5 * day, 1L, "view", 1.0), (6L, 6 * day, 1L, "view", 1.0))) { d =>
      SparkEntry.queries("window_gaps_islands")(spark, d)
        .select(col("user_id"), col("n_streaks"), col("longest_streak"),
          col("n_active_days"))
        .as[(Long, Long, Long, Long)].collect().toSet
    }
    assert(got === Set((1L, 2L, 3L, 5L)))
  }

  test("events_markov counts transitions in (ts, event_id) order with bp shares") {
    // user 1: click → view → click → purchase; user 2: click → view.
    // transitions: click→view ×2, view→click ×1, click→purchase ×1
    // from 'click': view 2/3 (6666 bp), purchase 1/3 (3333 bp)
    val got = withEvents(Seq(
      (1L, 1000L, 1L, "click", 1.0), (2L, 2000L, 1L, "view", 1.0),
      (3L, 3000L, 1L, "click", 1.0), (4L, 4000L, 1L, "purchase", 1.0),
      (5L, 1000L, 2L, "click", 1.0), (6L, 2000L, 2L, "view", 1.0))) { d =>
      SparkEntry.queries("events_markov")(spark, d)
        .select(col("prev_type"), col("next_type"), col("n"), col("p_bp"))
        .as[(String, String, Long, Long)].collect().toSet
    }
    assert(got === Set(
      ("click", "view", 2L, 6666L),
      ("click", "purchase", 1L, 3333L),
      ("view", "click", 1L, 10000L)))
  }

  test("agg_decay_sum halves per 7-day age bucket, exactly") {
    val day = 86400000L
    // user 1: value 8.0 (8000 milli) at ages 0, 7, 14 days before the
    // corpus max day → 8000 + 4000 + 2000 = 14000
    val got = withEvents(Seq(
      (1L, 14 * day, 1L, "view", 8.0), (2L, 7 * day, 1L, "view", 8.0),
      (3L, 0L, 1L, "view", 8.0))) { d =>
      SparkEntry.queries("agg_decay_sum")(spark, d)
        .select(col("user_id"), col("n_events"), col("decayed_sum"),
          col("nonneg_ok"))
        .as[(Long, Long, Long, Boolean)].collect().toSet
    }
    assert(got === Set((1L, 3L, 14000L, true)))
  }

  test("ts_anomaly flags the integer z-score breach and nothing else") {
    // user 1: eight constant values then one spike — only the spike's
    // history window has variance 0 and a huge deviation; the constant
    // rows score dev = 0. Scoring starts at the 5th event (n >= 4)
    val rows = (1L to 8L).map(i => (i, i * 1000L, 1L, "view", 1.0)) :+
      ((9L, 9000L, 1L, "view", 100.0))
    val got = withEvents(rows) { d =>
      SparkEntry.queries("ts_anomaly")(spark, d)
        .select(col("user_id"), col("n_scored"), col("n_anomalies"),
          col("bounds_ok"))
        .as[(Long, Long, Long, Boolean)].collect().toSet
    }
    // events 5..9 are scored (history n = 4..8); only event 9 is flagged
    assert(got === Set((1L, 5L, 1L, true)))
  }
}
