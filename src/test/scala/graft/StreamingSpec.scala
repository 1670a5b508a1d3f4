package graft

import graft.streaming.Events
import graft.streaming.Events.{SessionEvent, UserSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private val Gap = 60000L // 1 min session gap for tests

  test("streaming sessionize closes sessions after the gap, state carries across batches") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val query = Events.sessionize(stream.toDS(), gapMs = Gap)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    // offset all event times well past the initial watermark (0): a row
    // with ts <= watermark is dropped as late by the stateful operator
    val B = 86400000L
    try {
      // batch 1: user 1 has two events 10s apart (one open session);
      // user 2 one event
      stream.addData(
        SessionEvent(1L, ts(B), "click"),
        SessionEvent(1L, ts(B + 10000L), "click"),
        SessionEvent(2L, ts(B + 5000L), "view"))
      query.processAllAvailable()
      assert(spark.table("sessions_out").count() === 0) // nothing closed yet

      // batch 2: events far beyond the gap close both open sessions
      stream.addData(
        SessionEvent(1L, ts(B + 10000L + Gap + 1), "click"),
        SessionEvent(2L, ts(B + 5000L + Gap + 1), "view"))
      query.processAllAvailable()
      val closed = spark.table("sessions_out").as[UserSession].collect().toSet
      assert(closed === Set(
        UserSession(1L, B, B + 10000L, 2L),
        UserSession(2L, B + 5000L, B + 5000L, 1L)))
    } finally query.stop()
  }

  test("a late but in-watermark event cannot regress the open session's end") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    // default 10-minute watermark delay: a row a few seconds behind the
    // max event time is LATE but still accepted by the stateful operator
    val query = Events.sessionize(stream.toDS(), gapMs = Gap)
      .writeStream.format("memory").queryName("late_sessions_out")
      .outputMode("append").start()
    val B = 86400000L
    try {
      stream.addData(
        SessionEvent(1L, ts(B), "click"),
        SessionEvent(1L, ts(B + 10000L), "click"))
      query.processAllAvailable()
      // late arrival delivered by a LATER micro-batch: must join the
      // session without moving `last` backwards (session_end below a
      // counted member event, gap timeout re-armed too early)
      stream.addData(SessionEvent(1L, ts(B + 5000L), "click"))
      query.processAllAvailable()
      // close it: gap measured from the TRUE last activity (B+10s)
      stream.addData(SessionEvent(1L, ts(B + 10000L + Gap + 1L), "click"))
      query.processAllAvailable()
      val closed = spark.table("late_sessions_out").as[UserSession].collect().toSet
      assert(closed === Set(UserSession(1L, B, B + 10000L, 3L)))
    } finally query.stop()
  }

  test("sessionize emits final sessions via event-time timeout and evicts state") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    // zero watermark delay so the watermark tracks max event time exactly
    val query = Events.sessionize(stream.toDS(), gapMs = Gap, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sessions_timeout_out")
      .outputMode("append").start()
    try {
      // user 3 goes quiet; only OTHER users' events advance the watermark
      stream.addData(SessionEvent(3L, ts(1000L), "click"))
      query.processAllAvailable()
      assert(spark.table("sessions_timeout_out").count() === 0)

      // watermark jumps far past user 3's gap deadline (1000 + Gap);
      // the no-data batch fires the timeout and emits the final session
      stream.addData(SessionEvent(9L, ts(1000L + 10 * Gap), "click"))
      query.processAllAvailable()
      val closed = spark.table("sessions_timeout_out").as[UserSession].collect().toSet
      assert(closed === Set(UserSession(3L, 1000L, 1000L, 1L)))
    } finally query.stop()
  }

  test("session_window boundary: exact-gap event MERGES into the session") {
    import org.apache.spark.sql.functions._
    val gap = 1800000L
    val B = 86400000L
    val df = Seq(
      (1L, new java.sql.Timestamp(B)),
      (1L, new java.sql.Timestamp(B + gap)),      // exactly gap later
      (1L, new java.sql.Timestamp(B + gap + 1000L)))
      .toDF("user_id", "ts")
    val sessions = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("w.start")).as("s"), col("n").cast("long"))
      .as[(Long, Long)].collect().sortBy(_._1)
    // windows [t, t+gap] merge INCLUSIVELY: the exact-gap event joins
    // the first session — same > split as sessionizeBatch (pins the
    // oracle SQL's split condition)
    assert(sessions === Array((B, 3L)))
  }

  test("batch sessionize agrees with an independently computed expectation") {
    val events = Seq(
      (1L, 0L), (1L, 30000L), (1L, 100000L), // user1: [0,30000](2), [100000](1)
      (2L, 0L), (2L, 59999L), (2L, 119998L)) // user2: one session, gaps < 60001
      .map { case (u, t) => (u, ts(t)) }.toDF("user_id", "ts")
    val got = Events.sessionizeBatch(events, gapMs = Gap)
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 0L, 30000L, 2L), (1L, 100000L, 100000L, 1L),
      (2L, 0L, 119998L, 3L)))
  }

  test("streaming windowed agg (complete mode) equals the batch aggregation") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = stream.toDF().toDF("ts", "event_type", "value")
    val query = Events.windowedAgg(df, "5 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      val data = (0 until 100).map(i =>
        (ts(i * 13000L), if (i % 3 == 0) "a" else "b", i / 10.0))
      stream.addData(data: _*)
      query.processAllAvailable()
      // float sums accumulate in partition order → compare rounded
      val streamed = spark.table("win_out")
        .select(unix_timestamp($"window_start").as("w"), $"event_type", $"n_events",
          round($"sum_value", 6).as("sum_value"))
        .as[(Long, String, Long, Double)].collect().toSet

      val batch = Events.windowedAgg(data.toDF("ts", "event_type", "value"), "5 minutes")
        .select(unix_timestamp($"window_start").as("w"), $"event_type", $"n_events",
          round($"sum_value", 6).as("sum_value"))
        .as[(Long, String, Long, Double)].collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("stream-stream interval join equals the batch execution of the same plan") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val B = 86400000L
    val data = Seq(
      (1L, ts(B), 7L, "click"),
      (2L, ts(B + 1000L), 7L, "purchase"),      // within 10 min of click 1
      (3L, ts(B + 700000L), 7L, "purchase"),     // beyond 10 min — no match
      (4L, ts(B + 5000L), 8L, "purchase"),       // other user — no match
      (5L, ts(B + 600000L), 7L, "purchase"))     // exactly at the bound — match
    def toDf(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "ts", "user_id", "event_type")
    val query = Events.clickPurchaseJoin(toDf(stream.toDF()))
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      stream.addData(data: _*)
      query.processAllAvailable()
      val streamed = spark.table("ssj_out")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val batch = Events.clickPurchaseJoin(toDf(data.toDF()))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.map(_._4) === Set(2L, 5L))
    } finally query.stop()
  }

  test("stream-stream LEFT OUTER join emits the unmatched click once the watermark passes") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val B = 86400000L
    val data = Seq(
      (1L, ts(B), 7L, "click"),            // converts via event 2
      (2L, ts(B + 1000L), 7L, "purchase"),
      (3L, ts(B + 2000L), 8L, "click"))    // never converts → -1 sentinels
    def toDf(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "ts", "user_id", "event_type")
    val query = Events.clickPurchaseJoin(toDf(stream.toDF()), joinType = "left_outer")
      .writeStream.format("memory").queryName("ssjo_out")
      .outputMode("append").start()
    try {
      stream.addData(data: _*)
      query.processAllAvailable()
      // the outer row is NOT speculative: click 3 can still match until
      // the watermark passes click_ts + interval, so it must be absent
      val early = spark.table("ssjo_out").as[(Long, Long, Long, Long, Long)]
        .collect().toSet
      assert(!early.exists(_._1 == 3L),
        s"outer row emitted before state eviction: $early")
      // advance the watermark far past click 3's last possible match.
      // Each side's watermark op sits after its event_type filter and
      // the GLOBAL watermark is the min of both, so the flush must feed
      // BOTH branches (flush click and purchase on non-joining users);
      // the watermark then updates at batch END and eviction runs in
      // the NEXT batch, so a second nudge batch flushes the outer row
      stream.addData(
        (98L, ts(B + 100 * 60 * 1000L), 9L, "click"),
        (99L, ts(B + 100 * 60 * 1000L), 10L, "purchase"))
      query.processAllAvailable()
      stream.addData((100L, ts(B + 101 * 60 * 1000L), 10L, "purchase"))
      query.processAllAvailable()
      val streamed = spark.table("ssjo_out").as[(Long, Long, Long, Long, Long)]
        .collect().toSet
      val batch = Events.clickPurchaseJoin(toDf(data.toDF()), joinType = "left_outer")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.exists(r => r._1 == 3L && r._4 == -1L && r._5 == -1L),
        s"unmatched click missing its sentinel row: $streamed")
    } finally query.stop()
  }

  test("streaming attribution: purchases attribute to the last prior click across batches") {
    import graft.streaming.Events.{AttrEvent, Attribution}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[AttrEvent]
    val query = Events.attributionStream(stream.toDS())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    val B = 86400000L
    try {
      // batch 1: user 1 clicks (e1), then purchases (e2) → attributed;
      // user 2 purchases with no prior click → unattributed
      stream.addData(
        AttrEvent(1L, ts(B), 1L, "click"),
        AttrEvent(1L, ts(B + 5000L), 2L, "purchase"),
        AttrEvent(2L, ts(B + 1000L), 3L, "purchase"),
        AttrEvent(1L, ts(B + 6000L), 4L, "view")) // non-participant type
      query.processAllAvailable()
      // batch 2: the click STATE carries across batches — a later click
      // (e5) replaces e1, and the next purchase (e6) attributes to e5
      stream.addData(
        AttrEvent(1L, ts(B + 10000L), 5L, "click"),
        AttrEvent(1L, ts(B + 12000L), 6L, "purchase"),
        AttrEvent(2L, ts(B + 11000L), 7L, "purchase")) // still no click
      query.processAllAvailable()
      val got = spark.table("attr_out").as[Attribution].collect().toSet
      assert(got === Set(
        Attribution(1L, 2L, Some(1L), Some(5000L)),
        Attribution(2L, 3L, None, None),
        Attribution(1L, 6L, Some(5L), Some(2000L)),
        Attribution(2L, 7L, None, None)))
    } finally query.stop()
  }

  test("attributionStream in batch mode equals the events_attribution window plan") {
    import graft.streaming.Events.AttrEvent
    // the same fold over a BATCH Dataset must reproduce the batch window
    // query exactly (strictly-prior semantics incl. the same-ts tiebreak)
    val rows = Seq(
      AttrEvent(1L, ts(1000L), 1L, "click"),
      AttrEvent(1L, ts(2000L), 2L, "purchase"),
      AttrEvent(1L, ts(2000L), 3L, "click"),    // same ts as e2, higher id
      AttrEvent(1L, ts(3000L), 4L, "purchase"), // attributes to e3
      AttrEvent(2L, ts(1500L), 5L, "purchase")) // never attributed
    val streamForm = Events.attributionStream(rows.toDS())
      .collect().map(a => (a.user_id, a.purchase_id, a.click_id, a.lag_ms)).toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val batchForm = rows.toDF()
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        col("event_id"), col("event_type"))
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("click_id", last(
        when(col("event_type") === "click", col("event_id")),
        ignoreNulls = true).over(w))
      .withColumn("click_ts", last(
        when(col("event_type") === "click", col("ts_ms")),
        ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        col("click_id"), (col("ts_ms") - col("click_ts")).as("lag_ms"))
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(streamForm === batchForm)
    assert(streamForm.contains((1L, 2L, Some(1L), Some(1000L))))
    assert(streamForm.contains((1L, 4L, Some(3L), Some(1000L))))
  }

  test("batch attributionStream keeps the retention cutoff the window plan lacks") {
    import graft.streaming.Events.AttrEvent
    // PINNED SEMANTICS (scaladoc): the retention window is part of the
    // operator even in batch execution — a purchase whose last prior
    // click is older than retentionMs gets None from the fold, while
    // the events_attribution window plan (no cutoff) would attribute
    // it. Equality with the window plan holds only for in-window lags.
    val Retention = 60000L
    val rows = Seq(
      AttrEvent(1L, ts(1000L), 1L, "click"),
      AttrEvent(1L, ts(1000L + 2 * Retention), 2L, "purchase"), // beyond
      AttrEvent(2L, ts(1000L), 3L, "click"),
      AttrEvent(2L, ts(31000L), 4L, "purchase")) // within
    val got = Events.attributionStream(rows.toDS(), retentionMs = Retention)
      .collect().map(a => (a.user_id, a.purchase_id, a.click_id, a.lag_ms)).toSet
    assert(got === Set(
      (1L, 2L, None, None), // the cutoff applied: no attribution
      (2L, 4L, Some(3L), Some(30000L))))
  }

  test("rolling anomaly processor rejects |v| >= 1e8 instead of wrapping silently") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Long, Long)]
    val old = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val query = stream.toDS()
      .groupByKey(_._1)
      .transformWithState(new Events.RollingAnomalyProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .writeStream.format("memory").queryName("anom_bounds_out")
      .outputMode("append").start()
    try {
      stream.addData((1L, 1000L, 1L, 100000000L)) // |v| = 1e8: breach
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        query.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(c =>
        Option(c.getMessage).exists(_.contains("|v| < 1e8"))))
    } finally {
      try query.stop() catch { case _: Throwable => () }
      old match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming dedup probe equals its batch execution across micro-batches") {
    import graft.ops.Dedup
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // standing corpus: two docs; incoming stream: one near-dup of doc 1
    // (arrives in batch 1), one unrelated (batch 2), one near-dup of
    // doc 2 (batch 2) — state must not leak matches across batches
    val standingDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog by the river"),
      (2L, "completely different standing content about stellar cores"))
      .toDF("doc_id", "text")
    val standing = Dedup.winnowSketches(standingDocs, "doc_id", "text",
      k = 5, w = 4).cache()
    standing.count()
    val incoming = Seq(
      (10L, 1000L, "the quick brown fox jumps over the sleepy dog by the river"),
      (11L, 2000L, "unrelated incoming text with no standing counterpart at all"),
      (12L, 3000L, "completely different standing content about stellar bodies"))
    def row(t: (Long, Long, String)) = (t._1, ts(t._2), t._3)
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val query = graft.streaming.Events.dedupProbeStream(
        stream.toDF().toDF("doc_id", "ts", "text"), standing, threshold = 0.3)
      .writeStream.format("memory").queryName("dedup_probe_out")
      .outputMode("append").start()
    try {
      stream.addData(row(incoming(0)))
      query.processAllAvailable()
      stream.addData(row(incoming(1)), row(incoming(2)))
      query.processAllAvailable()
      val streamed = spark.table("dedup_probe_out")
        .select("doc_id", "dup_of").as[(Long, Long)].collect().toSet
      val batch = graft.streaming.Events.dedupProbeStream(
          incoming.map(row).toDF("doc_id", "ts", "text"), standing,
          threshold = 0.3)
        .select("doc_id", "dup_of").as[(Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set((10L, 1L), (12L, 2L))) // 11 matches nothing
    } finally {
      query.stop()
      standing.unpersist()
    }
  }

  test("streaming vector probe equals its batch execution across micro-batches") {
    import graft.ops.{Clustering, Similarity}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def vec(seed: Int): Array[Float] =
      Array.tabulate(8)(d => (((seed * 131 + d * 17) % 19) - 9) / 9.0f)
    val corpus = (1 to 40).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val (_, km) = Clustering.kmeans(corpus, "vec_id", "embedding", k = 4, maxIter = 3)
    val standing = Similarity.ivfAssign(corpus, "vec_id", "embedding", km.centroids)
      .cache()
    standing.count()
    // incoming: exact copies of standing vectors 1 and 25 (cosine 1.0;
    // identical vector ⇒ same home bucket ⇒ within any nProbe ≥ 1),
    // arriving in separate micro-batches
    val incoming = Seq((101L, 1000L, vec(1)), (102L, 2000L, vec(25)))
    val stream = MemoryStream[(Long, java.sql.Timestamp, Array[Float])]
    val query = graft.streaming.Events.simProbeStream(
        stream.toDF().toDF("vec_id", "ts", "embedding"), standing,
        km.centroids, nProbe = 2, threshold = 0.95)
      .writeStream.format("memory").queryName("sim_probe_out")
      .outputMode("append").start()
    try {
      stream.addData((101L, ts(1000L), vec(1)))
      query.processAllAvailable()
      stream.addData((102L, ts(2000L), vec(25)))
      query.processAllAvailable()
      val streamed = spark.table("sim_probe_out")
        .select("vec_id", "dup_of").as[(Long, Long)].collect().toSet
      val batch = graft.streaming.Events.simProbeStream(
          incoming.map(t => (t._1, ts(t._2), t._3))
            .toDF("vec_id", "ts", "embedding"),
          standing, km.centroids, nProbe = 2, threshold = 0.95)
        .select("vec_id", "dup_of").as[(Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.contains((101L, 1L)))
      assert(streamed.contains((102L, 25L)))
    } finally {
      query.stop()
      standing.unpersist()
    }
  }

  test("attribution state evicts via event-time timeout after the retention window") {
    import graft.streaming.Events.{AttrEvent, Attribution}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[AttrEvent]
    val Retention = 60000L
    val query = Events.attributionStream(stream.toDS(),
        retentionMs = Retention, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("attr_evict_out")
      .outputMode("append").start()
    try {
      stream.addData(AttrEvent(1L, ts(1000L), 1L, "click"))
      query.processAllAvailable()
      // another user's event drives the watermark far past the click's
      // retention deadline → user 1's state evicts on timeout
      stream.addData(AttrEvent(9L, ts(1000L + 100 * Retention), 2L, "click"))
      query.processAllAvailable()
      // user 1's purchase after eviction is unattributed
      stream.addData(AttrEvent(1L, ts(1000L + 101 * Retention), 3L, "purchase"))
      query.processAllAvailable()
      val got = spark.table("attr_evict_out").as[Attribution].collect().toSet
      assert(got === Set(Attribution(1L, 3L, None, None)))
    } finally query.stop()
  }

  test("attribution window applies at purchase time, not only via the timeout") {
    import graft.streaming.Events.{AttrEvent, Attribution}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[AttrEvent]
    val Retention = 60000L
    // generous watermark delay: the stale click's timeout has NOT fired
    // when the late purchase arrives — the in-fold window check must
    // reject the attribution on its own
    val query = Events.attributionStream(stream.toDS(),
        retentionMs = Retention, watermarkDelay = "10 days")
      .writeStream.format("memory").queryName("attr_window_out")
      .outputMode("append").start()
    try {
      stream.addData(AttrEvent(1L, ts(1000L), 1L, "click"))
      query.processAllAvailable()
      // same user, next batch: purchase 2 retention windows later —
      // within the watermark, beyond the attribution window
      stream.addData(AttrEvent(1L, ts(1000L + 2 * Retention), 2L, "purchase"))
      query.processAllAvailable()
      // and a fresh click + in-window purchase still attribute normally
      stream.addData(
        AttrEvent(1L, ts(1000L + 3 * Retention), 3L, "click"),
        AttrEvent(1L, ts(1000L + 3 * Retention + 5000L), 4L, "purchase"))
      query.processAllAvailable()
      val got = spark.table("attr_window_out").as[Attribution].collect().toSet
      assert(got === Set(
        Attribution(1L, 2L, None, None),
        Attribution(1L, 4L, Some(3L), Some(5000L))))
    } finally query.stop()
  }

  test("streaming dedup keeps the first occurrence per key within the watermark") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val B = 86400000L
    val query = Events.dedupStream(
      stream.toDF().toDF("event_id", "ts", "content_hash"), Seq("content_hash"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts(B), "aaa"), (2L, ts(B + 1000L), "aaa"), (3L, ts(B + 2000L), "bbb"))
      query.processAllAvailable()
      // duplicate in a later batch, still within the watermark horizon
      stream.addData((4L, ts(B + 3000L), "aaa"))
      query.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().toSet
      assert(ids === Set(1L, 3L))
    } finally query.stop()
  }

  test("streaming dedup on REAL events matches the batch keep-first surface per type") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // in-order (event-time sorted) replay of the whole sf0.001 events
    // table through the watermarked streaming dedup; the surviving
    // count per event_type must equal events_stream_dedup's n_kept
    // (distinct content keys — arrival order only affects WHICH dup is
    // kept, never how many survive). The watermark delay must exceed
    // the corpus's event-time span: dropDuplicatesWithinWatermark
    // guarantees dedup only within the horizon — once state expires a
    // later duplicate is re-admitted BY DESIGN, so a short delay keeps
    // legitimately MORE rows than the global batch dedup (observed
    // +4..+9 per type at 10 minutes)
    val rows = Engine.eventsTable(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("props"))
      .orderBy(col("ts"), col("event_id"))
      .as[(Long, java.sql.Timestamp, Long, String, String)]
      .collect()
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String, String)]
    val query = Events.dedupStream(
      stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "props"),
      keyCols = Seq("user_id", "event_type", "props"),
      watermarkDelay = "3650 days")
      .writeStream.format("memory").queryName("real_dedup_out")
      .outputMode("append").start()
    try {
      stream.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      stream.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      val streamed = spark.table("real_dedup_out")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_streamed"))
      val batch = SparkEntry.queries("events_stream_dedup")(spark, sfDir)
      val mismatch = batch.join(streamed, Seq("event_type"), "full_outer")
        .filter(coalesce(col("n_kept"), lit(-1L)) =!=
          coalesce(col("n_streamed"), lit(-2L)))
      assert(mismatch.isEmpty,
        s"stream/batch dedup diverge:\n${mismatch.collect().mkString("\n")}")
    } finally query.stop()
  }

  test("stream-static enrich equals the batch execution of the same plan") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val B = 86400000L
    val data = Seq(
      (1L, ts(B), "click", 2.0),
      (2L, ts(B + 1000L), "purchase", 5.0),
      (3L, ts(B + 2000L), "mystery", 1.0)) // unmatched → category "unknown"
    def toDf(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "ts", "event_type", "value")
    val query = Events.enrichWithTypeDim(toDf(stream.toDF()))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      stream.addData(data: _*)
      query.processAllAvailable()
      val streamed = spark.table("enrich_out")
        .select($"event_id", $"category", $"weight")
        .as[(Long, String, Long)].collect().toSet
      val batch = Events.enrichWithTypeDim(toDf(data.toDF()))
        .select($"event_id", $"category", $"weight")
        .as[(Long, String, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set(
        (1L, "engagement", 1L), (2L, "revenue", 10L), (3L, "unknown", 0L)))
    } finally query.stop()
  }

  test("incremental run processes the delta once, then nothing on re-run") {
    val dir = java.nio.file.Files.createTempDirectory("graft_incr").toString
    val ckpt = s"$dir/ckpt"
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def run(): Unit =
      Events.runIncremental(Events.readStream(spark, sfDir), ckpt) { (df, id) =>
        batches += ((id, df.count()))
      }
    run()
    val total = batches.map(_._2).sum
    assert(total === Engine.table(spark, sfDir, "events").count())
    // second invocation from the same checkpoint: no new files → no rows
    val before = batches.size
    run()
    assert(batches.drop(before).map(_._2).sum === 0L)
  }

  test("checkpointed parquet sink with Trigger.AvailableNow equals the batch transform") {
    import org.apache.spark.sql.streaming.Trigger
    // the incremental-batch pattern: process everything available, write
    // exactly-once to files (checkpoint + sink log dedup the work), stop.
    // The parquet the stream wrote must equal the batch execution of the
    // same transform; a rerun from the same checkpoint must write NOTHING.
    val base = java.nio.file.Files.createTempDirectory("graft-sink").toString
    def run(): Unit = {
      val q = Events.readStream(spark, sfDir)
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"))
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "sink query did not finish")
    }
    run()
    val batch = Engine.eventsTable(spark, sfDir)
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"))
      .as[(Long, Long)].collect().toSet
    val streamed = spark.read.parquet(s"$base/out")
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    run() // exactly-once: no new input → no new rows
    val after = spark.read.parquet(s"$base/out").count()
    assert(after === batch.size.toLong)
  }

  test("transformWithState running count equals the batch groupBy across micro-batches") {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[(Long, String)]
      val q = stream.toDS()
        .groupByKey(_._1)
        .transformWithState(new Events.RunningCountProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "n")
        .writeStream.format("memory").queryName("tws_out")
        .outputMode("update").start()
      try {
        stream.addData((7L, "click"), (7L, "view"), (8L, "click"))
        q.processAllAvailable()
        // second batch: state must carry the first batch's totals
        stream.addData((7L, "purchase"), (9L, "view"))
        q.processAllAvailable()
        val lastPerKey = spark.table("tws_out")
          .groupBy(col("user_id")).agg(max(col("n")).as("n"))
          .as[(Long, Long)].collect().toMap
        assert(lastPerKey === Map(7L -> 3L, 8L -> 1L, 9L -> 1L))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState rolling anomaly equals the batch window plan across batches") {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // user 1: eight constant values then a spike, split ACROSS two
      // micro-batches so the ring state must carry; only the spike
      // (event 9) flags — same fixture as TimeSeriesSpec's batch case
      val rows = (1L to 8L).map(i => (1L, i * 1000L, i, 1000L)) :+
        ((1L, 9000L, 9L, 100000L))
      val stream = MemoryStream[(Long, Long, Long, Long)]
      val q = stream.toDS()
        .groupByKey(_._1)
        .transformWithState(new Events.RollingAnomalyProcessor,
          TimeMode.None(), OutputMode.Append())
        .toDF("user_id", "event_id", "flag")
        .writeStream.format("memory").queryName("tws_anom_out")
        .outputMode("append").start()
      try {
        stream.addData(rows.take(6))
        q.processAllAvailable()
        stream.addData(rows.drop(6))
        q.processAllAvailable()
        val got = spark.table("tws_anom_out")
          .as[(Long, Long, Boolean)].collect().toSet
        // events 5..9 scored (history >= 4); only the spike flags
        assert(got === Set(
          (1L, 5L, false), (1L, 6L, false), (1L, 7L, false),
          (1L, 8L, false), (1L, 9L, true)))
        // cross-check against the batch window form's per-user rollup
        val batch = Seq((1L, 5L, 1L, true)) // n_scored=5, n_anomalies=1
        assert(got.count(_._3) === batch.head._3.toInt &&
          got.size === batch.head._2.toInt)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("readStream over events parquet produces the batch row count") {
    val streamed = Events.readStream(spark, sfDir)
    assert(streamed.isStreaming)
    val query = streamed.groupBy().count()
      .writeStream.format("memory").queryName("evt_count")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val n = spark.table("evt_count").collect().head.getLong(0)
      val batchN = Engine.table(spark, sfDir, "events").count()
      assert(n === batchN)
    } finally query.stop()
  }

  test("streaming IVF upsert: incremental runs append exactly the delta across batches") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.{ModelStore, Similarity}
    val stream = MemoryStream[(Long, Array[Float])]
    val vecs = stream.toDS()
      .select(col("_1").as("vec_id"), col("_2").as("embedding"))
    val centroids = Array(
      Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val delta = s"$dir/delta"; val ckpt = s"$dir/ckpt"
    def v(a: Float, b: Float, c: Float, d: Float) = Array(a, b, c, d)
    // run 1 drains the first two vectors; run 2 (same checkpoint) must
    // process ONLY the later arrival — the catch-up contract
    stream.addData((1L, v(1f, 0f, 0f, 0f)), (2L, v(0f, 1f, 0f, 0f)))
    Events.ivfUpsertStream(vecs, centroids, delta, ckpt)
    stream.addData((3L, v(0.9f, 0.1f, 0f, 0f)))
    Events.ivfUpsertStream(vecs, centroids, delta, ckpt)
    val all = Seq(
      (1L, v(1f, 0f, 0f, 0f)), (2L, v(0f, 1f, 0f, 0f)),
      (3L, v(0.9f, 0.1f, 0f, 0f))).toDF("vec_id", "embedding")
    val expect = Similarity.ivfAssign(all, "vec_id", "embedding", centroids)
    val got = ModelStore.loadIvfDelta(spark, delta)
    assert(got.exceptAll(expect).count() === 0)
    assert(expect.exceptAll(got).count() === 0)
    // each incremental run landed in its own idempotent batch partition
    assert(spark.read.parquet(delta)
      .select("ingest_batch").distinct().count() === 2)
  }
}
