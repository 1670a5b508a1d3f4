package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line. Mirrors the reference's
  * harness loop (q4112_main.c:114-132: repeat, time, append) — a JVM/
  * codegen warm-up pass runs first so timings measure the engine, not
  * class loading, and the headline q4112 queries report best-of-2 like
  * the reference's best-of-5 CSV convention (BASELINE.md).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime()
      fn
      (System.nanoTime() - t0) / 1e9
    }

    // force full materialization of every operator in the plan: a bare
    // df.count() lets Catalyst prune the final Project (map-only kernels
    // like text_pii_scrub would be timed as a parquet-footer read), the
    // noop sink pulls every row through the executed plan instead
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up: pay one-time codegen/classloading + parquet footer reads
    try exec(SparkEntry.queries("q4112_part1")(spark, sfDir))
    catch { case _: Throwable => () }

    // fixed-work calibration probe, run first and last: a deterministic
    // CPU spin (128M xxh64 mixes across 32 tasks) + one tiny shuffle.
    // Identical work every run, so calib_pre/calib_post quantify the
    // box's effective throughput DURING this bench — a loaded machine
    // (round-5's driver run recorded 9.3 s for a 0.4 s query under
    // external load) is self-evident from inflated probe times instead
    // of needing an idle-box reproduction to detect post-hoc.
    def calibrate(): Double = {
      import org.apache.spark.sql.functions._
      time {
        spark.range(0, 128L * 1024 * 1024, 1, 32)
          .select(xxhash64(org.apache.spark.sql.functions.col("id")).as("h"))
          .select(pmod(org.apache.spark.sql.functions.col("h"), lit(97)).as("b"))
          .groupBy("b").count()
          .write.format("noop").mode("overwrite").save()
      }
    }
    // fixed-work SHUFFLE probe (round 8): ~1 GB of UnsafeRows through
    // the local shuffle path — quantifies disk/page-cache contention,
    // which the CPU spin cannot see (a session can read idle cpu calib
    // while shuffle-heavy work degrades; Matrix cfg18, SCALING.md
    // round-8 reading 4). Run once before and once after the sweep.
    def calibrateShuffle(): Double = {
      import org.apache.spark.sql.functions._
      time {
        spark.range(0, 64L * 1024 * 1024, 1, 32)
          .repartition(64, org.apache.spark.sql.functions.col("id"))
          .agg(count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      }
    }
    calibrate(); calibrateShuffle() // warm both probes' codegen paths

    // previous committed payload (read BEFORE this run overwrites it):
    // prior per-query times feed the end-of-run outlier re-time pass,
    // and the prior idle_shuffle band makes the settle loop ABSOLUTE
    // across rounds instead of relative to this session's (possibly
    // loaded) state. Parsed with a real JSON reader — the r10 regex
    // parse would silently disable the outlier pass on any payload
    // shape change, exactly the failure class it was added to catch
    // (ADVICE r10 item 4); zero-parsed now warns loudly instead.
    val (priorTimes, priorIdleShuffle): (Map[String, Double], Option[Double]) = {
      val f = new java.io.File("BENCH_full_latest.json")
      if (!f.isFile) (Map.empty, None)
      else try {
        import org.json4s._
        val j = org.json4s.jackson.JsonMethods.parse(
          java.nio.file.Files.readString(f.toPath))
        def num(v: JValue): Option[Double] = v match {
          case JDouble(d) => Some(d)
          case JDecimal(d) => Some(d.toDouble)
          case JInt(i) => Some(i.toDouble)
          case JLong(l) => Some(l.toDouble)
          case _ => None
        }
        val times = j \ "queries" match {
          case JObject(fields) =>
            fields.flatMap { case (k, v) => num(v).map(k -> _) }.toMap
          case _ => Map.empty[String, Double]
        }
        if (times.isEmpty)
          System.err.println("[bench] WARNING: BENCH_full_latest.json exists " +
            "but zero prior times parsed — the outlier re-run pass is disabled")
        (times, num(j \ "idle_shuffle"))
      } catch {
        case e: Throwable =>
          System.err.println("[bench] WARNING: failed to parse " +
            s"BENCH_full_latest.json (${e.getMessage}) — outlier re-run disabled")
          (Map.empty, None)
      }
    }

    // the idle shuffle band: best of three warmed probes THIS session,
    // ratcheted against the band the previous committed payload carried
    // (round-10 verdict item 4) — a loaded session cannot inflate the
    // band it settles against, because the prior round's idle value
    // caps it; the bounded settle wait keeps a genuinely slower box
    // from stalling the run. The settle loop and the outlier re-run
    // are both defined relative to it (Matrix.scala:254 established
    // the pattern; Bench lacked it and round 9 committed a payload
    // with a 10.4× session-weather row that nothing caught)
    val sessionIdleShuffle = Seq.fill(3)(calibrateShuffle()).min
    val idleShuffle = priorIdleShuffle match {
      case Some(p) if p > 0 => math.min(sessionIdleShuffle, p)
      case _ => sessionIdleShuffle
    }
    if (priorIdleShuffle.exists(p => p > 0 && sessionIdleShuffle > 2.0 * p))
      System.err.println(f"[bench] WARNING: session idle shuffle probe " +
        f"$sessionIdleShuffle%.3f s is >2x the prior round's band " +
        f"${priorIdleShuffle.get}%.3f s — this session is loaded")

    /** Drain external load / writeback until the shuffle probe returns
      * to its idle band (bounded wait). Measurement hygiene only: the
      * probe columns still record whatever state the run was in.
      */
    def settleUntilQuiet(maxWaitSec: Int = 120): Unit = {
      val deadline = System.nanoTime() + maxWaitSec * 1000000000L
      var p = calibrateShuffle()
      while (p > math.max(2.0 * idleShuffle, idleShuffle + 1.0) &&
          System.nanoTime() < deadline) {
        try new ProcessBuilder("sync").start().waitFor()
        catch { case scala.util.control.NonFatal(_) => () }
        Thread.sleep(5000)
        p = calibrateShuffle()
      }
      System.err.println(f"[bench] settle: shuffle probe $p%.3f s (idle $idleShuffle%.3f s)")
    }

    settleUntilQuiet()
    val calibPoints = scala.collection.mutable.ArrayBuffer[Double]()
    calibPoints += calibrate()
    val calibShufflePre = calibrateShuffle()

    // best-of-2 per query, like the reference's best-of-5 CSV convention
    // (BASELINE.md): run 1 absorbs first-touch costs (parquet footers,
    // codegen, JIT) that are not steady-state engine throughput.
    // A query that throws reports -1 (never a fast "success") and its
    // error lands in the "errors" map.
    // Query order is a SEEDED SHUFFLE, not alphabetical: external load at
    // the start of a run would otherwise systematically inflate the same
    // alphabetical prefix every round (round 6's driver run inflated
    // agg_*/dedup_winnow exactly this way). The fixed seed keeps the
    // order reproducible run-to-run; the calibration probe re-runs every
    // 25 queries so load bursts are localizable to a window of the run.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val ordered = new scala.util.Random(20260814L)
      .shuffle(SparkEntry.queries.toSeq.sortBy(_._1))
    val results = ordered.zipWithIndex.map { case ((name, gated), idx) =>
      if (idx > 0 && idx % 25 == 0) calibPoints += calibrate()
      // time the production form where the queries entry is an oracle
      // gate (sketch + exhaustive verification) — see benchOverrides
      val fn = SparkEntry.benchOverrides.getOrElse(name, gated)
      def once: Double =
        try time { exec(fn(spark, sfDir)) }
        catch {
          case e: Throwable =>
            errors.getOrElseUpdate(name,
              (Option(e.getMessage).getOrElse(e.getClass.getName))
                .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200))
            -1.0
        }
      val a = once
      val b = once
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }.toMap

    // OUTLIER RE-RUN (round-9 verdict item 1): any query >2× its
    // previous committed time gets one settled re-measure at end of run;
    // the better time is kept and the row is annotated. A row that
    // STAYS >2× after a settled re-run is a real regression and is
    // reported as such — the harness no longer lets session weather
    // masquerade as one (round 9's payload carried graph_pagerank at
    // 28.0 s where a settled session measures ~3.2 s).
    val suspects = results.collect {
      case (name, sec) if sec > 0 &&
        priorTimes.get(name).exists(p => p > 0 && sec > 2.0 * p && sec - p > 0.25) => name
    }.toSeq.sorted
    val retimed = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
    if (suspects.nonEmpty) {
      System.err.println(s"[bench] re-timing ${suspects.size} outlier(s) vs prior payload: " +
        suspects.mkString(", "))
      settleUntilQuiet()
    }
    val finalResults = results ++ suspects.flatMap { name =>
      val fn = SparkEntry.benchOverrides.getOrElse(name, SparkEntry.queries(name))
      val re = try Seq.fill(2)(time { exec(fn(spark, sfDir)) }).min
        catch { case _: Throwable => -1.0 }
      if (re < 0) None
      else {
        retimed(name) = (results(name), re)
        Some(name -> math.min(results(name), re))
      }
    }
    val inflated = finalResults.collect {
      case (name, sec) if sec > 0 &&
        priorTimes.get(name).exists(p => p > 0 && sec > 2.0 * p && sec - p > 0.25) => name
    }.toSeq.sorted
    val results2 = finalResults.toSeq

    val qs = results2.sortBy(_._1).map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results2.map(_._2).filter(_ >= 0).sum
    // annotation fields: what was re-timed (sweep time vs settled
    // re-run) and what REMAINS >2× the prior committed payload
    val retimedJson = retimed.map { case (k, (orig, re)) =>
      "\"" + k + f"""\":{"sweep":$orig%.3f,"settled":$re%.3f}""" }
      .mkString("{", ",", "}")
    val inflatedJson = inflated.map("\"" + _ + "\"").mkString("[", ",", "]")
    // stdout is a tail-captured channel with finite length (round 4 lost
    // every timing to 9 error messages) — keep the stdout line minimal:
    // timings + failed query NAMES only. Full error messages go to a
    // sidecar file and stderr.
    calibPoints += calibrate()
    val calibShufflePost = calibrateShuffle()
    val calibArr = calibPoints.map(c => f"$c%.3f").mkString("[", ",", "]")
    val calib = f""""calib_pre":${calibPoints.head}%.3f,"calib_post":${calibPoints.last}%.3f,"calib":$calibArr,"calib_shuffle_pre":$calibShufflePre%.3f,"calib_shuffle_post":$calibShufflePost%.3f"""
    val errNames = errors.keys.map("\"" + _ + "\"").mkString("[", ",", "]")
    // persist the SESSION's own measured band, not the ratcheted min:
    // the ratchet is an in-run comparison tool only. Writing the min
    // would make the committed band monotonically non-increasing across
    // rounds — one payload from an unusually fast box would permanently
    // poison settleUntilQuiet (full 120 s stall every call) and the
    // loaded-session warning on every normal box thereafter.
    val hygiene = f""""idle_shuffle":$sessionIdleShuffle%.3f,"retimed":$retimedJson,"inflated_vs_prior":$inflatedJson"""
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec",$calib,"queries":$qs,"failed":$errNames,"n_failed":${errors.size},"inflated_vs_prior":$inflatedJson,"sf":"$sfDir"}"""
    val full = f"""{"metric":"total","value":$total%.3f,"unit":"sec",$calib,$hygiene,"queries":$qs,"errors":$errs,"n_failed":${errors.size},"sf":"$sfDir"}"""
    // the stdout line is tail-captured with finite length (round 6 lost
    // ~60 timings + the calib fields to truncation) — persist the FULL
    // payload both to /tmp and to the repo root, where the round's
    // end-of-session commit archives it as a tracked file. The repo copy
    // is only written when cwd actually IS the sbt project root
    // (build.sbt present): a bench launched elsewhere must not scatter
    // stray files or leave a stale tracked archive looking fresh.
    val sinks = Seq("/tmp/graft-bench.json") ++
      (if (new java.io.File("build.sbt").isFile) Seq("BENCH_full_latest.json")
       else Seq.empty)
    for (p <- sinks) {
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(p), full)
      catch { case _: Throwable => () }
    }
    errors.foreach { case (k, v) => System.err.println(s"[bench] $k failed: $v") }
    println(line)
    spark.stop()
  }
}
