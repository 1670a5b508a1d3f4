package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection + micro-timing for one named query:
  * `runMain graft.Explain <queryName> [sfDir] [reps]` — prints the
  * formatted static plan, the FINAL adaptive plan after execution, then
  * times `reps` runs. The loop the "explain and iterate until it's the
  * plan you'd want" workflow runs on.
  *
  * The two plans differ meaningfully: the static plan shows one subtree
  * per consumer of a shared stage (e.g. four scan+shingle copies under
  * dedup_minhash), while the final plan (`isFinalPlan=true`, only
  * available from the SAME QueryExecution after an action on it) shows
  * AQE's stage-cache dedup as `ReusedExchange` — see PLANS.md.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    // `bench` anywhere in args → inspect the benchOverrides form (what
    // Bench actually times) instead of the oracle-gated form
    val fn =
      if (args.contains("bench"))
        SparkEntry.benchOverrides.getOrElse(name, SparkEntry.queries(name))
      else SparkEntry.queries(name)
    fn(spark, sfDir).explain("formatted")
    val df = fn(spark, sfDir)
    df.collect()
    println("=== final adaptive plan ===")
    println(df.queryExecution.executedPlan.toString)
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[explain] run $r: ${(System.nanoTime() - t0) / 1e9}%.3f s, $n rows")
    }
    spark.stop()
  }
}
