package graft

import org.apache.spark.sql.SparkSession

/** Focused A/B timing for the optimization rounds:
  * `runMain graft.TimeQ <reps> <query1> [query2 ...]` — times each named
  * query's BENCH form (benchOverrides when present) with the noop sink,
  * `reps` reps after one warm-up, prints min/median per query. Same
  * session config as Bench so numbers are comparable; reads
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val reps = args(0).toInt
    val names = args.drop(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    for (name <- names) {
      val fn = SparkEntry.benchOverrides.getOrElse(name, SparkEntry.queries(name))
      try {
        exec(fn(spark, sfDir)) // warm-up
        val ts = (1 to reps).map(_ => time(exec(fn(spark, sfDir)))).sorted
        println(f"[timeq] $name%-32s min=${ts.head}%.3f med=${ts(ts.size / 2)}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
      } catch {
        case e: Throwable => println(s"[timeq] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
