package graft

import org.apache.spark.sql.SparkSession

/** Batch plan capture for the optimization rounds:
  * `runMain graft.PlanDump <outDir> <suffix> <query1> [query2 ...]` —
  * writes `<outDir>/<query>_<suffix>.txt` with the `.explain("formatted")`
  * output of each named query's BENCH form (benchOverrides when present,
  * the gated form otherwise), all in one JVM so a sweep over a dozen
  * queries does not pay a dozen session startups. Reads the data dir from
  * SPARK_GRAFT_SF_DIR like Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
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
    new java.io.File(outDir).mkdirs()
    for (name <- names) {
      val fn = SparkEntry.benchOverrides.getOrElse(name, SparkEntry.queries(name))
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        System.err.println(s"[plandump] wrote $name")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
