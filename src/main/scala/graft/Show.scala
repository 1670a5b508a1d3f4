package graft

/** Print one named query's result rows:
  * `runMain graft.Show <queryName> [sfDir] [numRows]` — the quick way to
  * eyeball an oracle-gate row (booleans must read true) or a small
  * result without a full Verify run.
  */
object Show {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val n = if (args.length > 2) args(2).toInt else 20
    val spark = Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    SparkEntry.queries(name)(spark, sfDir).show(n, truncate = false)
    spark.stop()
  }
}
