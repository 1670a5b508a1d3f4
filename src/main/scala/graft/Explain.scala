package graft
/** Dev tool: print the final (post-AQE) physical plan of a named query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.01")
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
