package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch per-stage profiler for the PageRank loop (dev only). */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    def time[A](label: String)(fn: => A): A = {
      val t0 = System.nanoTime()
      val r = fn
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val b = time("distinct pairs") {
      val d = Engine.table(spark, sfDir, "lineitem")
        .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk"))
        .distinct().cache()
      println("pairs=" + d.count()); d
    }
    val pairs = b.select(col("sk").as("id_a"), (col("pk") + 1000000L).as("id_b"))

    // inline copy of pageRankFixedPoint with per-iteration timing
    val edges = time("edges build") {
      val e = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct().cache()
      println("edges=" + e.count()); e
    }
    val degrees = time("degrees") {
      val d = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).cache()
      println("nodes=" + d.count()); d
    }
    val scale = 1000000L
    val base = scale * 15L / 100L
    val edgesDeg = time("edgesDeg") {
      val ed = edges.join(degrees, Seq("src")).cache()
      println("edgesDeg=" + ed.count()); ed
    }
    val nodes = degrees.select(col("src").as("node")).cache()
    var scores = nodes.select(col("node"), lit(scale).as("score"))
    for (i <- 1 to 10) {
      time(s"iter $i") {
        val contribs = edgesDeg
          .join(scores, edgesDeg("src") === scores("node"))
          .select(col("dst").as("node"), expr("score div deg").as("contrib"))
          .groupBy(col("node"))
          .agg(sum(col("contrib")).as("insum"))
        val next = nodes
          .join(contribs, Seq("node"), "left")
          .select(col("node"),
            (lit(base) +
              expr("(85 * coalesce(insum, CAST(0 AS BIGINT))) div 100")).as("score"))
        scores = next.localCheckpoint(true)
      }
    }
    spark.stop()
  }
}
