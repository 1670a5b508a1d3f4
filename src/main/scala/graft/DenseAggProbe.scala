package graft

import org.apache.spark.sql.functions._

/** Diagnostic main for the dense-array partial aggregate's rep-to-rep
  * behavior: the r9 cfg10 campaign saw rep 1 at 11.2 s then rep 2 at
  * 54 s with clean load probes and post-GC heap growing ~30 GB per rep.
  * This replays N reps of JUST the dense-accumulation stage (and, for
  * contrast, the plain hash partial aggregate) over a cached synthetic
  * (group, v) table, printing per-rep wall time and post-GC heap, to
  * separate a real retention/GC problem in the operator from session
  * effects in the big harness. Temporary tool — not part of the library
  * surface.
  */
object DenseAggProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(400000000L)
    val mode = if (args.length > 1) args(1) else "dense"
    val reps = if (args.length > 2) args(2).toInt else 4
    val groups = if (args.length > 3) args(3).toLong else 1000000L
    val spark = Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val gv = spark.range(0L, rows, 1L, 32)
      .select((col("id") % groups).as("g0"), (col("id") % 97L).as("v0"))
      .cache()
    gv.count()
    def heapGb: Double = {
      System.gc(); Thread.sleep(500); System.gc(); Thread.sleep(200)
      val rt = Runtime.getRuntime
      (rt.totalMemory() - rt.freeMemory()) / 1e9
    }
    println(f"[probe] mode=$mode rows=$rows baseline heap=${heapGb}%.1fg")
    for (rep <- 1 to reps) {
      val t0 = System.nanoTime()
      val r = mode match {
        case "dense" =>
          graft.ops.Q4112.denseGroupedAvg(gv.select(col("g0"), col("v0").as("v")),
            minGroup = 0L, domain = groups.toInt).collect()(0).getLong(0)
        case "accum" =>
          // bisection: toRdd + the per-task array accumulation WITHOUT
          // internalCreateDataFrame / the downstream aggregates — if
          // this leg alone degrades, the problem is the toRdd replay or
          // the accumulation; if not, it's the LogicalRDD/agg tail
          gv.select(col("g0"), col("v0")).queryExecution.toRdd
            .mapPartitions { it =>
              val dom = groups.toInt
              val sums = new Array[Long](dom)
              val cnts = new Array[Long](dom)
              while (it.hasNext) {
                val row = it.next()
                val g = row.getLong(0).toInt
                sums(g) += row.getLong(1); cnts(g) += 1L
              }
              var s = 0L; var i = 0
              while (i < dom) { s += sums(i) + cnts(i); i += 1 }
              Iterator.single(s)
            }.sum().toLong
        case _ =>
          gv.groupBy(col("g0"))
            .agg(sum(col("v0")).as("s"), count(lit(1)).as("c"))
            .select(expr("s div c").as("a"))
            .agg(sum(col("a")).as("ss"), count(lit(1)).as("cc"))
            .select(expr("ss div cc")).collect()(0).getLong(0)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] rep$rep: $dt%.2f s result=$r heap(postGC)=${heapGb}%.1fg")
    }
    spark.stop()
  }
}
