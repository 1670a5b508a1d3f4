package graft

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: measure the empirical relationship between each sketch
  * surface and its exact counterpart at each sf, to pick oracle-gate
  * thresholds that hold with margin.
  */
object ScratchGates {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      println(s"=== $sf docs=${docs.count()}")

      // --- simhash vs exact jaccard on doc_id < 500
      val slice = docs.filter(col("doc_id") < 500)
      val sim = Dedup.simhashPairs(slice, "doc_id", "text", n = 5, maxHamming = 3).cache()
      val exact = Dedup.ngramJaccardPairs(slice, "doc_id", "text", n = 5, threshold = 0.0)
        .filter(col("jaccard") >= 0.05).cache() // all pairs with any overlap above noise
      val simJ = sim.join(exact, Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n_sim"), min(col("jaccard")).as("min_j"),
          sum(when(col("jaccard").isNull, 1).otherwise(0)).as("n_nojoin")).head()
      println(s"simhash: n=${simJ.getLong(0)} minExactJ=${simJ.get(1)} nBelow0.05=${simJ.getLong(2)}")
      for (thr <- Seq(0.8, 0.9, 0.95)) {
        val high = exact.filter(col("jaccard") >= thr)
        val missed = high.join(sim, Seq("id_a", "id_b"), "left_anti").count()
        println(s"simhash: R($thr)=${high.count()} missed=$missed")
      }

      // --- winnow vs exact on doc_id < 200
      val slice2 = docs.filter(col("doc_id") < 200)
      val prep = slice2.select(col("doc_id").as("id"),
        TextAnalysis.winnowFingerprint(col("text"), k = 5, w = 4).as("fp"))
        .repartition(8, col("id"))
      val a = prep.select(col("id").as("id_a"), col("fp").as("fp_a"))
      val b = prep.select(col("id").as("id_b"), col("fp").as("fp_b"))
      val win = a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          graft.functions.TextHashFunctions.jaccardSorted(col("fp_a"), col("fp_b")).as("wj"))
        .filter(col("wj") >= 0.5).cache()
      val exact2 = Dedup.ngramJaccardPairs(slice2, "doc_id", "text", n = 5, threshold = 0.0)
        .filter(col("jaccard") >= 0.05).cache()
      val winJ = win.join(exact2, Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n"), min(col("jaccard")).as("min_j"),
          sum(when(col("jaccard").isNull, 1).otherwise(0)).as("n_nojoin")).head()
      println(s"winnow: n=${winJ.getLong(0)} minExactJ=${winJ.get(1)} nBelow0.05=${winJ.getLong(2)}")
      for (thr <- Seq(0.8, 0.9, 0.95)) {
        val high = exact2.filter(col("jaccard") >= thr)
        val missed = high.join(win, Seq("id_a", "id_b"), "left_anti").count()
        println(s"winnow: R($thr)=${high.count()} missed=$missed")
      }

      // --- embedding LSH vs exact
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val lsh = Dedup.embeddingPairs(emb, "vec_id", "embedding", threshold = 0.25, planes = 16)
        .select(col("id_a"), col("id_b")).cache()
      val embExact = Dedup.embeddingPairsExact(emb, "vec_id", "embedding", threshold = 0.25).cache()
      val nL = lsh.count(); val nE = embExact.count()
      val missedE = embExact.join(lsh, Seq("id_a", "id_b"), "left_anti").count()
      val extraE = lsh.join(embExact, Seq("id_a", "id_b"), "left_anti").count()
      println(s"embedding: lsh=$nL exact=$nE missed=$missedE extra=$extraE")

      // --- winnow fingerprint count bounds per doc
      val wstats = docs.select(col("doc_id"),
        size(TextAnalysis.winnowFingerprint(col("text"), k = 5, w = 4)).cast("long").as("s"),
        length(regexp_replace(lower(col("text")), "[\\s]+", " ")).cast("long").as("normlen"),
        size(graft.functions.TextHashFunctions.shingleHashes(col("text"), 5)).cast("long").as("g"))
        .withColumn("m", greatest(col("normlen") - 4, lit(0)))
        .withColumn("windows", greatest(col("m") - 3, lit(0)))
      val viol = wstats.filter(
        !(col("s") <= least(col("windows"), col("g"))) ||
        (col("windows") > 0 && col("s") < 1) ||
        (col("g") === col("m") && col("windows") > 0 && col("s") < ceil(col("windows") / lit(4.0))))
      println(s"winnowstats: violations=${viol.count()}")
      viol.show(5, false)
      sim.unpersist(); exact.unpersist(); win.unpersist(); exact2.unpersist()
      lsh.unpersist(); embExact.unpersist()
    }
    spark.stop()
  }
}
