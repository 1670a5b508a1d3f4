package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout: correctness of the Morton value and a MEASURED
  * pruning comparison — the candidate-file count for a point predicate
  * on the second key under (a) a linear sort on the first key vs (b)
  * the z-ordered layout. (b) must prune most files; (a) by construction
  * cannot prune any (every file spans the full suppkey range).
  */
class LayoutSpec extends SparkSpec {

  test("morton interleave round-trips the bit definition") {
    val df = spark.range(0, 512).select(
      (col("id") % 19).as("a"), (col("id") % 23).as("b"))
    val rows = df.select(col("a"), col("b"),
      Layout.mortonInterleave(col("a"), col("b"), 21).as("z")).collect()
    rows.foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val expected = (0 until 21).map { i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
      assert(z === expected, s"a=$a b=$b")
    }
  }

  test("z-order prunes files on the non-sort column; linear sort cannot") {
    import java.nio.file.{Files, Paths}
    val base = Files.createTempDirectory("graft-layout").toString
    val li = Engine.table(spark, "/root/testdata/sf0.01", "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val files = 32
    // (a) linear: range-partitioned + sorted on partkey only
    li.repartitionByRange(files, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.parquet(s"$base/linear")
    // (b) z-ordered on (partkey, suppkey)
    Layout.writeZOrdered(li, s"$base/zorder", "l_partkey", "l_suppkey", files)

    // identical content either way
    val n = li.count()
    assert(spark.read.parquet(s"$base/linear").count() === n)
    assert(spark.read.parquet(s"$base/zorder").count() === n)

    // per-file [min, max] of the NON-sort column — exactly the stats a
    // min/max-indexed reader (parquet row groups, a file-stats catalog)
    // prunes with
    def fileRanges(dir: String): Seq[(String, Long, Long)] =
      new java.io.File(dir).listFiles().map(_.toString)
        .filter(p => p.endsWith(".parquet")).toSeq
        .map { p =>
          val r = spark.read.parquet(p)
            .agg(min(col("l_suppkey")), max(col("l_suppkey"))).head()
          (p, r.getLong(0), r.getLong(1))
        }
    val linear = fileRanges(s"$base/linear")
    val zorder = fileRanges(s"$base/zorder")
    assert(linear.size === files && zorder.size === files)

    // candidate files admitting `l_suppkey = probe`, averaged over probes
    val probes = Seq(3L, 17L, 41L, 77L, 98L)
    def candidates(ranges: Seq[(String, Long, Long)], v: Long): Int =
      ranges.count { case (_, lo, hi) => lo <= v && v <= hi }
    val linAvg = probes.map(candidates(linear, _)).sum.toDouble / probes.size
    val zAvg = probes.map(candidates(zorder, _)).sum.toDouble / probes.size
    // linear layout: every file spans ~the whole suppkey domain
    assert(linAvg > files * 0.8, s"linear unexpectedly prunable: $linAvg")
    // z-order: most files excluded for a point predicate
    assert(zAvg <= files * 0.5, s"z-order pruned too little: $zAvg of $files")
    assert(zAvg < linAvg / 2.0, s"z-order ($zAvg) not clearly better ($linAvg)")
  }

  test("z-order survives mixed-sign key domains wider than Long.MaxValue") {
    import spark.implicits._
    // signed-hash-like keys: domain width maxA - minA wraps Long; the
    // old Long-space normalization collapsed every row to one z bucket
    val n = 4096
    val df = (0 until n).map { i =>
      (Long.MinValue / 2 + i.toLong * (Long.MaxValue / (n / 2)), i.toLong % 64)
    }.toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft_zwide").toString + "/t"
    graft.ops.Layout.writeZOrdered(df, dir, "a", "b", files = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() === n.toLong)
    // the layout actually spread: more than one non-empty output file
    val nFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-") && f.length() > 0)
    assert(nFiles >= 2, s"z layout collapsed to $nFiles file(s)")
  }

  test("z-order write of an empty input produces an empty dataset, not an NPE") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b").filter(col("a") < 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_zempty").toString + "/t"
    graft.ops.Layout.writeZOrdered(df, dir, "a", "b", files = 4)
    assert(spark.read.parquet(dir).count() === 0L)
  }
}
