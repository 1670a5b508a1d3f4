package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink helpers (SURVEY §2.1 generalized).
  *
  * Parquet in/out is the engine's native format (columnar, prunable,
  * splittable). Bucketed tables are the co-located-join path: two facts
  * bucketed by the same key into the same bucket count join with NO
  * exchange on either side — the 100 TB answer to "this join shuffles
  * both sides every night". The shuffle is paid once at write time.
  */
object Tables {

  /** Write `df` as a bucketed, sorted managed table: `buckets` files per
    * partition keyed by `keys`, each bucket sorted — a sort-merge join
    * between two tables bucketed the same way needs neither exchange nor
    * sort.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      keys: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Append one CSV line per row — the reference's benchmark sink
    * (q4112_main.c:111-132 semantics).
    */
  def appendCsv(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Append).option("header", "false").csv(dir)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
