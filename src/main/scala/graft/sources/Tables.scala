package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

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

  /** CSV source with an EXPLICIT schema — at corpus scale schema
    * inference is a full extra pass over the data, so it is opt-in only
    * (`inferSchema = true` for ad-hoc exploration).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType = null,
      header: Boolean = true, inferSchema: Boolean = false): DataFrame = {
    val r = spark.read.option("header", header.toString)
    val withSchema =
      if (schema != null) r.schema(schema)
      else r.option("inferSchema", inferSchema.toString)
    withSchema.csv(path)
  }

  /** JSON-lines source, explicit schema for the same reason: without one
    * Spark samples the whole input to infer, and corrupt rows land in
    * `_corrupt_record` instead of failing the pipeline.
    */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType = null): DataFrame = {
    val r = spark.read
    (if (schema != null) r.schema(schema) else r).json(path)
  }

  /** Hive-style partitioned parquet: one directory per `partitionCols`
    * value combination, so per-partition predicates prune whole
    * directories at planning time (zero I/O for untouched partitions) —
    * the standard 100 TB table layout (partition by date/tenant, bucket
    * by join key within).
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** JSON-lines sink (interchange with non-columnar consumers). */
  def writeJsonLines(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** ORC source/sink — the other columnar interchange format (Hive
    * ecosystems). Same pushdown/pruning contract as parquet: predicates
    * and column selection reach the stripe reader.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)
}
