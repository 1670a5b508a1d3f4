package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Q4112

/** Driver contract — see SURVEY.md §7.
  *
  * Every operator from SURVEY.md §2 (plus the beyond-reference pipeline
  * operators) is exposed as a named query over the driver testdata
  * (TESTDATA.md), with a DuckDB-equivalent oracle SQL where expressible.
  *
  * q4112 → testdata mapping: items := part(p_partkey, floor(p_retailprice)),
  * orders := lineitem(l_partkey FK, l_suppkey group key, floor(l_quantity)).
  * Doubles are floored to Long on ingest so the whole pipeline keeps the
  * reference's integer-only arithmetic (4112_project_2.pdf p.3).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  /** items-analog: (p_partkey, price: Long). */
  private def partItems(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(col("p_partkey"), floor(col("p_retailprice")).as("price"))

  /** orders-analog: (l_partkey, l_suppkey, quantity: Long). */
  private def liOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), floor(col("l_quantity")).as("quantity"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q4112_part2")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 + J3: broadcast hash join + ungrouped integer AVG (part 1)
    "q4112_part1" -> ((s, dir) =>
      Q4112.part1(partItems(s, dir), liOrders(s, dir),
        "p_partkey", "l_partkey", "price", "quantity", Q4112.BroadcastHash)),
    // J4-analog: same query, shuffled-hash strategy (reference's q4112_hj)
    "q4112_part1_shuffle_hash" -> ((s, dir) =>
      Q4112.part1(partItems(s, dir), liOrders(s, dir),
        "p_partkey", "l_partkey", "price", "quantity", Q4112.ShuffledHash)
        .withColumnRenamed("avg_value", "avg_value_sh")),
    // J1/J2-analog: sort-merge strategy as the third physical engine
    "q4112_part1_sort_merge" -> ((s, dir) =>
      Q4112.part1(partItems(s, dir), liOrders(s, dir),
        "p_partkey", "l_partkey", "price", "quantity", Q4112.SortMerge)
        .withColumnRenamed("avg_value", "avg_value_sm")),
    // A2 + A4 first level: per-group integer AVG
    "q4112_grouped" -> ((s, dir) =>
      Q4112.grouped(partItems(s, dir), liOrders(s, dir),
        "p_partkey", "l_partkey", "price", "quantity", "l_suppkey", Q4112.BroadcastHash)),
    // A4: full two-level query — integer avg of per-group integer avgs
    "q4112_part2" -> ((s, dir) =>
      Q4112.part2(partItems(s, dir), liOrders(s, dir),
        "p_partkey", "l_partkey", "price", "quantity", "l_suppkey", Q4112.BroadcastHash)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = {
    val p1 =
      """SELECT cast(sum(cast(floor(p_retailprice) as bigint) * cast(floor(l_quantity) as bigint))
        |        // count(*) as bigint) AS %s
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin
    val groupedCte =
      """SELECT l_suppkey,
        |       cast(sum(cast(floor(p_retailprice) as bigint) * cast(floor(l_quantity) as bigint))
        |            // count(*) as bigint) AS avg_value
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY l_suppkey""".stripMargin
    Map(
      "q4112_part1" -> p1.format("avg_value"),
      "q4112_part1_shuffle_hash" -> p1.format("avg_value_sh"),
      "q4112_part1_sort_merge" -> p1.format("avg_value_sm"),
      "q4112_grouped" -> groupedCte,
      "q4112_part2" ->
        s"""WITH g AS ($groupedCte)
           |SELECT cast(sum(avg_value) // count(*) as bigint) AS avg_avg_value FROM g""".stripMargin,
    )
  }
}
