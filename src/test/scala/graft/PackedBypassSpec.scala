package graft

import graft.gen.Q4112Gen
import graft.model.GenConfig
import graft.ops.Q4112
import org.apache.spark.sql.functions._

/** Plan + correctness pinning for the packed bypass variant: the slim
  * (group, v) exchange packs both into one long column, and the
  * post-shuffle groupBy on the unpack expression must REUSE the
  * repartition exchange (canonicalized expression match) — exactly one
  * Exchange in the plan, else the packing saves nothing.
  */
class PackedBypassSpec extends SparkSpec {

  private val cfg = GenConfig(500, 0.8, 999, 20000, 0.7, 999, 40, 4, 0.5, seed = 11)

  test("packed bypass plan has exactly one exchange and matches the hash plan") {
    val items = Q4112Gen.items(spark, cfg).toDF()
    val orders = Q4112Gen.orders(spark, cfg).toDF()
    val df = Q4112.part2BypassPacked(items, orders, "id", "itemId", "price",
      "quantity", "storeId", numPartitions = 7)
    val plan = df.queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nExchanges == 1, s"expected 1 exchange, got $nExchanges:\n$plan")
    val hash = Q4112.part2(items, orders, "id", "itemId", "price", "quantity", "storeId")
      .collect().head.getLong(0)
    assert(df.collect().head.getLong(0) === hash)
  }
}
