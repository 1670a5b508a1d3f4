package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** In-flight data-quality metrics via `Dataset.observe`: the metrics
  * ride the ACTION's single pass as accumulator-style aggregates — at
  * 100 TB a pipeline gets its row counts / null counts / bounds for
  * free while writing, instead of paying a second full scan for a
  * separate DQ aggregate. The spec pins the contract: observed values
  * equal a standalone aggregation of the same expressions.
  */
class ObservationSpec extends SparkSpec {

  test("observe() metrics on the write pass equal a standalone DQ aggregate") {
    val events = Engine.eventsTable(spark, sfDir)
    val obs = Observation("dq")
    val observed = events.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col("props").isNull, 1L).otherwise(0L)).as("n_null_props"),
      sum(when(col("value") < 0, 1L).otherwise(0L)).as("n_neg_value"),
      min(col("value")).as("min_value"))
    // the action whose pass the metrics ride (a real pipeline writes)
    observed.write.format("noop").mode("overwrite").save()
    val m = obs.get

    val expected = events.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("props").isNull, 1L).otherwise(0L)).as("n_null_props"),
      sum(when(col("value") < 0, 1L).otherwise(0L)).as("n_neg_value"),
      min(col("value")).as("min_value")).head()

    assert(m("n_rows") === expected.getAs[Long]("n_rows"))
    assert(m("n_null_props") === expected.getAs[Long]("n_null_props"))
    assert(m("n_neg_value") === expected.getAs[Long]("n_neg_value"))
    assert(m("min_value") === expected.getAs[Double]("min_value"))
    assert(m("n_rows").asInstanceOf[Long] > 0L)
  }
}
