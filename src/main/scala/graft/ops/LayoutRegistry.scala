package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Session-scoped registry mapping a RELATION (by canonicalized plan —
  * Spark's own `sameResult` notion) to a better-stored LAYOUT of the
  * same data, so the adaptive planners can route a query to an
  * exchange-free plan the user already paid for at ingest, without the
  * user having to know the layout exists (round-8 verdict item 1: the
  * bucketed/joined-bucketed layouts benched at 0.16-1.09× the reference
  * while the cold auto plans sat at 2.4-13×, and nothing routed to
  * them).
  *
  * Two layout kinds, mirroring the two gated writers:
  *
  *  - BUCKETED: the same rows stored hash-clustered on one key
  *    (Tables.writeBucketed's layout). Substituting it for the source
  *    relation is sound for ANY query — same schema, same rows — and a
  *    grouped aggregate on the cluster key becomes exchange-free.
  *  - JOINED-BUCKETED: the query-specific (group, v = price·quantity)
  *    projection of items⋈orders, stored clustered on the group key.
  *    Substituting is sound only for the q4112 aggregate over exactly
  *    those inputs, so the key carries BOTH canonicalized input plans
  *    and every column name.
  *
  * Staleness contract — identical to every relation-keyed cache here
  * (Q4112.denseCache, Similarity.knnCache): a canonicalized-equal plan
  * over CHANGED underlying data returns the stale layout; callers that
  * replace data under an unchanged plan must [[clear]] at the boundary
  * (Q4112.clearRelationCaches does it). Registration is validated: the
  * layout scan must actually report the clustering
  * (Q4112.clusteredOn), so a registry hit is always the exchange-free
  * plan, never a silent re-shuffle.
  */
object LayoutRegistry {

  private final case class BucketedKey(plan: LogicalPlan, key: String)
  private final case class JoinedKey(
      items: LogicalPlan, orders: LogicalPlan,
      itemKey: String, orderKey: String,
      priceCol: String, quantityCol: String, groupCol: String)

  private val bucketed =
    new java.util.concurrent.ConcurrentHashMap[BucketedKey, DataFrame]
  private val joined =
    new java.util.concurrent.ConcurrentHashMap[JoinedKey, DataFrame]

  private def canon(df: DataFrame): LogicalPlan =
    df.queryExecution.optimizedPlan.canonicalized

  /** Register `layout` as the bucketed form of `source` on `key`.
    * `layout` must hold the SAME rows/schema as `source` and its scan
    * must report hash clustering on `key` (checked).
    */
  def registerBucketed(source: DataFrame, key: String, layout: DataFrame): Unit = {
    require(Q4112.clusteredOn(layout, key),
      s"layout scan is not hash-clustered on '$key' — nothing to route to")
    bucketed.put(BucketedKey(canon(source), key.toLowerCase), layout)
  }

  def bucketedFor(source: DataFrame, key: String): Option[DataFrame] =
    Option(bucketed.get(BucketedKey(canon(source), key.toLowerCase)))

  /** Register `layout` as the materialized (groupCol, v) projection of
    * items⋈orders clustered on the group key. The layout must expose
    * exactly the columns (`groupCol`, "v") and report the clustering
    * (checked) — [[Q4112.part2Adaptive]] aggregates it directly.
    */
  def registerJoined(
      items: DataFrame, orders: DataFrame,
      itemKey: String, orderKey: String,
      priceCol: String, quantityCol: String, groupCol: String,
      layout: DataFrame): Unit = {
    require(Q4112.clusteredOn(layout, groupCol),
      s"joined layout scan is not hash-clustered on '$groupCol'")
    val names = layout.columns.map(_.toLowerCase).toSet
    require(names.contains(groupCol.toLowerCase) && names.contains("v"),
      s"joined layout must expose ($groupCol, v); has ${layout.columns.mkString(",")}")
    joined.put(JoinedKey(canon(items), canon(orders),
      itemKey.toLowerCase, orderKey.toLowerCase,
      priceCol.toLowerCase, quantityCol.toLowerCase, groupCol.toLowerCase), layout)
  }

  def joinedFor(
      items: DataFrame, orders: DataFrame,
      itemKey: String, orderKey: String,
      priceCol: String, quantityCol: String, groupCol: String): Option[DataFrame] =
    Option(joined.get(JoinedKey(canon(items), canon(orders),
      itemKey.toLowerCase, orderKey.toLowerCase,
      priceCol.toLowerCase, quantityCol.toLowerCase, groupCol.toLowerCase)))

  def clear(): Unit = { bucketed.clear(); joined.clear() }
}
