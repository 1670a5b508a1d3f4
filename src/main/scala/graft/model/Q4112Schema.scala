package graft.model

/** The reference's two relations (q4112.h:13-31 in /root/reference).
  *
  * All stored columns are uint32 in the reference; Scala has no unsigned
  * 32-bit type and `price * quantity` is widened to uint64 before the
  * multiply (q4112_hj_1.c:64), so we model every column as Long and keep
  * all arithmetic in 64-bit integers — bit-exact with the C semantics at
  * every scale where the sum stays below 2^63 (all test scales do).
  */
final case class Item(id: Long, price: Long)

/** orders(item_id FK, store_id grouping key, quantity). `storeId` is 0-free
  * in the reference (q4112.h:26); we keep natural Longs and no sentinel —
  * Spark handles absence natively.
  */
final case class Order(itemId: Long, storeId: Long, quantity: Long)

/** Generator parameter surface, 1:1 with q4112_gen's contract
  * (q4112.h:19-41, parsed at q4112_main.c:45-56).
  */
final case class GenConfig(
    innerTuples: Long,
    innerSelectivity: Double, // P(items.id matches some orders row class), (0.1, 1]
    innerValMax: Long,        // price ∈ [0, innerValMax]
    outerTuples: Long,
    outerSelectivity: Double, // P(orders.item_id ∈ items), (0.1, 1]
    outerValMax: Long,        // quantity ∈ [0, outerValMax]
    groups: Long,             // distinct store_ids; 0 = ungrouped (part 1)
    hhGroups: Long,           // heavy-hitter group count (≤ groups)
    hhProbability: Double,    // fraction of rows routed to the hh groups
    seed: Long) {
  require(innerTuples > 0 && outerTuples > 0)
  require(innerSelectivity > 0.0 && innerSelectivity <= 1.0)
  require(outerSelectivity > 0.0 && outerSelectivity <= 1.0)
  // mirror of q4112_main.c:63-64
  require(outerTuples * outerSelectivity >= innerTuples * innerSelectivity,
    "matching outer rows must cover matching inner rows")
  require(hhGroups <= groups)
  require(hhProbability >= 0.0 && hhProbability <= 1.0)
}
