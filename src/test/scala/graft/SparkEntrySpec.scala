package graft

/** Driver-contract smoke: every named query runs on sf0.001 and returns
  * rows; every oracle key maps to a real query; the flagship entry works.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name returns rows on sf0.001") {
      assert(fn(spark, sfDir).count() > 0, s"$name returned 0 rows")
    }
  }
}
