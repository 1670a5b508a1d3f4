package graft

import org.scalatest.funsuite.AnyFunSuite

class BoundedModelCacheSpec extends AnyFunSuite {

  test("caches on hit, trains once per key") {
    val c = new graft.ops.BoundedModelCache[String, String](capacity = 4)
    var trains = 0
    def t(k: String): String = c.getOrElseTrain(k) { trains += 1; k.toUpperCase }
    assert(t("a") === "A"); assert(t("a") === "A"); assert(t("b") === "B")
    assert(trains === 2)
  }

  test("evicts least-recently-used beyond capacity") {
    val c = new graft.ops.BoundedModelCache[Int, Int](capacity = 2)
    var trains = 0
    def t(k: Int): Int = c.getOrElseTrain(k) { trains += 1; k * 10 }
    t(1); t(2)      // cache: [1, 2]
    t(1)            // touch 1 → LRU order [2, 1]
    t(3)            // evicts 2
    assert(trains === 3)
    t(1)            // still cached
    assert(trains === 3)
    t(2)            // was evicted → retrains
    assert(trains === 4)
  }

  test("concurrent misses on one key settle on a single value") {
    val c = new graft.ops.BoundedModelCache[String, java.lang.Long](capacity = 4)
    val n = 16
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    val results = try {
      import scala.jdk.CollectionConverters._
      val tasks = (1 to n).map { i =>
        (() => c.getOrElseTrain("k") {
          Thread.sleep(10); java.lang.Long.valueOf(i.toLong)
        }): java.util.concurrent.Callable[java.lang.Long]
      }
      pool.invokeAll(tasks.asJava).asScala.map(_.get())
    } finally pool.shutdown()
    // trainers may race, but every caller must observe the SAME winner
    assert(results.toSet.size === 1, s"divergent cached values: $results")
  }
}
