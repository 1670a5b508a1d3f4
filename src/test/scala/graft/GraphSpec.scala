package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def tri(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val r = Graph.triangleCount(edges.toDF("src", "dst"), "src", "dst")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("triangleCount: K4 has 4 triangles") {
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    assert(tri(k4) === ((4L, 6L, 4L)))
  }

  test("triangleCount normalizes duplicates, reversed edges, and self-loops") {
    // triangle {1,2,3} given as a mess: duplicates, both directions,
    // a self-loop, plus a pendant edge (no extra triangle)
    val messy = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (1L, 3L),
      (2L, 2L), // self-loop: dropped
      (3L, 4L)) // pendant
    assert(tri(messy) === ((4L, 4L, 1L)))
  }

  test("triangleCount: triangle-free graph (star) counts zero") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(tri(star) === ((5L, 4L, 0L)))
  }

  test("triangleCount: two disjoint triangles") {
    val two = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    assert(tri(two) === ((6L, 6L, 2L)))
  }
}
