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

  test("degree orientation bounds wedge fan-out at a mid-id hub") {
    // hub id 10 with 18 neighbors (ids 1-9 and 11-19) + two chords: the
    // skew case raw id-orientation does NOT bound — the hub sits mid-id,
    // so 9 in-edges × 9 out-edges = 81 wedges fan out at it. Degree
    // orientation ranks the hub last (max degree), every hub edge points
    // INTO it, and the only wedges left are the two chord paths.
    val hub = 10L
    val edges = (((1L to 9L) ++ (11L to 19L)).map(l => (l, hub)) ++
      Seq((1L, 2L), (11L, 12L))).toDF("src", "dst")
    val norm = Graph.normalizeEdges(edges, "src", "dst")
    val degWedges = Graph.wedges(Graph.orientByDegree(norm)).count()
    val idWedges = Graph.wedges(
      norm.select(col("lo").as("u"), col("hi").as("w"))).count()
    assert(degWedges === 2L, "degree orientation: only the 2 chord wedges")
    assert(idWedges >= 81L, s"id orientation fans out at the hub: $idWedges")
    // the oriented enumeration still counts exactly
    assert(tri(edges.as[(Long, Long)].collect().toSeq) === ((19L, 20L, 2L)))
  }

  test("pageRank tolAbs=0 stops early at a fixed point, matching the full run") {
    // K3 is at the fixed point immediately (symmetric: every update maps
    // scale → scale), so the delta probe stops the loop after round 1;
    // a zero-delta round proves all later rounds identical, so the
    // early-stopped result must be bit-identical to the 10-round run
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val (early, rounds) = Graph.pageRankWithRounds(
      pairs, "id_a", "id_b", iterations = 10, tolAbs = 0L)
    val full = Graph.pageRankFixedPoint(pairs, "id_a", "id_b", iterations = 10)
    assert(rounds < 10, s"expected early stop, ran $rounds rounds")
    assert(early.as[(Long, Long)].collect().toMap ===
      full.as[(Long, Long)].collect().toMap)
  }

  test("pageRank tolAbs disabled keeps the fixed-round behavior") {
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val (_, rounds) = Graph.pageRankWithRounds(
      pairs, "id_a", "id_b", iterations = 4)
    assert(rounds === 4)
  }

  test("kCore peels cascading tails and keeps exactly the max subgraph of min degree k") {
    // triangle {1,2,3} + chain 3-4-5-6: peeling at k=2 must remove
    // 6 (deg 1), then 5, then 4 — a 3-round cascade — leaving the
    // triangle; duplicate/reversed/self edges must not inflate degrees
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (2L, 1L), (3L, 3L), (1L, 2L)).toDF("s", "d")
    val core = Graph.kCore(edges, "s", "d", k = 2)
      .as[Long].collect().sorted.toSeq
    assert(core === Seq(1L, 2L, 3L))
  }

  test("kCore of a graph already at the fixpoint returns it unchanged") {
    // 4-cycle: every node has degree 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "d")
    assert(Graph.kCore(edges, "s", "d", k = 2)
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    assert(Graph.kCore(edges, "s", "d", k = 3).count() === 0L)
  }

  test("kCore maxRounds caps the peel like the oracle's fixed unroll") {
    // path 1-2-3-4-5-6-7: k=2 peels one node from each end per round;
    // maxRounds=1 applies at most ONE peel (odd cap exercises the
    // partial block), leaving the inner path 2..6
    val edges = (1L to 6L).map(i => (i, i + 1)).toDF("s", "d")
    val capped = Graph.kCore(edges, "s", "d", k = 2, maxRounds = 1)
      .as[Long].collect().sorted.toSeq
    assert(capped === (2L to 6L))
    assert(Graph.kCore(edges, "s", "d", k = 2).count() === 0L)
  }

  test("mutualEdges keeps exactly the reciprocated pairs, once each") {
    val knn = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L))
      .toDF("probe_id", "corpus_id")
    val got = ops.Similarity.mutualEdges(knn)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 2L), (3L, 4L)))
  }

  test("labelPropagation partitions two triangles across a bridge, by hand") {
    // triangles {1,2,3} and {4,5,6} joined by bridge 3-4; the sync
    // min-tie-break recurrence hand-unrolled for 4 rounds gives
    // communities 1 (left) and 3 (right) — any tie-break or round-order
    // deviation changes the labels
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("s", "d")
    val got = Graph.labelPropagation(edges, "s", "d", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
    // determinism: a rerun is identical
    val again = Graph.labelPropagation(edges, "s", "d", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(again === got)
  }

  test("pageRankDirected matches a driver-side integer replica with dangling mass") {
    // directed: 1→2, 1→3, 2→3, 4→1; node 3 is dangling (out-degree 0)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 1L)).toDF("s", "d")
    val scale = 1000000L
    val iters = 5
    val got = Graph.pageRankDirected(edges, "s", "d", iterations = iters,
      scale = scale).as[(Long, Long)].collect().toMap
    // independent replica: pure Scala integer recurrence
    val out = Map(1L -> Seq(2L, 3L), 2L -> Seq(3L), 4L -> Seq(1L))
    val nodes = Seq(1L, 2L, 3L, 4L)
    val base = scale * 15L / 100L
    var score = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val dmass = nodes.filter(n => !out.contains(n)).map(score).sum
      val share = dmass / nodes.size
      val insum = nodes.map { n =>
        n -> nodes.filter(s => out.getOrElse(s, Nil).contains(n))
          .map(s => score(s) / out(s).size).sum
      }.toMap
      score = nodes.map(n => n -> (base + (85L * (insum(n) + share)) / 100L)).toMap
    }
    assert(got === score)
    // the dangling node's mass actually moved: node 3 (sink) must score
    // above base+share-only nodes would without redistribution
    assert(got(3L) > got(4L)) // 4 has no in-edges: base + share only
  }

  test("pageRankDirected with no dangling nodes reduces to plain directed power iteration") {
    // 2-cycle: 1→2, 2→1 — no dangling mass, share = 0 every round
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val got = Graph.pageRankDirected(edges, "s", "d", iterations = 3)
      .as[(Long, Long)].collect().toMap
    // symmetric 2-cycle: both nodes keep score = base + 0.85*scale
    // exactly at every round (1000000 -> 150000 + 850000 = 1000000)
    assert(got === Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("neighbor Jaccard wedge arithmetic on a hand graph") {
    // triangle 1-2-3 plus pendant 4 on node 1:
    //   edge (1,2): common = {3}, union = N(1)\{2} ∪ N(2)\{1} = {3,4} → 1/2
    //   edge (2,3): common = {1}, union = {1} → 1/1
    //   edge (1,4): common = {},  union = {2,3} → 0/2
    val mutual = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("src", "dst")
    val got = Graph.neighborJaccard(mutual)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 2L, 1L, 2L), (1L, 3L, 1L, 2L), (2L, 3L, 1L, 1L), (1L, 4L, 0L, 2L)))
  }

  test("neighbor Jaccard is orientation-independent (edges stored src > dst)") {
    // same hand graph, every edge flipped: counts must be identical,
    // keyed by the caller's orientation — the wedge keys are canonical
    // (least, greatest), not the storage order
    val flipped = Seq((2L, 1L), (3L, 1L), (3L, 2L), (4L, 1L)).toDF("src", "dst")
    val got = Graph.neighborJaccard(flipped)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (2L, 1L, 1L, 2L), (3L, 1L, 1L, 2L), (3L, 2L, 1L, 1L), (4L, 1L, 0L, 2L)))
  }
}
