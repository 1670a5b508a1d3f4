package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over pairwise-similarity edge lists (the output shape
  * of the dedup family). Beyond-reference capability: the reference has
  * no graph operators (SURVEY.md §2.5); these follow the same iterative
  * distributed-fixpoint shape as [[Dedup.connectedComponents]].
  */
object Graph {

  /** Shuffle partitions for an iterative fixpoint loop, sized to the
    * edge count (~200k slim rows per reduce task) and capped at the
    * session's configured parallelism. AQE coalesces tiny shuffles
    * per-stage, but an iterative loop pays per-ROUND fixed costs (task
    * scheduling, stage setup) that only plan-time sizing removes:
    * 10 rounds × 32-task stages on a 1.2M-edge graph is scheduling
    * overhead, not compute. At cluster scale `rows/200k` exceeds the
    * configured partitions and this is a no-op.
    */
  private[ops] def iterPartitions(df: DataFrame, rows: Long): Int = {
    val conf = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    math.max(1, math.min(conf, math.ceil(rows / 200000.0).toInt))
  }

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to
    * `n`. Safe for eager loop bodies (every round materializes via
    * localCheckpoint before the conf is restored).
    */
  private[ops] def withShufflePartitions[T](
      df: DataFrame, n: Int)(body: => T): T = {
    val conf = df.sparkSession.conf
    val old = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally conf.set("spark.sql.shuffle.partitions", old)
  }

  /** PageRank in 64-bit fixed-point integer arithmetic — every score is
    * `score_float * scale` rounded down, all updates are integer
    * multiply/floor-divide, so the result is bit-deterministic for any
    * partitioning, join order, or summation order (float PageRank is
    * not: cross-row double sums reorder under shuffle). Determinism is
    * what makes the operator ORACLE-CHECKABLE; the cost is ≤1/scale
    * absolute error per damping step, irrelevant for ranking.
    *
    * Standard damped formulation on the symmetrized edge list:
    * `score'(d) = 0.15·scale + 0.85 · Σ_{s→d} score(s) div deg(s)`,
    * `iterations` fixed rounds (power iteration; convergence for ranking
    * typically <10 rounds on shallow similarity graphs).
    *
    * Each round is one hash-join (edges ⋈ scores, shuffles slim
    * (node, long) rows) plus one aggregation — the distributed Pregel
    * shape; nothing graph-sized ever reaches the driver.
    *
    * Output: (node, pagerank: Long).
    */
  def pageRankFixedPoint(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      iterations: Int = 10,
      scale: Long = 1000000L): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .cache()
    // materializes the edge cache and sizes the per-round shuffles
    val nEdges = edges.count()
    var scores: DataFrame = null
    withShufflePartitions(edges, iterPartitions(edges, nEdges)) {
      // symmetric edges: every node has out-degree = in-degree ≥ 1, so
      // there is no dangling mass and deg doubles as the node list
      val degrees = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).cache()
      val base = scale * 15L / 100L
      // join degrees into the edge list ONCE: per-iteration work is then a
      // single equi-join + aggregation over slim (src, dst, deg) rows
      val edgesDeg = edges.join(degrees, Seq("src")).cache()
      scores = degrees.select(col("src").as("node"), lit(scale).as("score"))
      for (_ <- 1 to iterations) {
        // the symmetrized distinct edge list gives every node in-degree
        // ≥ 1, so the per-dst aggregate already covers the full node set
        // — no nodes-side outer join (one fewer join+broadcast per
        // round); dangling-node handling would need it back
        val next = edgesDeg
          .join(scores, edgesDeg("src") === scores("node"))
          .select(col("dst").as("node"), expr("score div deg").as("contrib"))
          .groupBy(col("node"))
          .agg(sum(col("contrib")).as("insum"))
          .select(col("node"),
            (lit(base) + expr("(85 * insum) div 100")).as("score"))
        // truncate lineage every round with an eager localCheckpoint: a
        // lazy i-deep join tree makes each stage replan the whole prefix,
        // and a cache() chain is worse — unpersisting round i-1 makes the
        // CacheManager invalidate round i's dependent entry (non-cascading
        // uncache re-plans dependents and discards their data), so every
        // round recomputes the full chain (measured: per-round wall clock
        // DOUBLED, 1.3s → 31s by round 10 at sf0.1). The checkpointed
        // table is one slim (node, long) row per node; superseded rounds
        // are dropped by the ContextCleaner once unreferenced. On a real
        // cluster use reliable checkpoint() if executor loss matters —
        // localCheckpoint trades fault-tolerance for speed.
        scores = next.localCheckpoint(true)
      }
    }
    // edges/degrees stay cached: the returned plan references them once
    // per iteration, and the caller's single action executes that plan
    // after this method returns (unpersisting here would recompute the
    // pair generation `iterations` times)
    scores.withColumnRenamed("score", "pagerank")
  }

  /** Exact triangle count over an undirected simple graph given as a
    * (src, dst) edge list (self-loops and duplicate/reversed edges are
    * normalized away). The classic distributed edge-ordering
    * enumeration: orient every edge low→high, join wedges (a<b, b<c) on
    * the middle node, then close each wedge with a semi-join against the
    * oriented edge set — each triangle a<b<c is counted exactly once.
    *
    * 100 TB shape: two equi-join shuffles over slim (long, long) rows;
    * orientation bounds the wedge fan-out by the SQRT-degeneracy
    * direction (a high-degree hub only generates wedges toward
    * higher-numbered nodes). Output: 1 row (n_nodes, n_edges,
    * n_triangles).
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val oriented = edges
      .select(least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .filter(col("lo") < col("hi"))
      .distinct()
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.hi") === col("e2.lo"))
      .select(col("e1.lo").as("a"), col("e1.hi").as("b"), col("e2.hi").as("c"))
    val tri = wedges
      .join(oriented.select(col("lo").as("a"), col("hi").as("c")),
        Seq("a", "c"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val nodes = oriented.select(explode(array(col("lo"), col("hi"))).as("n"))
      .agg(countDistinct(col("n")).as("n_nodes"))
    val ne = oriented.agg(count(lit(1)).as("n_edges"))
    nodes.crossJoin(ne).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }
}
