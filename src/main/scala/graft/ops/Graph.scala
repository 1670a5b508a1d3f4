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
    * up to `iterations` rounds (power iteration; convergence for ranking
    * typically <10 rounds on shallow similarity graphs).
    *
    * `tolAbs ≥ 0` makes `iterations` a CAP instead of a constant: after
    * each round the max per-node |Δscore| is probed (one slim
    * (node, long) self-join over the already-checkpointed tables — the
    * same per-round convergence-probe pattern as
    * [[Dedup.connectedComponents]]'s Σ-labels probe) and the loop stops
    * early once maxΔ ≤ tolAbs. With tolAbs = 0 the early stop is
    * EXACT: the update is a deterministic function of the score table,
    * so a zero-delta round proves every later round is identical —
    * shallow graphs stop early, deep ones are bounded honestly by the
    * cap. tolAbs < 0 (default) keeps the fixed-round behavior.
    *
    * Dangling nodes cannot occur by construction: the input pair list is
    * symmetrized internally (both directions unioned), so every node has
    * out-degree ≥ 1 and no rank mass is lost — the no-dangling-mass
    * assumption is part of this operator's contract, not a caller
    * obligation.
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
      scale: Long = 1000000L,
      tolAbs: Long = -1L): DataFrame =
    pageRankWithRounds(pairs, aCol, bCol, iterations, scale, tolAbs)._1

  /** [[pageRankFixedPoint]] plus the number of update rounds actually
    * executed — the observable GraphSpec asserts early stopping on.
    */
  def pageRankWithRounds(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      iterations: Int = 10,
      scale: Long = 1000000L,
      tolAbs: Long = -1L): (DataFrame, Int) = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .cache()
    // materializes the edge cache and sizes the per-round shuffles
    val nEdges = edges.count()
    var scores: DataFrame = null
    var rounds = 0
    withShufflePartitions(edges, iterPartitions(edges, nEdges)) {
      // symmetric edges: every node has out-degree = in-degree ≥ 1, so
      // there is no dangling mass and deg doubles as the node list
      val degrees = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).cache()
      val base = scale * 15L / 100L
      // join degrees into the edge list ONCE: per-iteration work is then a
      // single equi-join + aggregation over slim (src, dst, deg) rows
      val edgesDeg = edges.join(degrees, Seq("src")).cache()
      scores = degrees.select(col("src").as("node"), lit(scale).as("score"))
      // one damping update: the symmetrized distinct edge list gives
      // every node in-degree ≥ 1, so the per-dst aggregate already
      // covers the full node set — no nodes-side outer join (one fewer
      // join+broadcast per round); dangling-node handling would need it
      // back. The previous scores table is consumed exactly ONCE, which
      // is what makes round-chaining below recomputation-free.
      def update(s0: DataFrame): DataFrame = edgesDeg
        .join(s0.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("score div deg").as("contrib"))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("insum"))
        .select(col("node"),
          (lit(base) + expr("(85 * insum) div 100")).as("score"))
      var converged = false
      while (rounds < iterations && !converged) {
        // fixed-round runs (tolAbs < 0) chain TWO updates per
        // materialization (optimization round 11 — the kCore/LPA
        // batching): the recurrence is a pure function of the previous
        // score table and each update consumes it once, so f∘f inside
        // one job is bit-identical to two jobs, and the per-round floor
        // on a slim (node, long) table is job dispatch + checkpoint
        // I/O, not compute. Convergence-probed runs (tolAbs ≥ 0) keep
        // one update per probe so the early stop fires on the same
        // round it always did.
        val steps = if (tolAbs >= 0L) 1 else math.min(5, iterations - rounds)
        val next = (1 to steps).foldLeft(scores)((s0, _) => update(s0))
        // truncate lineage every block with an eager localCheckpoint: a
        // lazy i-deep join tree makes each stage replan the whole prefix,
        // and a cache() chain is worse — unpersisting round i-1 makes the
        // CacheManager invalidate round i's dependent entry (non-cascading
        // uncache re-plans dependents and discards their data), so every
        // round recomputes the full chain (measured: per-round wall clock
        // DOUBLED, 1.3s → 31s at sf0.1 by round 10). The checkpointed
        // table is one slim (node, long) row per node; superseded rounds
        // are dropped by the ContextCleaner once unreferenced. On a real
        // cluster use reliable checkpoint() if executor loss matters —
        // localCheckpoint trades fault-tolerance for speed.
        val checkpointed = next.localCheckpoint(true)
        rounds += steps
        if (tolAbs >= 0L && rounds < iterations) {
          // convergence probe over the two checkpointed (node, long)
          // tables — both sides already materialized, so this is one
          // slim equi-join + max, not a recompute of the round
          val maxDelta = checkpointed.as("n")
            .join(scores.as("p"), col("n.node") === col("p.node"))
            .agg(coalesce(max(abs(col("n.score") - col("p.score"))), lit(0L)).as("d"))
            .collect()(0).getLong(0)
          converged = maxDelta <= tolAbs
        }
        scores = checkpointed
      }
    }
    // edges/degrees stay cached: the returned plan references them once
    // per iteration, and the caller's single action executes that plan
    // after this method returns (unpersisting here would recompute the
    // pair generation `iterations` times)
    (scores.withColumnRenamed("score", "pagerank"), rounds)
  }

  /** DIRECTED PageRank with dangling-mass redistribution — the one
    * standard graph capability [[pageRankFixedPoint]]'s symmetrized
    * contract excludes (its input union makes every node have
    * out-degree ≥ 1 by construction). Here edges keep their direction;
    * nodes with out-degree 0 (dangling) contribute their whole score,
    * redistributed uniformly: each round's update is
    * `score'(d) = 0.15·scale + 0.85·(Σ_{s→d} score(s) div deg(s)
    *              + danglingMass div nNodes)`,
    * all integer arithmetic (the fixed-point determinism contract of
    * the symmetrized form, unchanged). The dangling node set and node
    * count are static — computed once; the per-round extra cost is ONE
    * scalar aggregate (the dangling mass, a 1-row collect) plus a
    * nodes-side left join (nodes with in-degree 0 exist in a directed
    * graph and must keep receiving base + share).
    *
    * The truncating integer divisions drop ≤1/scale per term (the
    * share remainder and per-edge contribution remainders vanish
    * rather than redistribute), so total mass is conserved only
    * approximately — standard for fixed-point PageRank; ranking is
    * unaffected and the recurrence stays bit-replayable.
    * Output: (node, pagerank: Long) after exactly `iterations` rounds.
    */
  def pageRankDirected(
      pairs: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 10,
      scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val edges = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().cache()
    val nEdges = edges.count()
    var result: DataFrame = null
    withShufflePartitions(edges, iterPartitions(edges, nEdges)) {
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node")))
        .distinct().localCheckpoint(true)
      val nNodes = nodes.count()
      val degrees = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).cache()
      val edgesDeg = edges.join(degrees, Seq("src")).cache()
      val dangling = nodes
        .join(degrees.select(col("src").as("node")), Seq("node"), "left_anti")
        .localCheckpoint(true)
      val base = scale * 15L / 100L
      var scores = nodes.select(col("node"), lit(scale).as("score"))
        .localCheckpoint(true)
      var r = 0
      while (r < iterations) {
        // dangling mass: one scalar aggregate over the checkpointed
        // score table, folded INTO the round's plan as a 1-row cross
        // join (broadcast) — the directed mode's extra cost per round
        // is this sub-plan, not a separate driver round-trip (collect
        // per round measured ~2× the job dispatches). share = mass div
        // |nodes|: nonneg, so div's truncation equals the oracle's //.
        // (Optimization round 11 TRIED folding the mass into the
        // contrib aggregate via a virtual dangling→NULL sink edge so
        // scores is consumed once per round; measured 2.67 → 2.82 s at
        // sf0.1 — the extra scan of the CHECKPOINTED score table is
        // cheaper than making the share scalar depend on the contrib
        // aggregate's exchange being reused — so the two-consumer form
        // stays.)
        val share = scores.join(dangling, Seq("node"), "left_semi")
          .agg(coalesce(sum(col("score")), lit(0L)).as("dm"))
          .select(expr(s"dm div ${nNodes}L").as("share"))
        val contrib = edgesDeg
          .join(scores, edgesDeg("src") === scores("node"))
          .select(col("dst").as("node"), expr("score div deg").as("contrib"))
          .groupBy(col("node"))
          .agg(sum(col("contrib")).as("insum"))
        scores = nodes.join(contrib, Seq("node"), "left")
          .crossJoin(share)
          .select(col("node"),
            (lit(base) +
              expr("(85 * (coalesce(insum, 0L) + share)) div 100"))
              .as("score"))
          .localCheckpoint(true)
        r += 1
      }
      result = scores
    }
    result.withColumnRenamed("score", "pagerank")
  }

  /** Normalized undirected simple edge list: (lo, hi) with lo < hi,
    * self-loops and duplicate/reversed edges removed.
    */
  private[graft] def normalizeEdges(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .filter(col("lo") < col("hi"))
      .distinct()

  /** DEGREE-ordered orientation of a normalized edge list: each edge is
    * directed from its lower-(degree, id)-rank endpoint to the higher —
    * the orientation that actually bounds the wedge join on skewed
    * graphs. Raw id-order orientation does NOT: a mid-id hub of degree d
    * has ~d/2 in-edges and ~d/2 out-edges, so the wedge join keyed on it
    * fans out ~d²/4 rows. Under degree order a node of degree d only
    * points at nodes of degree-rank above it — at most 2m/d of them —
    * so its wedge fan-out indeg·outdeg ≤ d·(2m/d) = 2m, and the total
    * wedge count is O(m^1.5) (the arboricity bound), independent of the
    * degree distribution. (degree, id) is a total order, so each
    * triangle still has exactly one (a→b, b→c, a→c) orientation.
    * Output: (u, w) directed edges, u's rank < w's rank.
    */
  private[graft] def orientByDegree(normalized: DataFrame): DataFrame = {
    val deg = normalized
      .select(explode(array(col("lo"), col("hi"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val uFirst = struct(col("d_lo"), col("lo")) < struct(col("d_hi"), col("hi"))
    normalized
      .join(deg.select(col("n").as("lo"), col("d").as("d_lo")), Seq("lo"))
      .join(deg.select(col("n").as("hi"), col("d").as("d_hi")), Seq("hi"))
      .select(when(uFirst, col("lo")).otherwise(col("hi")).as("u"),
        when(uFirst, col("hi")).otherwise(col("lo")).as("w"))
  }

  /** Wedge enumeration over an oriented edge list: (a→b, b→c) path
    * pairs joined on the middle node. Exposed for the GraphSpec
    * orientation-fan-out assertion.
    */
  private[graft] def wedges(oriented: DataFrame): DataFrame =
    oriented.as("e1")
      .join(oriented.as("e2"), col("e1.w") === col("e2.u"))
      .select(col("e1.u").as("a"), col("e1.w").as("b"), col("e2.w").as("c"))

  /** k-core of an undirected simple graph: the (unique) maximal subgraph
    * in which every node has degree ≥ k, by iterative peeling — drop
    * all nodes of degree < k, recompute degrees, repeat to fixpoint.
    * Output: surviving nodes, one (node) row each.
    *
    * `maxRounds` is a CAP shared with the oracle's fixed-round SQL
    * unroll (the pageRankWithRounds convention): peeling is idempotent
    * at the fixpoint, so early-stopping on a zero-delta round produces
    * exactly the capped-unroll answer; a graph that hasn't converged by
    * the cap is truncated identically on both sides. Each round is two
    * semi-joins + a degree aggregate over slim (long, long) edges, with
    * an eager localCheckpoint truncating lineage (the PageRank/
    * connectedComponents lesson — an i-deep lazy join tree replans the
    * whole prefix every round). Convergence is probed by the edge
    * count, which the checkpoint has already materialized.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, maxRounds: Int = 16): DataFrame = {
    require(k >= 1 && maxRounds >= 1, "k and maxRounds must be >= 1")
    val normalized = normalizeEdges(edges, srcCol, dstCol)
    var adj = normalized
      .select(col("lo").as("u"), col("hi").as("v"))
      .union(normalized.select(col("hi").as("u"), col("lo").as("v")))
      .localCheckpoint(true)
    var nEdges = adj.count()
    // each peel round is 3 shuffles over an ever-SHRINKING slim edge
    // list — at default parallelism the per-round task-dispatch floor
    // dominates wall clock (measured 6 s → ~2 s at sf0.1), so scale
    // partitions to the data like pageRank's iteration loop does
    withShufflePartitions(adj, iterPartitions(adj, nEdges)) {
      def peelOnce(e: DataFrame): DataFrame = {
        val keep = e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select(col("u"))
        e.join(keep, Seq("u"), "left_semi")
          .join(keep.withColumnRenamed("u", "v"), Seq("v"), "left_semi")
          .select(col("u"), col("v"))
      }
      // two peels per materialization: the per-round floor is job
      // dispatch + broadcast build, not data (the edge list only
      // shrinks), so halving the checkpoint count halves wall clock.
      // Peeling is idempotent at the fixpoint, so an extra peel inside
      // a block never changes the answer — convergence is still exact
      var round = 0
      var converged = false
      while (round < maxRounds && !converged) {
        val steps = math.min(2, maxRounds - round)
        val pruned = (1 to steps).foldLeft(adj)((e, _) => peelOnce(e))
          .localCheckpoint(true)
        val n = pruned.count()
        converged = n == nEdges
        nEdges = n
        adj = pruned
        round += steps
      }
    }
    adj.select(col("u").as("node")).distinct()
  }

  /** Per-edge neighbor-set overlap (the link-prediction / community-
    * strength feature) over an undirected (src, dst) edge list:
    * n_common = |N(a) ∩ N(b)| by the wedge join (two directed-edge
    * scans equi-joined on the shared endpoint — never a per-node set
    * materialization), n_union = (deg(a)−1) + (deg(b)−1) − n_common
    * (each side excludes the other endpoint, which is a neighbor by
    * edge-ness). All integers, oracle-replayable. The wedge shuffle is
    * Σ deg² — on a mutual-kNN graph deg ≤ k, so ≤ k²·n. One shared
    * implementation serves the gate, the bench form, and the spec, so
    * the arithmetic cannot drift between them.
    */
  def neighborJaccard(mutual: DataFrame): DataFrame = {
    val dirE = mutual.select(col("src").as("u"), col("dst").as("v"))
      .union(mutual.select(col("dst").as("u"), col("src").as("v")))
    val deg = dirE.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val cn = dirE.as("x").join(dirE.as("y"),
        col("x.v") === col("y.v") && col("x.u") < col("y.u"))
      .groupBy(col("x.u").as("ca"), col("y.u").as("cb"))
      .agg(count(lit(1)).as("c"))
    // the wedge keys are canonically ordered (x.u < y.u), so probe them
    // with least/greatest of the input edge — an edge stored (5, 3)
    // must find the same wedge count as (3, 5); the output keeps the
    // caller's orientation
    mutual
      .withColumn("ca", least(col("src"), col("dst")))
      .withColumn("cb", greatest(col("src"), col("dst")))
      .join(cn, Seq("ca", "cb"), "left")
      .join(deg.select(col("u").as("src"), col("deg").as("da")), Seq("src"))
      .join(deg.select(col("u").as("dst"), col("deg").as("db")), Seq("dst"))
      .select(col("src"), col("dst"),
        coalesce(col("c"), lit(0L)).as("n_common"),
        (col("da") + col("db") - lit(2L) - coalesce(col("c"), lit(0L)))
          .as("n_union"))
  }

  /** Synchronous label-propagation community detection, fully
    * deterministic: labels start as node ids; each round every node
    * adopts the plurality label among its neighbors, ties broken toward
    * the SMALLER label — (count DESC, label ASC) is a total order, so
    * every round is a pure function of the previous labeling and the
    * whole run replays bit-for-bit in any engine (classic async LPA with
    * random tie-breaks is not oracle-checkable; this is the price and
    * it buys the gate). Runs EXACTLY `rounds` rounds — sync LPA can
    * 2-cycle on bipartite structures, so "convergence" is not a
    * well-defined stop; a fixed unroll is what the oracle replays.
    *
    * Scale shape: each round is one join of the slim (u, v) edge list
    * against the (node, label) map plus a two-level aggregate (count per
    * (u, label), then the argmax via min over (−count, label) structs —
    * partial-aggregable, no row_number sort). Rounds materialize via
    * localCheckpoint like [[kCore]]'s peel, with shuffle partitions
    * scaled to the edge count. Output: (node, community).
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 4): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val normalized = normalizeEdges(edges, srcCol, dstCol)
    val adj = normalized
      .select(col("lo").as("u"), col("hi").as("v"))
      .union(normalized.select(col("hi").as("u"), col("lo").as("v")))
      .localCheckpoint(true)
    val nEdges = adj.count()
    withShufflePartitions(adj, iterPartitions(adj, nEdges)) {
      def propagate(labels: DataFrame): DataFrame = adj
        .join(labels.withColumnRenamed("node", "v"), Seq("v"))
        .groupBy(col("u"), col("label"))
        .agg(count(lit(1)).as("c"))
        // argmax(count DESC, label ASC) == min over (-c, label): one
        // partial-aggregable pass, no per-node sort
        .groupBy(col("u"))
        .agg(min(struct((-col("c")).as("nc"), col("label"))).as("m"))
        .select(col("u").as("node"), col("m.label").as("label"))
      var labels = adj.select(col("u").as("node")).distinct()
        .select(col("node"), col("node").as("label"))
        .localCheckpoint(true)
      // two propagation rounds per materialization, like kCore's peel:
      // the per-round floor is job dispatch, not data, and chaining two
      // lazy rounds before each checkpoint is semantically identical
      // (the recurrence is a pure function of the previous labeling)
      var round = 0
      while (round < rounds) {
        val steps = math.min(2, rounds - round)
        labels = (1 to steps).foldLeft(labels)((l, _) => propagate(l))
          .localCheckpoint(true)
        round += steps
      }
      labels.select(col("node"), col("label").as("community"))
    }
  }

  /** Exact triangle count over an undirected simple graph given as a
    * (src, dst) edge list (self-loops and duplicate/reversed edges are
    * normalized away). The classic distributed edge-ordering
    * enumeration: orient every edge by (degree, id) rank
    * ([[orientByDegree]]), join wedges (a→b, b→c) on the middle node,
    * then close each wedge with a semi-join against the oriented edge
    * set — each triangle is counted exactly once because the rank order
    * is total.
    *
    * 100 TB shape: one degree aggregation plus three equi-join shuffles
    * over slim (long, long) rows; the degree orientation bounds total
    * wedge fan-out at O(m^1.5) even on skewed graphs (co-occurrence
    * graphs at scale ARE skewed — a raw id orientation leaves ~deg²/4
    * wedges at any hub whose id sits mid-range, see [[orientByDegree]]).
    * Output: 1 row (n_nodes, n_edges, n_triangles).
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val normalized = normalizeEdges(edges, srcCol, dstCol)
    val oriented = orientByDegree(normalized)
    val tri = wedges(oriented)
      .join(oriented.select(col("u").as("a"), col("w").as("c")),
        Seq("a", "c"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val nodes = normalized.select(explode(array(col("lo"), col("hi"))).as("n"))
      .agg(countDistinct(col("n")).as("n_nodes"))
    val ne = normalized.agg(count(lit(1)).as("n_edges"))
    nodes.crossJoin(ne).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }
}
