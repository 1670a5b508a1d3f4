package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values, a.k.a. bottom-k theta) sketch over a key
  * column — the mergeable distinct-count / set-overlap estimator the
  * HLL family cannot provide: HLL unions, but it cannot INTERSECT, so
  * "how much does the train corpus overlap the eval corpus" at 100 TB
  * (contamination estimation without materializing the shingle join) is
  * KMV territory (Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations", SIGMOD 2007).
  *
  * The sketch is the k smallest DISTINCT 60-bit priorities of the key
  * set, where priority = the first 15 hex chars of md5(key) — uniform,
  * engine-independent, and recomputable verbatim in the DuckDB oracle
  * (`CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)`), so the ESTIMATES
  * themselves are deterministic and hash-checked, not just bounded.
  *
  * 100 TB shape: each partition reduces to its own k smallest distinct
  * priorities in one pass with a bounded k-entry tree (the one
  * legitimate mapPartitions shape: O(k) state, sequential), so the
  * exchange carries ≤ k·partitions longs — NEVER the distinct key set
  * (a naive `distinct().orderBy().limit(k)` shuffles every distinct key;
  * at 1e12 NDV that is the difference between 8 KB·P and 8 TB on the
  * wire). The final merge is a k·P-row sort-limit.
  */
object Kmv {

  /** 2^60 — priorities are uniform in [0, 2^60). */
  val PriorityRange: Long = 1L << 60

  /** Engine-portable 60-bit uniform priority: first 15 hex chars of
    * md5(key as string). 15 chars keeps the value positive in a signed
    * 64-bit long on both engines (16 would not).
    */
  def priority(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** The sketch: k smallest distinct priorities of `key`, as a 1-column
    * (`pri`) DataFrame of ≤ k rows.
    *
    * Per-partition pass keeps a bounded TreeSet of the k smallest
    * distinct values seen (dedup and top-k in the same O(log k) insert);
    * the global merge then dedups and sort-limits ≤ k·partitions longs.
    * Any value in the global bottom-k distinct set is in its own
    * partition's bottom-k distinct set, so the partial pass is lossless.
    */
  def sketch(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 1, s"sketch size must be >= 1, got $k")
    val s = df.sparkSession
    import s.implicits._
    // NULL keys carry no distinct-count evidence (count(distinct)
    // ignores them) — and priority(NULL) is NULL, which the Long
    // encoder would reject at runtime. Filter the RAW key, not the
    // computed priority: a predicate on the md5-derived column gets
    // alias-substituted below the projection by the optimizer and the
    // md5 evaluates twice per row (measured ~2x on the sketch scan)
    val partial = df.filter(key.isNotNull).select(priority(key).as("pri")).as[Long]
      .mapPartitions { it =>
        val set = new java.util.TreeSet[java.lang.Long]()
        it.foreach { v =>
          if (set.size < k) set.add(v)
          else if (v < set.last) { if (set.add(v)) set.pollLast() }
        }
        scala.jdk.CollectionConverters.IteratorHasAsScala(set.iterator())
          .asScala.map(_.longValue())
      }
    partial.toDF("pri").distinct().orderBy(col("pri")).limit(k)
  }

  /** Distinct-count estimate from a sketch: (k−1)·2^60 div v_k where
    * v_k is the largest retained priority — or the sketch size itself
    * when it holds fewer than k values (then the sketch IS the distinct
    * set and the count is exact). Integer arithmetic end-to-end
    * (decimal(38) cross-multiplication; `div` floors, and both operands
    * are positive, so Spark's truncate and DuckDB's `//` agree).
    */
  def ndvEstimate(sk: DataFrame, k: Int): DataFrame =
    sk.agg(count(lit(1)).as("n_sk"), max(col("pri")).as("v_k"))
      .select(
        when(col("n_sk") < k, col("n_sk"))
          .otherwise(expr(
            s"cast(${k - 1} as decimal(38,0)) * cast($PriorityRange as decimal(38,0)) div v_k"))
          .as("ndv_est"))

  /** Jaccard-similarity estimate between two key sets from their
    * sketches, in integer basis points: take the k smallest priorities
    * of the sketch union; the fraction of those present in BOTH input
    * sketches estimates |A∩B|/|A∪B| (any priority in the union's
    * bottom-k is, if it belongs to A at all, inside A's own bottom-k —
    * fewer than k union values precede it — so the membership test never
    * misses). Standard error ≈ sqrt(J(1−J)/k).
    *
    * Emits (n_union_sk, n_both, jaccard_bp_est); the division is guarded
    * so two empty inputs estimate 0, not a divide-by-zero.
    */
  def jaccardEstimate(skA: DataFrame, skB: DataFrame, k: Int): DataFrame = {
    val tagged = skA.select(col("pri"), lit(1).as("in_a"), lit(0).as("in_b"))
      .unionAll(skB.select(col("pri"), lit(0).as("in_a"), lit(1).as("in_b")))
      .groupBy(col("pri"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
      .orderBy(col("pri")).limit(k)
    tagged.agg(
        count(lit(1)).as("n_union_sk"),
        coalesce(sum(when(col("in_a") === 1 && col("in_b") === 1, 1L)
          .otherwise(0L)), lit(0L)).as("n_both"))
      .select(col("n_union_sk"), col("n_both"),
        expr("10000 * n_both div greatest(n_union_sk, 1)")
          .as("jaccard_bp_est"))
  }
}
