package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-addressed sampling — the train/valid/test
  * splitter of a training-data pipeline.
  *
  * A `sample(fraction)` is nondeterministic across runs and engines; a
  * pipeline that re-runs incrementally at 100 TB needs every row's split
  * to be a pure function of its id, so the assignment is stable under
  * retries, re-partitioning, and engine changes. The split key is an
  * md5-derived bucket in [0, 100): narrow (one hash per row), shuffles
  * nothing, and reproducible in any engine with md5 (the DuckDB oracle
  * recomputes it exactly).
  *
  * The reference has no sampling surface (SURVEY.md §2.5); this is part
  * of the beyond-reference pipeline layer.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the row id: first 8 hex chars of
    * md5(id) as an unsigned int, mod buckets.
    */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /** Adds a `split` column: "train" for bucket < trainPct, "valid" for
    * the next validPct buckets, "test" for the rest.
    */
  def deterministicSplit(df: DataFrame, id: Column,
      trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    val b = hashBucket(id)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + validPct, "valid")
        .otherwise("test"))
  }

  /** Deterministic fraction-style filter: keeps rows whose bucket falls
    * below `pct` — same contract as `df.sample`, minus the randomness.
    */
  def deterministicSample(df: DataFrame, id: Column, pct: Int): DataFrame =
    df.filter(hashBucket(id) < pct)

  /** Stratified deterministic sample: a per-stratum keep percentage
    * (`sampleBy`, minus the randomness). Rebalancing skewed training
    * mixes (downsample boilerplate strata, keep rare ones whole) is a
    * per-row filter — no shuffle, no state, and re-runs keep identical
    * rows.
    */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
      pctByStratum: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    val pct = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(stratum === k, lit(v)).otherwise(acc)
    }
    df.filter(hashBucket(id) < pct)
  }

  /** Deterministic importance sampling: keep probability proportional to
    * a PER-ROW integer weight in [0, 100] (a quality or length signal,
    * any column expression), realized as bucket(id) < weight. The
    * quality-weighted mix step of a training-data pipeline (keep good
    * documents with high probability, boilerplate with low) without an
    * RNG: a pure per-row filter — no shuffle, no state, identical rows
    * on every re-run and in every engine.
    */
  def weightedSample(df: DataFrame, id: Column, weightPct: Column): DataFrame =
    df.filter(hashBucket(id) < weightPct)

  /** Domain-mixture resampling toward an ARBITRARY target distribution —
    * the Pile/Dolma-style source-reweighting step, parameterized by a
    * per-domain weights relation instead of a hardcoded mixture
    * (round-9 verdict item 5): under a global budget of
    * `budgetNum/budgetDen` of the corpus, domain d's target share is
    * `weight_d / Σweights`, realized as a per-domain acceptance rate in
    * basis points (capped at keep-all) with membership decided by a
    * deterministic multiplicative hash of the row id — reproducible
    * across runs, partitionings, and engines, and oracle-replayable.
    * All arithmetic is integer with a pinned order of truncating
    * divisions, so any SQL engine's `//` replays it exactly.
    *
    * Scale shape: one corpus scan + three tiny aggregates (per-domain
    * counts, corpus total, weight total) joined broadcast; the accept
    * test is a pure per-row filter — no shuffle of the corpus, no RNG,
    * no state. The uniform mixture is just weights ≡ 1.
    *
    * Output: (domain, n_domain, weight, rate_bp, n_sampled) per domain.
    */
  def mixtureResample(
      docs: DataFrame, idCol: String, domainCol: String,
      weights: DataFrame,
      budgetNum: Long = 3L, budgetDen: Long = 10L): DataFrame = {
    val cnts = docs.groupBy(col(domainCol)).agg(count(lit(1)).as("n_domain"))
    val tot = docs.agg(count(lit(1)).as("n"))
    val wtot = weights.agg(sum(col("weight")).as("w_total"))
    val rates = cnts.join(weights, Seq(domainCol))
      .crossJoin(tot).crossJoin(wtot)
      .select(col(domainCol), col("n_domain"), col("weight"),
        least(lit(10000L),
          expr(s"((n * $budgetNum div $budgetDen) * weight div w_total) " +
            "* 10000 div n_domain")).as("rate_bp"))
    docs.join(broadcast(rates), Seq(domainCol))
      .groupBy(col(domainCol), col("n_domain"), col("weight"), col("rate_bp"))
      .agg(count(when(
        pmod(col(idCol) * lit(2654435761L), lit(10000L)) < col("rate_bp"),
        1)).as("n_sampled"))
      .select(col(domainCol), col("n_domain"), col("weight"),
        col("rate_bp"), col("n_sampled"))
  }

  /** Exactly-k-per-group deterministic sample (the reservoir-sampling
    * use case, minus the RNG): rank each group's rows by md5(id) — a
    * uniform, content-addressed priority — and keep the k lowest. "Give
    * me exactly 10 documents per source" for mix curation / eyeballing,
    * with the SAME k rows on every re-run, any partitioning, any engine.
    *
    * Scale shape: the rank-then-filter pair is recognized by Spark's
    * InferWindowGroupLimit, which inserts a partial WindowGroupLimit
    * BEFORE the exchange (see the agg_topk_per_group walkthrough in
    * PLANS.md) — each map task forwards at most k rows per group it
    * sees, so the shuffle is bounded by k·groups·partitions, not the
    * corpus. Ties are impossible in practice (md5 collision) but the id
    * tiebreak makes determinism unconditional.
    *
    * Output keeps all input columns plus the 1-based `rk` rank.
    */
  def bottomKPerGroup(df: DataFrame, id: Column, group: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(group)
      .orderBy(md5(id.cast("string")).asc, id.asc)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }
}
