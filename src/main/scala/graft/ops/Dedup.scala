package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextHashFunctions, VectorFunctions}

/** Deduplication operators for training-data pipelines, each designed
  * around its shuffle and compute profile at 100 TB:
  *
  *  - exact: one shuffle on a 128-bit content hash (not the text itself —
  *    the shuffle carries 16 bytes + ids, not documents).
  *  - MinHash+LSH: signatures computed scan-side by the native
  *    [[graft.functions.MinHashSignature]] kernel (one xxh64 per shingle,
  *    k integer mixes — the declarative 64-aggregate form is interpreted
  *    and re-walks the array per hash). The banded self-join carries only
  *    (id, band, bucket) — candidate pairs are slim; shingle sets are
  *    re-joined only for the exact-Jaccard verification of candidates.
  *  - SimHash: native 64-bit [[graft.functions.SimHash64]] signature;
  *    pigeonhole banding (4×16-bit chunks) turns hamming≤3 search into
  *    4 equi-joins on 2-byte keys.
  *  - n-gram Jaccard: exact pairwise verification (cross-join form for
  *    small blocks; LSH is the recall path at scale).
  *  - embedding near-dup: random-hyperplane LSH over `array<float>`
  *    vectors; banded candidates slim, cosine verified on candidates with
  *    the codegen'd [[graft.functions.CosineSimilarity]].
  *
  * Compute-heavy signature stages `repartition` to the cluster's
  * parallelism first: a small parquet input (one file → one partition)
  * must not serialize a CPU-bound stage onto one core — at 100 TB the
  * same repartition balances uneven file sizes.
  */
object Dedup {

  private def parallelism(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  /** Posting-frequency skew valve shared by the winnow and containment
    * screens: drop postings whose key occurs more than `maxDocFreq`
    * times (boilerplate fingerprints that would otherwise fan out
    * quadratically in the candidate self-join). A no-op pass-through at
    * the default cap.
    *
    * Shape (optimization round 11, guide §2.3/§2.5): the hot-key set is
    * computed by a PARTIAL-AGGREGABLE groupBy count (the map side ships
    * one row per distinct key per partition, not every posting) and
    * removed with an anti-join. The previous window-count form shuffled
    * the ENTIRE posting list by key and sorted it — and the hot keys the
    * valve exists to drop are exactly the keys that skew that shuffle.
    * The hot set is provably small: Σ df = |postings|, so at most
    * |postings| / maxDocFreq keys can exceed the cap — with the
    * production fraction-of-corpus caps that is ≤ 100 × the mean sketch
    * width, far under any broadcast threshold, and AQE turns the
    * anti-join into a broadcast join at runtime. Keys are hash values
    * (never NULL), so anti-join and window-filter semantics agree.
    */
  private def docFreqValve(posting: DataFrame, keyCol: String,
      maxDocFreq: Int): DataFrame =
    if (maxDocFreq == Int.MaxValue) posting
    else {
      val hot = posting.groupBy(col(keyCol)).agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDocFreq)
        .select(col(keyCol))
      posting.join(hot, Seq(keyCol), "left_anti")
    }

  // ---------------------------------------------------------------- exact

  /** Exact dedup on normalized content: groups by MD5(normalized text),
    * keeps the smallest id per group. Output: (keep_id, n_copies).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(TextAnalysis.fingerprintMd5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // ------------------------------------------------------------- shingles

  /** Distinct character n-gram shingles of the normalized text — native
    * one-pass kernel ([[graft.functions.ShingleSet]]).
    */
  def shingles(text: Column, n: Int = 5): Column =
    TextHashFunctions.shingleSet(text, n)

  /** Sorted distinct 64-bit shingle hashes — the all-numeric form the
    * LSH pipelines run on ([[graft.functions.ShingleHashes]]).
    */
  def shingleHashes(text: Column, n: Int = 5): Column =
    TextHashFunctions.shingleHashes(text, n)

  /** MinHash signature of a shingle array (native kernel). */
  def minhashSignature(shingleCol: Column, numHashes: Int = 64): Column =
    TextHashFunctions.minhashSignature(shingleCol, numHashes)

  /** 64-bit SimHash of a shingle array (native kernel). */
  def simhash64(shingleCol: Column): Column =
    TextHashFunctions.simhash64(shingleCol)

  // ------------------------------------------------------- MinHash + LSH

  /** Candidate near-dup pairs by banded MinHash-LSH, verified with exact
    * Jaccard over the shingle sets. `bands` must divide `numHashes`.
    * Output: (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    // repartition = CPU balance + a materialization barrier, so the
    // shingle-hash array is computed once, not re-inlined by projection
    // collapse; all-numeric payload (8 B/shingle, no strings anywhere)
    val sh = docs.select(col(idCol).as("id"), shingleHashes(col(textCol), n).as("sh"))
      .repartition(parallelism(docs), col("id"))
    val sig = sh.select(col("id"),
      TextHashFunctions.minhashFromHashes(col("sh"), numHashes).as("sig"))
    // slim banded rows: (id, band, bucket) only — no payload in the shuffle
    val banded = sig.select(col("id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
      }: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
    val candidates = banded.as("a")
      .join(banded.as("b"), Seq("band", "bucket"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
    // exact-Jaccard verification on candidates only: linear merge over
    // the sorted hash arrays (codegen'd), not string-set intersection
    candidates
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        TextHashFunctions.jaccardSorted(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ------------------------------------------------------------- SimHash

  /** SimHash near-dup pairs: pigeonhole on 4 16-bit chunks (any pair with
    * hamming ≤ 3 shares at least one chunk), verify hamming via
    * bit_count(xor). Output: (id_a, id_b, hamming).
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      maxHamming: Int = 3): DataFrame = {
    val sig = docs.select(col(idCol).as("id"), shingleHashes(col(textCol), n).as("sh"))
      .repartition(parallelism(docs), col("id"))
      .select(col("id"), TextHashFunctions.simhash64FromHashes(col("sh")).as("sig"))
    val chunked = sig.select(col("id"), col("sig"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL)).as("ckey"))
      }: _*)).as("cc"))
      .select(col("id"), col("sig"), col("cc.chunk"), col("cc.ckey"))
    val a = chunked.select(col("chunk"), col("ckey"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk"), col("ckey"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long").as("hamming"))
      // dedup BEFORE the hamming filter — measured, not assumed: the
      // filter-first order reads 1.3-1.6 s vs 0.97-1.18 s warm on the
      // sf0.1 corpus (3-rep A/B, spark-shell). dropDuplicates collapses
      // duplicate pairs MAP-SIDE via partial aggregation, so the
      // exchange carries ~unique pairs in either order and filtering
      // first only adds a pass over the join output
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Exhaustive all-pairs variant of [[simhashPairs]]: every pair with
    * hamming(simhash_a, simhash_b) ≤ maxHamming, no banding screen —
    * O(n²) 64-bit XORs, the verifier path for the pigeonhole banding
    * (which is provably lossless at 4 chunks / hamming ≤ 3, so the two
    * outputs must be EQUAL on any input).
    */
  def simhashPairsExhaustive(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      maxHamming: Int = 3): DataFrame = {
    val sig = docs.select(col(idCol).as("id"), shingleHashes(col(textCol), n).as("sh"))
      .repartition(parallelism(docs), col("id"))
      .select(col("id"), TextHashFunctions.simhash64FromHashes(col("sh")).as("sig"))
    val a = sig.select(col("id").as("id_a"), col("sig").as("sig_a"))
    val b = sig.select(col("id").as("id_b"), col("sig").as("sig_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------- exact n-gram Jaccard

  /** Exact pairwise n-gram Jaccard ≥ threshold. All-pairs within the
    * input — intractable at corpus scale by design; LSH
    * ([[minhashPairs]]) is the scale path, this is the oracle/verifier.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val prep = docs.select(col(idCol).as("id"), shingleHashes(col(textCol), n).as("sh"))
      .repartition(parallelism(docs), col("id"))
    val a = prep.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = prep.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        TextHashFunctions.jaccardSorted(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ------------------------------------------------- winnowing pair search

  /** Production-scale winnowing pair search (the MOSS index structure):
    * an inverted index over the winnow fingerprint values — two docs
    * sharing ANY selected fingerprint are candidates — then exact
    * Jaccard verification over the sorted fingerprint arrays on
    * candidates only. The screen is LOSSLESS for any threshold > 0 over
    * documents with NON-EMPTY sketches (jaccard > 0 requires a nonempty
    * intersection), unlike probabilistic MinHash banding, because the
    * winnow sketch already IS the sampled set being compared. Documents
    * too short to produce a fingerprint (normalized length < w+k−1 = 8)
    * are excluded up front and participate in no pairs: an empty sketch
    * carries no similarity evidence, whereas a naive all-pairs
    * jaccard(∅, ∅) = 1.0 would mark every pair of short docs duplicates.
    *
    * Scale shape: the posting shuffle carries slim (fingerprint, id)
    * longs (the sketch is ~2/(w+1) of the gram set — far fewer postings
    * than an n-gram index); the candidate self-join is an equi-join per
    * shared fingerprint; full arrays are re-joined only for candidate
    * verification. `maxDocFreq` is the skew valve: a boilerplate
    * fingerprint shared by f docs contributes f² candidate pairs, so
    * production runs cap posting-list length (dropping one list only
    * loses pairs whose EVERY shared fingerprint is that common — pairs
    * that are boilerplate-only matches, the ones dedup wants to ignore).
    * The default (no cap) keeps the screen exact for the gate.
    */
  def winnowPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      w: Int = 4,
      threshold: Double = 0.5,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    require(threshold > 0.0, "the shared-fingerprint screen needs threshold > 0")
    val prep = winnowSketches(docs, idCol, textCol, k, w)
    if (maxDocFreq == Int.MaxValue) {
      // PREFIX-FILTERED screen (optimization round 11, guide §2.3/§2.5 —
      // the AllPairs/PPJoin principle, Bayardo et al. WWW'07): under any
      // global token order, a pair with J ≥ t must share a token within
      // the first |S| − ⌈t·|S|⌉ + 1 tokens of BOTH sets (if every shared
      // token sat outside one of the prefixes, the order-consistency of
      // the shared tokens would force |A∩B| < ⌈t·|S|⌉ on one side,
      // contradicting J ≥ t ⇒ min-side overlap ≥ ⌈t·|S|⌉). The sketch is
      // already a SORTED distinct hash array, so the prefix is a slice —
      // the posting index shrinks to ~(1−t) of the full screen and the
      // candidate self-join fan-out (Σ df², the dominant cost of this
      // operator — hot boilerplate fingerprints square) by ~(1−t)². The
      // ε in the ceil guards float rounding toward the SAFE side (a
      // too-long prefix only adds candidates, never loses one); the
      // size filter (J ≥ t ⇒ min ≥ t·max, 1.0 slack for the same
      // reason) prunes candidates before the verify re-attach. The
      // screen stays lossless, so the verified output is unchanged.
      val pfxLen = greatest(col("sz") -
        ceil(col("sz") * lit(threshold) - lit(1e-9)).cast("int") + lit(1), lit(1))
      val posting = prep.select(col("id"), size(col("fp")).as("sz"), col("fp"))
        .select(col("id"), col("sz"),
          explode(slice(col("fp"), lit(1), pfxLen)).as("f"))
      val a = posting.select(col("f"), col("id").as("id_a"), col("sz").as("sz_a"))
      val b = posting.select(col("f"), col("id").as("id_b"), col("sz").as("sz_b"))
      val candidates = a.join(b, Seq("f"))
        .filter(col("id_a") < col("id_b"))
        .filter(least(col("sz_a"), col("sz_b")).cast("double") >=
          lit(threshold) * greatest(col("sz_a"), col("sz_b")) - lit(1.0))
        .select(col("id_a"), col("id_b"))
        .distinct()
      candidates
        .join(prep.select(col("id").as("id_a"), col("fp").as("fp_a")), Seq("id_a"))
        .join(prep.select(col("id").as("id_b"), col("fp").as("fp_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          TextHashFunctions.jaccardSorted(col("fp_a"), col("fp_b")).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    } else {
      // capped path: the valve drops hot fingerprints from the SCREEN
      // only — verification must still compute Jaccard over the full
      // sketches (dropped fingerprints count toward |A∩B|), so the
      // count-based shortcut above does not apply and candidates
      // re-attach the arrays.
      val posting = prep.select(col("id"), explode(col("fp")).as("f"))
      val screened = docFreqValve(posting, "f", maxDocFreq)
      val candidates = screened.as("a")
        .join(screened.as("b"), Seq("f"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .filter(col("id_a") < col("id_b"))
        .distinct()
      candidates
        .join(prep.select(col("id").as("id_a"), col("fp").as("fp_a")), Seq("id_a"))
        .join(prep.select(col("id").as("id_b"), col("fp").as("fp_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          TextHashFunctions.jaccardSorted(col("fp_a"), col("fp_b")).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
  }

  /** The persisted winnow sketch store: (id, fp) with empty sketches
    * excluded — the standing state an incremental dedup pipeline keeps
    * between ingest batches (alongside its posting index, which is just
    * `explode(fp)` and at scale is stored bucketed on the fingerprint).
    */
  def winnowSketches(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      w: Int = 4): DataFrame =
    docs.select(col(idCol).as("id"),
        TextHashFunctions.winnowFingerprint(col(textCol), k, w).as("fp"))
      .filter(size(col("fp")) > 0) // empty sketch = no similarity evidence
      .repartition(parallelism(docs), col("id"))

  /** Incremental (new-batch-vs-standing-corpus) winnow near-dup search —
    * the production shape of [[winnowPairs]]: a 100 TB pipeline ingests
    * shards daily and must NOT redo the whole-corpus pair search per
    * shard. Inputs are the standing corpus's persisted sketch store
    * ([[winnowSketches]] output — ids must be disjoint from the batch's)
    * and the raw new batch; output is every qualifying pair that TOUCHES
    * the batch: batch×standing (probing the batch's fingerprints against
    * the standing posting index) plus batch×batch (within-shard pairs).
    * Standing×standing pairs were found when THOSE docs were the batch —
    * the quadratic standing-side self-join, the term that grows with
    * corpus size rather than shard size, never runs.
    *
    * EXACTNESS: with no cap, the shared-fingerprint screen is lossless
    * (jaccard > 0 needs a shared fingerprint), so the result EQUALS
    * the full-recompute [[winnowPairs]] over standing ∪ batch restricted
    * to pairs with ≥ 1 batch-side id — the `dedup_incremental` gate
    * asserts that set equality every round. `maxDocFreq` is the same
    * boilerplate valve, applied to fingerprint document frequency over
    * the COMBINED corpus (a df is a corpus property; a production index
    * maintains it as a per-fingerprint count updated per batch, so the
    * valve reads stored state, not a recount).
    *
    * Scale shape: the batch posting shuffle is O(|batch| sketches); the
    * standing index contributes only posting lists whose fingerprint
    * occurs in the batch (an equi-join on the fingerprint — with the
    * index stored bucketed on `f`, exchange-free on the standing side);
    * verification re-joins full sketch arrays for candidates only.
    * Output: (id_a, id_b, jaccard), id_a < id_b.
    */
  def incrementalWinnowPairs(
      standingSketches: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      w: Int = 4,
      threshold: Double = 0.5,
      maxDocFreq: Int = Int.MaxValue,
      standingDf: Option[DataFrame] = None,
      bloomProbe: Boolean = false): DataFrame = {
    require(threshold > 0.0, "the shared-fingerprint screen needs threshold > 0")
    // materialize the BATCH sketches once (optimization round 11): the
    // batch relation is consumed by several independent eager steps (the
    // bloom build is an action, the df valve's driver-held dropped set
    // is another) plus 3-4 subtrees of the main plan, and each was
    // re-running the winnow kernel over the batch. The batch is
    // O(shard), not corpus-sized — exactly the delta a real ingest
    // pipeline materializes anyway before probing the standing index.
    val batchPrep = winnowSketches(batch, idCol, textCol, k, w)
      .localCheckpoint(true)
    val standing = standingSketches.select(col("id"), col("fp"))
    if (maxDocFreq == Int.MaxValue)
      return incrementalWinnowPairsCounted(standing, batchPrep, threshold,
        bloomProbe)
    val newPostRaw = batchPrep.select(col("id"), explode(col("fp")).as("f"))
    val oldPostRaw = {
      val raw = standing.select(col("id"), explode(col("fp")).as("f"))
      if (!bloomProbe) raw
      else {
        // bloom-prefilter the standing probe (round-8 verdict item 5):
        // a bloom filter over the BATCH's fingerprint set screens the
        // standing posting scan down to ~batch selectivity before the
        // equi-join ships anything. False positives survive only to the
        // join (which removes them — lossless); false negatives don't
        // exist, so every batch-relevant posting row survives, keeping
        // the window-recount df EXACT for every fingerprint the batch
        // touches (fingerprints the bloom drops generate no pairs).
        // Same runtime-filter primitives as Joins.bloomPrefilteredJoin.
        Joins.keyBloom(newPostRaw, col("f")) match {
          case None => raw.limit(0) // empty batch probes nothing
          case Some(bf) => raw.filter(Joins.bloomMightContain(bf, col("f")))
        }
      }
    }
    // the valve's df is a COMBINED-corpus property. Preferred input: the
    // maintained per-fingerprint count relation the index store keeps
    // (`standingDf`, see ModelStore.saveWinnowIndex /
    // updateStandingIndex) plus the batch's own O(|batch|) counts — the
    // valve becomes an equi-join lookup. Fallback: recount via a window
    // over the full posting union (gate-exact, but a per-shard recount
    // of a corpus property — the form the stored counts exist to avoid).
    val (newPost, oldPost) =
      standingDf match {
        case Some(sdf) =>
          // valve as a DRIVER-HELD dropped set (optimization round 11,
          // guide §2.3): only fingerprints that occur in the BATCH can
          // produce pairs (cross pairs need a shared f with the batch;
          // within pairs are batch-only), so the valve only has to
          // decide batch-occurring fingerprints. The standing df counts
          // for those come from one broadcast semi-join of the stored
          // counts against the batch's O(|batch|) distinct-fingerprint
          // set (the big sdf relation streams, nothing shuffles), and
          // the hot set (combined df > cap) is provably ≤ Σdf/cap keys
          // — with the production fraction-of-corpus caps that is a
          // KB-sized artifact like the bloom filter below it, so it is
          // collected once and applied as a pure scan-side filter.
          // The old form full_outer-joined sdf against the batch counts
          // (a shuffle of EVERY stored fingerprint count per shard
          // probe) and re-joined both posting relations against the
          // corpus-sized keep set — and that subtree was replicated
          // into each of the plan's four posting consumers.
          // Standing-only fingerprints the old keep-join also screened
          // are pair-irrelevant either way: they never meet a batch
          // posting in the candidate join.
          val batchDf = newPostRaw.groupBy(col("f")).agg(count(lit(1)).as("bdf"))
          val sdfRelevant = sdf.select(col("f"), col("df"))
            .join(batchDf.select(col("f")), Seq("f"), "left_semi")
          val droppedRel = batchDf.join(sdfRelevant, Seq("f"), "left_outer")
            .filter(coalesce(col("df"), lit(0L)) + col("bdf") > maxDocFreq.toLong)
            .select(col("f"))
          // a degenerate cap (far below the fraction-of-corpus
          // convention) could make the hot set large; cap the driver
          // artifact and fall back to the distributed anti-join there
          val dropped = droppedRel.limit(10001).collect().map(_.getLong(0)).toSeq
          if (dropped.isEmpty) (newPostRaw, oldPostRaw)
          else if (dropped.size <= 10000)
            (newPostRaw.filter(!col("f").isInCollection(dropped)),
              oldPostRaw.filter(!col("f").isInCollection(dropped)))
          else
            (newPostRaw.join(droppedRel, Seq("f"), "left_anti"),
              oldPostRaw.join(droppedRel, Seq("f"), "left_anti"))
        case None =>
          val posting = oldPostRaw.withColumn("is_new", lit(false))
            .union(newPostRaw.withColumn("is_new", lit(true)))
          val screened = docFreqValve(posting, "f", maxDocFreq)
          (screened.filter(col("is_new")).select(col("id"), col("f")),
            screened.filter(!col("is_new")).select(col("id"), col("f")))
      }
    // batch probes the standing index (both orders collapse via
    // least/greatest — ids are disjoint by contract) + within-batch pairs
    val cross = newPost.as("nb").join(oldPost.as("st"), Seq("f"))
      .select(least(col("nb.id"), col("st.id")).as("id_a"),
        greatest(col("nb.id"), col("st.id")).as("id_b"))
    val within = newPost.as("a").join(newPost.as("b"), Seq("f"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
    val candidates = cross.union(within).distinct()
    val sketches = standing.union(batchPrep)
    candidates
      .join(sketches.select(col("id").as("id_a"), col("fp").as("fp_a")), Seq("id_a"))
      .join(sketches.select(col("id").as("id_b"), col("fp").as("fp_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        TextHashFunctions.jaccardSorted(col("fp_a"), col("fp_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Uncapped [[incrementalWinnowPairs]] via the count-based exact
    * Jaccard (optimization round 11 — same algebra as the uncapped
    * [[winnowPairs]] path): sketches are sorted DISTINCT hash arrays, so
    * the batch-vs-standing and batch-vs-batch posting joins emit exactly
    * one row per shared fingerprint per pair, groupBy(pair).count() is
    * |A∩B|, and J = c / (|A| + |B| − c) with both sizes carried as
    * 4-byte payload on the posting rows — no array re-attach joins, no
    * candidates.distinct(). Bloom screening of the standing posting scan
    * is count-exact: a fingerprint shared by a batch doc and a standing
    * doc is in the batch's filter by construction (no false negatives),
    * and false positives have no batch-side row to join.
    */
  private def incrementalWinnowPairsCounted(
      standing: DataFrame,
      batchPrep: DataFrame,
      threshold: Double,
      bloomProbe: Boolean): DataFrame = {
    // sz below the explode on both sides — see the winnowPairs note (a
    // fused projection makes Generate carry the array per exploded row)
    val newPost = batchPrep.select(col("id"), size(col("fp")).as("sz"), col("fp"))
      .select(col("id"), col("sz"), explode(col("fp")).as("f"))
    val oldPost = {
      val raw = standing.select(col("id"), size(col("fp")).as("sz"), col("fp"))
        .select(col("id"), col("sz"), explode(col("fp")).as("f"))
      if (!bloomProbe) raw
      else Joins.keyBloom(newPost, col("f")) match {
        case None => raw.limit(0) // empty batch probes nothing
        case Some(bf) => raw.filter(Joins.bloomMightContain(bf, col("f")))
      }
    }
    // batch probes the standing postings (both orders collapse to
    // id_a < id_b — ids are disjoint by contract, sizes follow their
    // ids) + within-batch pairs
    val lower = col("nb.id") < col("st.id")
    val cross = newPost.as("nb").join(oldPost.as("st"), Seq("f"))
      .select(
        when(lower, col("nb.id")).otherwise(col("st.id")).as("id_a"),
        when(lower, col("st.id")).otherwise(col("nb.id")).as("id_b"),
        when(lower, col("nb.sz")).otherwise(col("st.sz")).as("sz_a"),
        when(lower, col("st.sz")).otherwise(col("nb.sz")).as("sz_b"))
    val within = newPost.as("a").join(newPost.as("b"), Seq("f"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
    cross.unionByName(within)
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("c"))
      .select(col("id_a"), col("id_b"),
        (col("c").cast("double") /
          (col("sz_a").cast("long") + col("sz_b").cast("long") - col("c")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The other half of the daily-ingest loop (round-8 verdict item 4):
    * after [[incrementalWinnowPairs]] has probed a batch and the
    * caller's keep policy has decided which batch docs enter the
    * corpus, the standing index must GROW — standing′ = standing ∪
    * accepted sketches, and the maintained per-fingerprint df counts
    * (the valve input) absorb the accepted batch's deltas so the next
    * batch's valve still reads stored state, not a recount.
    *
    * Exactness contract (the `dedup_standing_update` gate): standing′
    * set-equals [[winnowSketches]] of the grown corpus, and df′
    * set-equals [[ModelStore.winnowDfCounts]] recomputed from it —
    * incremental upkeep is indistinguishable from rebuild. Ids must
    * stay disjoint (the incremental contract).
    *
    * Scale shape: the union is a metadata concat; the df merge
    * aggregates standing counts (one row per distinct fingerprint — the
    * index's own size, not the corpus's) with O(|batch|) deltas. At
    * 100 TB both sides live as parquet tables
    * ([[ModelStore.saveWinnowIndex]]) and the merge is one shuffle on
    * the fingerprint key — or exchange-free with the store bucketed
    * on `f`.
    */
  def updateStandingIndex(
      standingSketches: DataFrame,
      standingDf: DataFrame,
      acceptedSketches: DataFrame): (DataFrame, DataFrame) = {
    val sketches = standingSketches.select(col("id"), col("fp"))
      .union(acceptedSketches.select(col("id"), col("fp")))
    val deltas = acceptedSketches.select(explode(col("fp")).as("f"))
      .groupBy(col("f")).agg(count(lit(1)).as("df"))
    val merged = standingDf.select(col("f"), col("df"))
      .union(deltas)
      .groupBy(col("f")).agg(sum(col("df")).as("df"))
    (sketches, merged)
  }

  /** Deletion propagation through the standing index — the takedown /
    * right-to-be-forgotten half of index maintenance: when documents
    * leave the corpus (license revocation, PII purge, poisoning
    * removal), their sketches must leave the store AND the maintained
    * per-fingerprint df counts must shed exactly the departed docs'
    * contributions, or the valve starts reading stale corpus
    * properties.
    *
    * Exactness contract (the `index_forget` gate): forget is
    * indistinguishable from rebuild — standing′ set-equals
    * [[winnowSketches]] of the corpus minus the deleted docs, and df′
    * set-equals [[ModelStore.winnowDfCounts]] recomputed from it
    * (fingerprints whose count reaches zero disappear, matching the
    * rebuild's groupBy which never emits empty groups).
    *
    * Scale shape: one anti-join on the id (the sketch removal), one
    * semi-join + explode over only the DELETED docs' sketches (the df
    * deltas — O(|deleted|), not corpus-sized), and one outer-join merge
    * on the fingerprint key. Nothing rescans the surviving corpus.
    */
  def forgetFromStandingIndex(
      standingSketches: DataFrame,
      standingDf: DataFrame,
      deleteIds: DataFrame): (DataFrame, DataFrame) = {
    val ids = deleteIds.select(col("id"))
    val kept = standingSketches.select(col("id"), col("fp"))
      .join(ids, Seq("id"), "left_anti")
    val removedDeltas = standingSketches.select(col("id"), col("fp"))
      .join(ids, Seq("id"), "left_semi")
      .select(explode(col("fp")).as("f"))
      .groupBy(col("f")).agg(count(lit(1)).as("gone"))
    val shrunk = standingDf.select(col("f"), col("df"))
      .join(removedDeltas, Seq("f"), "left_outer")
      .select(col("f"), (col("df") - coalesce(col("gone"), lit(0L))).as("df"))
      .filter(col("df") > 0)
    (kept, shrunk)
  }

  /** Production containment pair search: ordered pairs (a, b) where at
    * least `thresholdBp` basis points of a's distinct character n-grams
    * also occur in b — the ASYMMETRIC complement of Jaccard dedup that
    * catches quote/substring duplication (a short doc embedded inside a
    * long one has low Jaccard but high containment, the RefinedWeb
    * "exact substring" family's set-level analog).
    *
    * Same inverted-index screen as [[winnowPairs]], over the FULL
    * shingle-hash set: containment ≥ τ > 0 requires ≥ 1 shared gram, so
    * a pair sharing no posting can never qualify — the screen is
    * lossless. Candidates verify via the sorted-merge intersection count
    * ([[graft.functions.IntersectSizeSorted]]) against an all-integer
    * threshold test (10000·|A∩B| ≥ bp·|A|), no float boundary. The
    * shuffle carries (hash, id) longs; `maxDocFreq` is the same
    * boilerplate valve as winnowPairs (a gram in f docs contributes f²
    * candidates; capping drops only pairs whose EVERY shared gram is
    * that common). Output: (id_a, id_b, n_common, n_a) with a ≠ b, both
    * directions — containment is directional.
    */
  def containmentPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      thresholdBp: Int = 7000,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    require(thresholdBp > 0, "the shared-gram screen needs threshold > 0")
    val prep = docs.select(col(idCol).as("id"),
        shingleHashes(col(textCol), n).as("sh"))
      .repartition(parallelism(docs), col("id"))
    if (maxDocFreq == Int.MaxValue) {
      // count-based exact containment (optimization round 11 — the
      // winnowPairs algebra): gram sets are sorted DISTINCT hashes, so
      // groupBy(pair).count() over the posting self-join is |A∩B|
      // exactly, with |A| carried as 4-byte payload — no array
      // re-attach joins, no candidates.distinct(). c = 0 pairs cannot
      // reach any positive threshold, so emitting joined pairs only is
      // the same lossless screen.
      val posting = prep.select(col("id"), size(col("sh")).as("sz"), col("sh"))
        .select(col("id"), col("sz"), explode(col("sh")).as("h"))
      val a = posting.select(col("h"), col("id").as("id_a"), col("sz").as("sz_a"))
      val b = posting.select(col("h"), col("id").as("id_b"))
      a.join(b, Seq("h"))
        .filter(col("id_a") =!= col("id_b"))
        .groupBy(col("id_a"), col("id_b"), col("sz_a"))
        .agg(count(lit(1)).as("n_common"))
        .select(col("id_a"), col("id_b"), col("n_common"),
          col("sz_a").cast("long").as("n_a"))
        .filter(col("n_common") * 10000L >= col("n_a") * thresholdBp.toLong)
    } else {
      val posting = prep.select(col("id"), explode(col("sh")).as("h"))
      val screened = docFreqValve(posting, "h", maxDocFreq)
      val candidates = screened.as("a")
        .join(screened.as("b"), Seq("h"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .filter(col("id_a") =!= col("id_b"))
        .distinct()
      candidates
        .join(prep.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(prep.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          TextHashFunctions.intersectSizeSorted(col("sh_a"), col("sh_b")).as("n_common"),
          size(col("sh_a")).cast("long").as("n_a"))
        .filter(col("n_common") * 10000L >= col("n_a") * thresholdBp.toLong)
    }
  }

  // ------------------------------------------- embedding cosine near-dup

  /** Near-duplicate pairs by embedding cosine ≥ threshold, candidates
    * from random-hyperplane LSH (signature = sign bits of dot products
    * with `planes` pseudo-random hyperplanes —
    * [[graft.functions.HyperplaneSignature]] — banded into two chunks).
    */
  /** Exact all-pairs variant of [[embeddingPairs]]: every (id_a, id_b)
    * with cosine ≥ threshold, no LSH screen — O(n²) dot products, the
    * oracle/verifier path (the LSH form is the corpus-scale path, same
    * relationship as [[ngramJaccardPairs]] to [[minhashPairs]]). Emits
    * ids only: the cosine value itself is accumulation-order-sensitive
    * in its last ulps, the pair set is stable for any threshold with
    * margin (sf0.01 data: min |cos − 0.25| ≈ 8e-6 vs ~1e-7 float noise).
    */
  def embeddingPairsExact(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val vecs = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .repartition(parallelism(emb), col("id"))
    val a = vecs.select(col("id").as("id_a"), col("v").as("v_a"))
    val b = vecs.select(col("id").as("id_b"), col("v").as("v_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .filter(VectorFunctions.cosineSimilarity(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  // --------------------------------------------- near-dup cluster closure

  /** Connected components over an undirected near-dup pair list —
    * iterative min-label propagation, the step that turns pairwise
    * near-dup evidence into "keep one doc per cluster".
    *
    * Each node starts labeled with its own id; every round each node
    * takes the min of its label and its neighbors' labels; converged
    * when a round changes nothing. Rounds ≤ cluster diameter — near-dup
    * clusters are shallow (a dup of a dup of X is usually also a direct
    * dup of X), so this terminates in a handful of distributed
    * hash-join/aggregate rounds with NO driver-side graph. Each round
    * shuffles one slim (node, label) row per edge endpoint; at 100 TB
    * the labels table is a fraction of the corpus (only docs that appear
    * in a pair). `maxIter` bounds pathological chains; the iterative
    * driver loop is the standard Spark shape for fixpoint algorithms
    * (each iteration is fully distributed, only the converged? bit comes
    * back to the driver).
    *
    * Output: (node, cluster_id) with cluster_id = min id in the
    * component — deterministic for any edge order or partitioning.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 25): DataFrame = {
    // eager localCheckpoint rather than a cache()/unpersist chain: a
    // non-cascading unpersist of round i-1 makes the CacheManager discard
    // round i's dependent cached data too, so later rounds recompute the
    // whole chain (see Graph.pageRankFixedPoint — measured there). The
    // checkpoint also detaches the returned labels from the edge lineage,
    // so nothing is recomputed when the caller finally acts on the result.
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(true)
    // size per-round shuffles to the edge count: an iterative loop pays
    // per-round task-scheduling costs that AQE's per-stage coalescing
    // doesn't remove (see Graph.iterPartitions); at cluster scale the
    // cap is the session's configured parallelism and this is a no-op
    var labels: DataFrame = null
    Graph.withShufflePartitions(edges, Graph.iterPartitions(edges, edges.count())) {
      val nodes = edges.select(col("src").as("node")).distinct()
        .localCheckpoint(true)
      // SELF-LOOP form of the min-label update (optimization round 11):
      // min(own, min over neighbors) == min over neighbors ∪ {self}, so
      // appending one (node, node) self-loop per node turns each round
      // into ONE equi-join + ONE aggregate that consumes the previous
      // labeling exactly once — the old least(own, neighborMin) shape
      // consumed it twice (the neighbor join and the own-label re-join),
      // which both added a join per round and made round-chaining
      // recompute the inner round. Single consumption is what lets two
      // rounds chain per materialization below (the kCore/LPA batching)
      // with no recomputation: the per-round floor is job dispatch, not
      // data, so halving the checkpoint count halves the fixed cost.
      val adj = edges.unionByName(
        nodes.select(col("node").as("src"), col("node").as("dst")))
      labels = nodes.select(col("node"), col("node").as("label"))
      def propagate(l: DataFrame): DataFrame = adj
        .join(l.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst"))
        .agg(min(col("label")).as("label"))
        .select(col("dst").as("node"), col("label"))
      // convergence probe: labels only ever decrease (min includes the
      // self-loop), so Σ labels strictly decreases iff any node changed
      // — one tiny aggregate over the checkpointed block output. A
      // block whose two chained rounds change nothing leaves the sum
      // unchanged, and an unchanged FIRST round forces an unchanged
      // second (the update is a pure function), so the equal-sum test
      // still proves the fixpoint exactly. decimal(38,0): a wrapped
      // Long sum could alias across rounds at extreme node-count ×
      // id-range
      def labelSum(df: DataFrame): java.math.BigDecimal =
        df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
      var prevSum = labelSum(labels)
      var converged = false
      var iter = 0
      while (!converged && iter < maxIter) {
        val steps = math.min(2, maxIter - iter)
        labels = (1 to steps).foldLeft(labels)((l, _) => propagate(l))
          .localCheckpoint(true)
        val s = labelSum(labels)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        iter += steps
      }
    }
    labels.withColumnRenamed("label", "cluster_id")
  }

  def embeddingPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      planes: Int = 16): DataFrame = {
    val vecs = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .repartition(parallelism(emb), col("id"))
    val sig = vecs.select(col("id"),
      graft.functions.VectorLshFunctions.hyperplaneSignature(col("v"), planes).as("sig"))
    // band the signature into two halves: hamming-tolerant candidates,
    // slim rows (id, chunk, ckey) only
    val banded = sig.select(col("id"),
      explode(array(
        struct(lit(0).as("chunk"), col("sig").bitwiseAND(lit((1L << (planes / 2)) - 1)).as("ckey")),
        struct(lit(1).as("chunk"), shiftright(col("sig"), planes / 2).as("ckey")))).as("cc"))
      .select(col("id"), col("cc.chunk"), col("cc.ckey"))
    val candidates = banded.as("a")
      .join(banded.as("b"), Seq("chunk", "ckey"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
    candidates
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosineSimilarity(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    * arXiv:2303.09540): k-means the embedding space, then verify cosine
    * only WITHIN a cluster. The candidate stage is an equi-join on the
    * cluster id over slim (id, cluster) rows — work is Σ|cluster|²
    * instead of n², and each cluster's pair generation co-locates under
    * one shuffle key. Recall is governed by the clustering (near-dups
    * co-cluster because they are near in the metric k-means optimizes);
    * the LSH screen [[embeddingPairs]] is the recall-bounded alternative
    * when no trained model is available.
    *
    * Output: (id_a, id_b, cosine) with id_a < id_b and cosine ≥ threshold.
    */
  def semanticPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      maxIter: Int,
      threshold: Double): DataFrame = {
    val (_, model) = Clustering.kmeans(emb, idCol, vecCol, k, maxIter)
    // assignment is a pure projection against the trained centroids —
    // computing it inline avoids re-scanning emb and shuffling the
    // full-vector payload through an id join just to attach clusters
    val withCluster = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cluster",
        graft.functions.KmeansKernels.nearestIndex(col("v"), model.centroids))
    val a = withCluster
      .select(col("cluster"), col("id").as("id_a"), col("v").as("v_a"))
    val b = withCluster
      .select(col("cluster"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosineSimilarity(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
