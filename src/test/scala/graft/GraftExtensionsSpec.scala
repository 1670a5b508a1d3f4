package graft

/** SQL-surface spec: every native kernel callable from `spark.sql`. */
class GraftExtensionsSpec extends SparkSpec {

  private lazy val sql: String => org.apache.spark.sql.DataFrame = {
    GraftExtensions.register(spark)
    (q: String) => spark.sql(q)
  }

  test("text kernels compose in SQL") {
    val row = sql(
      """SELECT
        |  jaccard_sorted(shingle_hashes('the quick brown fox', 3),
        |                 shingle_hashes('THE  quick  brown fox', 3)) AS j_same,
        |  jaccard_sorted(shingle_hashes('abcdefgh', 3),
        |                 shingle_hashes('zyxwvuts', 3)) AS j_diff,
        |  simhash64_from_hashes(shingle_hashes('hello world', 3)) AS sh,
        |  size(minhash_from_hashes(shingle_hashes('hello world', 3), 16)) AS mh_len,
        |  size(shingle_set('abcdef', 3)) AS n_shingles,
        |  jaccard_sorted(winnow_fingerprint('shared middle section here', 5, 4),
        |                 winnow_fingerprint('shared middle section here', 5, 4)) AS j_win
        |""".stripMargin).collect().head
    assert(row.getAs[Double]("j_same") === 1.0)
    assert(row.getAs[Double]("j_diff") === 0.0)
    assert(row.getAs[Int]("mh_len") === 16)
    assert(row.getAs[Int]("n_shingles") === 4)
    assert(row.getAs[Double]("j_win") === 1.0)
  }

  test("vector kernels in SQL") {
    val row = sql(
      """SELECT
        |  cosine_similarity(cast(array(1.0, 0.0) as array<float>),
        |                    cast(array(1.0, 0.0) as array<float>)) AS cos_same,
        |  dot_product(cast(array(1.0, 2.0) as array<float>),
        |              cast(array(3.0, 4.0) as array<float>)) AS dot,
        |  hyperplane_sig(cast(array(0.5, -0.5, 1.0) as array<float>), 16) AS sig,
        |  size(top_centroids(cast(array(0.5, -0.5, 1.0) as array<float>), 8, 3)) AS buckets
        |""".stripMargin).collect().head
    assert(math.abs(row.getAs[Double]("cos_same") - 1.0) < 1e-9)
    assert(math.abs(row.getAs[Double]("dot") - 11.0) < 1e-9)
    assert(row.getAs[Int]("buckets") === 3)
  }

  test("fm_count_distinct aggregate in SQL") {
    spark.range(0, 20000).createOrReplaceTempView("fm_in")
    val est = sql("SELECT fm_count_distinct(id) AS est FROM fm_in")
      .collect().head.getLong(0)
    assert(est >= 5000 && est <= 160000, s"est=$est")
  }

  test("extensions class injects the same registry") {
    // the SparkSessionExtensions path used by spark.sql.extensions=...
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    // builder-injected functions land in the session at build time; here
    // we only assert the injection call path is well-formed
    succeed
  }

  test("Jaccard length-filter rule plants size guards and preserves results") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    // length-skewed pairs: guard must prune (1 vs 100 elems) without
    // changing the qualifying set
    val docs = Seq(
      (1L, "aaaa bbbb cccc dddd eeee"),
      (2L, "aaaa bbbb cccc dddd eeef"),
      (3L, "zz"),
      (4L, "aaaa bbbb cccc dddd eeee")).toDF("id", "text")
    val prep = docs.select(col("id"),
      graft.functions.TextHashFunctions.shingleHashes(col("text"), 4).as("sh"))
    val a = prep.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = prep.select(col("id").as("id_b"), col("sh").as("sh_b"))
    val joined = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(graft.functions.TextHashFunctions
        .jaccardSorted(col("sh_a"), col("sh_b")) >= 0.5)
      .select(col("id_a"), col("id_b"))
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("size("), s"no length guard in:\n$optimized")
    // guard is sound: identical + near-identical pairs survive, the
    // short doc is pruned
    assert(joined.as[(Long, Long)].collect().toSet ===
      Set((1L, 2L), (1L, 4L), (2L, 4L)))
    // idempotent under the fixpoint: exactly one guard pair (2 size()
    // refs per inequality) — a non-idempotent rule would stack more
    val nGuards = "size\\(".r.findAllIn(optimized).size
    assert(nGuards === 4, s"expected 4 size() refs, got $nGuards in:\n$optimized")
  }

  test("BPE kernels in SQL with an array-literal merge table") {
    // merges = one ('l','l') rule: hello -> h,e,ll,o (4 tokens);
    // bpe_token_count sums per-word counts over the normalized text:
    // hello(4) + world(5, no ll) = 9
    val row = sql(
      """SELECT
        |  size(bpe_tokens('hello', array('l', 'l'))) AS n_tok,
        |  bpe_token_count('Hello  World', array('l', 'l')) AS n_all
        |""".stripMargin).collect().head
    assert(row.getAs[Int]("n_tok") === 4)
    assert(row.getAs[Long]("n_all") === 9L)
  }
}
