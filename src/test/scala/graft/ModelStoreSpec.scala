package graft

import graft.ops.{Bpe, Clustering, ModelStore, Quantization}

import org.apache.spark.sql.functions._

/** Artifact persistence (round-8 verdict, "what's missing" #1): every
  * trained model round-trips through parquet BIT-IDENTICAL — doubles by
  * IEEE-bit equality, strings exactly, order pinned by index columns —
  * so a session that loads an artifact serves exactly what the training
  * session computed.
  */
class ModelStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft-mstore-$name")
    f.toFile.deleteOnExit()
    f.toString + "/artifact"
  }

  private def vecs = (1L to 64L).map { i =>
    (i, Array.tabulate(8)(j => ((i * 31 + j * 17) % 101).toFloat / 10f))
  }.toDF("vec_id", "embedding")

  test("k-means model round-trips bit-identical") {
    val (_, model) = Clustering.kmeans(vecs, "vec_id", "embedding", k = 4, maxIter = 3)
    val path = tmp("km")
    ModelStore.saveKmeans(spark, model, path)
    val loaded = ModelStore.loadKmeans(spark, path)
    assert(loaded.centroids.length === model.centroids.length)
    loaded.centroids.zip(model.centroids).foreach { case (a, b) =>
      assert(a.sameElements(b)) }
    assert(loaded.inertiaTrace === model.inertiaTrace)
  }

  test("PQ model round-trips bit-identical") {
    val model = Quantization.trainPq(vecs, "vec_id", "embedding", m = 2, k = 4, maxIter = 3)
    val path = tmp("pq")
    ModelStore.savePq(spark, model, path)
    val loaded = ModelStore.loadPq(spark, path)
    assert((loaded.m, loaded.k, loaded.subDim) === ((model.m, model.k, model.subDim)))
    loaded.codebooks.zip(model.codebooks).foreach { case (ba, bb) =>
      assert(ba.length === bb.length)
      ba.zip(bb).foreach { case (a, b) => assert(a.sameElements(b)) }
    }
    assert(loaded.errorTrace === model.errorTrace)
  }

  test("BPE merge table round-trips exactly, rank order preserved") {
    val docs = Seq("the cat sat on the mat", "the cat ate the rat",
      "a cat and a rat sat").map(Tuple1(_)).toDF("text")
    val merges = Bpe.trainMerges(docs, "text", rounds = 6)
    assert(merges.nonEmpty)
    val path = tmp("bpe")
    ModelStore.saveBpe(spark, merges, path)
    assert(ModelStore.loadBpe(spark, path) === merges)
  }

  test("winnow index store round-trips sketches and df counts") {
    val docs = (1L to 12L).map(i => (i, s"some shared words plus tail $i")).toDF("doc_id", "text")
    val sk = graft.ops.Dedup.winnowSketches(docs, "doc_id", "text", k = 5, w = 4)
    val path = tmp("winnow")
    ModelStore.saveWinnowIndex(sk, path)
    val loaded = ModelStore.loadWinnowSketches(spark, path)
    assert(sk.exceptAll(loaded).count() === 0)
    assert(loaded.exceptAll(sk).count() === 0)
    val df = ModelStore.loadWinnowDf(spark, path).as[(Long, Long)].collect().toMap
    assert(df === ModelStore.winnowDfCounts(sk).as[(Long, Long)].collect().toMap)
    // df counts one row per containing doc: every df ≥ 1, and Σ df =
    // total posting rows
    assert(df.values.forall(_ >= 1L))
    assert(df.values.sum ===
      sk.select(explode(col("fp"))).count())
  }

  test("IVF postings round-trip and the loaded store serves identically") {
    import graft.ops.Similarity
    val (_, km) = Clustering.kmeans(vecs, "vec_id", "embedding", k = 4, maxIter = 3)
    val assigned = Similarity.ivfAssign(vecs, "vec_id", "embedding", km.centroids)
    val path = tmp("ivf")
    ModelStore.saveIvfPostings(assigned, path)
    val loaded = ModelStore.loadIvfPostings(spark, path)
    assert(assigned.exceptAll(loaded).count() === 0)
    assert(loaded.exceptAll(assigned).count() === 0)
    val probes = vecs.filter(col("vec_id") % 7 === 0)
    def serve(a: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopKServe(a, probes, "vec_id", "embedding",
          km.centroids, k = 3, nProbe = 2)
        .select("probe_id", "corpus_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    assert(serve(loaded) === serve(assigned))
  }

  test("delta upsert is idempotent per batch and base ∪ delta equals the rebuild") {
    import graft.ops.Similarity
    val (_, km) = Clustering.kmeans(vecs, "vec_id", "embedding", k = 4, maxIter = 3)
    val isBatch = col("vec_id") % 5 === 0
    val basePath = tmp("ivf-base"); val deltaPath = tmp("ivf-delta")
    ModelStore.saveIvfPostings(
      Similarity.ivfAssign(vecs.filter(!isBatch), "vec_id", "embedding",
        km.centroids), basePath)
    val batchAssign = Similarity.ivfAssign(
      vecs.filter(isBatch), "vec_id", "embedding", km.centroids)
    ModelStore.upsertIvfPostings(batchAssign, deltaPath, batchId = 0L)
    // a RETRIED batch overwrites its own partition — no duplicates
    ModelStore.upsertIvfPostings(batchAssign, deltaPath, batchId = 0L)
    val store = ModelStore.loadIvfPostings(spark, basePath)
      .union(ModelStore.loadIvfDelta(spark, deltaPath))
    val rebuilt = Similarity.ivfAssign(vecs, "vec_id", "embedding", km.centroids)
    assert(store.count() === rebuilt.count()) // idempotency: exact row count
    assert(store.exceptAll(rebuilt).count() === 0)
    assert(rebuilt.exceptAll(store).count() === 0)
  }

  test("compaction swap leaves no staging artifacts and an interrupted swap is recoverable") {
    import graft.ops.Similarity
    import org.apache.hadoop.fs.Path
    val (_, km) = Clustering.kmeans(vecs, "vec_id", "embedding", k = 4, maxIter = 3)
    val isBatch = col("vec_id") % 5 === 0
    val basePath = tmp("ivf-cpt-base"); val deltaPath = tmp("ivf-cpt-delta")
    ModelStore.saveIvfPostings(Similarity.ivfAssign(vecs.filter(!isBatch),
      "vec_id", "embedding", km.centroids), basePath)
    ModelStore.upsertIvfPostings(Similarity.ivfAssign(vecs.filter(isBatch),
      "vec_id", "embedding", km.centroids), deltaPath, batchId = 0L)
    ModelStore.compactIvfPostings(spark, basePath, deltaPath)
    val fs = new Path(basePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // post-swap: only the compacted base remains — no .compacting, no
    // .old, no delta (ADVICE r10 item 3: nothing a base ∪ delta reader
    // could double-count)
    assert(!fs.exists(new Path(basePath + ".compacting")))
    assert(!fs.exists(new Path(basePath + ".old")))
    assert(!fs.exists(new Path(deltaPath)))
    val rebuilt = Similarity.ivfAssign(vecs, "vec_id", "embedding", km.centroids)
    val store = ModelStore.loadIvfPostings(spark, basePath)
    assert(store.exceptAll(rebuilt).count() === 0)
    assert(rebuilt.exceptAll(store).count() === 0)
    // simulate the one loud crash window (between rename-aside and
    // rename-in): base missing, staged complete — recovery finishes it
    assert(fs.rename(new Path(basePath), new Path(basePath + ".compacting")))
    ModelStore.recoverIvfCompaction(spark, basePath)
    assert(fs.exists(new Path(basePath)))
    assert(!fs.exists(new Path(basePath + ".compacting")))
    val recovered = ModelStore.loadIvfPostings(spark, basePath)
    assert(recovered.exceptAll(rebuilt).count() === 0)
    assert(rebuilt.exceptAll(recovered).count() === 0)
  }

  test("crash windows with the delta still present: recovery consumes it; a re-run compaction never destroys data") {
    import graft.ops.Similarity
    import org.apache.hadoop.fs.Path
    val (_, km) = Clustering.kmeans(vecs, "vec_id", "embedding", k = 4, maxIter = 3)
    val isBatch = col("vec_id") % 5 === 0
    val fsConf = spark.sparkContext.hadoopConfiguration
    def setup(tag: String): (String, String, org.apache.hadoop.fs.FileSystem) = {
      val basePath = tmp(s"ivf-cw-base-$tag"); val deltaPath = tmp(s"ivf-cw-delta-$tag")
      ModelStore.saveIvfPostings(Similarity.ivfAssign(vecs.filter(!isBatch),
        "vec_id", "embedding", km.centroids), basePath)
      ModelStore.upsertIvfPostings(Similarity.ivfAssign(vecs.filter(isBatch),
        "vec_id", "embedding", km.centroids), deltaPath, batchId = 0L)
      (basePath, deltaPath, new Path(basePath).getFileSystem(fsConf))
    }
    val rebuilt = Similarity.ivfAssign(vecs, "vec_id", "embedding", km.centroids)
    def assertStoreIsCompacted(basePath: String, deltaPath: String,
        fs: org.apache.hadoop.fs.FileSystem): Unit = {
      // the delta MUST be gone: staged ⊇ delta, so a surviving delta
      // would make base ∪ delta readers double-count every delta row
      assert(!fs.exists(new Path(deltaPath)), "delta survived — double-count hazard")
      assert(!fs.exists(new Path(basePath + ".compacting")))
      assert(!fs.exists(new Path(basePath + ".old")))
      val store = ModelStore.loadIvfPostings(spark, basePath)
      assert(store.exceptAll(rebuilt).count() === 0)
      assert(rebuilt.exceptAll(store).count() === 0)
    }
    // window A: crash BETWEEN rename-aside and delta-delete — base
    // missing, old = original base, staged = base∪delta, delta PRESENT.
    // Recovery must promote staged AND consume the delta.
    locally {
      val (basePath, deltaPath, fs) = setup("a")
      ModelStore.loadIvfPostings(spark, basePath)
        .union(ModelStore.loadIvfDelta(spark, deltaPath))
        .write.parquet(basePath + ".compacting")
      assert(fs.rename(new Path(basePath), new Path(basePath + ".old")))
      ModelStore.recoverIvfCompaction(spark, basePath, Some(deltaPath))
      assertStoreIsCompacted(basePath, deltaPath, fs)
    }
    // window B: same crash state, but the operator RE-RUNS the
    // compaction instead of calling recovery — it must replay the swap,
    // not delete the only remaining copies (the data-loss path the
    // base-missing guard closes)
    locally {
      val (basePath, deltaPath, fs) = setup("b")
      ModelStore.loadIvfPostings(spark, basePath)
        .union(ModelStore.loadIvfDelta(spark, deltaPath))
        .write.parquet(basePath + ".compacting")
      assert(fs.rename(new Path(basePath), new Path(basePath + ".old")))
      ModelStore.compactIvfPostings(spark, basePath, deltaPath)
      assertStoreIsCompacted(basePath, deltaPath, fs)
    }
    // window C (defensive, unreachable under the write ordering): base
    // and staged both missing, old present, delta present — recovery
    // restores the PRE-compaction pair and keeps the delta, and a
    // subsequent compaction completes normally
    locally {
      val (basePath, deltaPath, fs) = setup("c")
      assert(fs.rename(new Path(basePath), new Path(basePath + ".old")))
      ModelStore.recoverIvfCompaction(spark, basePath, Some(deltaPath))
      assert(fs.exists(new Path(basePath)))
      assert(fs.exists(new Path(deltaPath)), "old-restore must KEEP the delta")
      ModelStore.compactIvfPostings(spark, basePath, deltaPath)
      assertStoreIsCompacted(basePath, deltaPath, fs)
    }
    // window D: a batch ingested AFTER the crash (so not in the staged
    // copy) must SURVIVE the replay — the manifest bounds the delete to
    // exactly the folded batches; the survivor then compacts normally
    locally {
      val (basePath, deltaPath, fs) = setup("d")
      // run a real compaction to produce a manifest-backed staged copy,
      // then rewind the swap to the crash window (base aside, staged
      // back) WITHOUT touching the manifest the compaction wrote
      val preStore = ModelStore.loadIvfPostings(spark, basePath)
        .union(ModelStore.loadIvfDelta(spark, deltaPath))
      preStore.write.parquet(basePath + ".compacting")
      ModelStore.saveIvfPostings(preStore, basePath + ".predelta") // keep a copy for asserts
      // simulate: compaction wrote staged + manifest (batch 0), renamed
      // base aside, then crashed before deleting the delta partitions
      val manifest = new Path(basePath + ".compacting.manifest")
      val out = fs.create(manifest, true)
      out.write("0".getBytes("UTF-8")); out.close()
      assert(fs.rename(new Path(basePath), new Path(basePath + ".old")))
      // a post-crash upsert lands batch 1 into the SAME delta dir
      ModelStore.upsertIvfPostings(Similarity.ivfAssign(vecs.filter(isBatch),
        "vec_id", "embedding", km.centroids).withColumn("corpus_id",
        col("corpus_id") + lit(1000000L)), deltaPath, batchId = 1L)
      ModelStore.recoverIvfCompaction(spark, basePath, Some(deltaPath))
      // batch 0 consumed, batch 1 alive, base == staged content
      assert(fs.exists(new Path(basePath)))
      assert(!fs.exists(new Path(deltaPath + "/ingest_batch=0")),
        "folded batch must be consumed")
      assert(fs.exists(new Path(deltaPath + "/ingest_batch=1")),
        "post-crash batch must survive recovery")
      assert(!fs.exists(manifest))
      val served = ModelStore.loadIvfPostings(spark, basePath)
        .union(ModelStore.loadIvfDelta(spark, deltaPath))
      val want = ModelStore.loadIvfPostings(spark, basePath + ".predelta")
        .union(ModelStore.loadIvfDelta(spark, deltaPath))
      assert(served.exceptAll(want).count() === 0)
      assert(want.exceptAll(served).count() === 0)
    }
  }

  test("retrain policy: exact total-variation basis points, both directions, missing buckets as zero") {
    val spark2 = spark
    import spark2.implicits._
    def bc(rows: (Long, Long)*) = rows.toDF("bucket", "n")
    // identical distributions: zero drift
    assert(ModelStore.retrainDue(bc(0L -> 50L, 1L -> 50L),
      bc(0L -> 100L, 1L -> 100L)) === (0L, false))
    // hand-computed: build (75, 25)/100, now (50, 50)/100 -> TV = 25% = 2500 bp
    val (tv, due) = ModelStore.retrainDue(bc(0L -> 75L, 1L -> 25L),
      bc(0L -> 50L, 1L -> 50L))
    assert(tv === 2500L && due)
    // a bucket present only on one side counts with zero mass on the other:
    // build all in 0, now all in 1 -> TV = 100% = 10000 bp
    assert(ModelStore.retrainDue(bc(0L -> 10L), bc(1L -> 10L)) === (10000L, true))
    // boundary: exactly at the threshold fires (>= contract, like rebuildDue)
    assert(ModelStore.retrainDue(bc(0L -> 90L, 1L -> 10L),
      bc(0L -> 80L, 1L -> 20L), thresholdBp = 1000L) === (1000L, true))
    // just below does not
    assert(!ModelStore.retrainDue(bc(0L -> 90L, 1L -> 10L),
      bc(0L -> 80L, 1L -> 20L), thresholdBp = 1001L)._2)
    intercept[IllegalArgumentException](ModelStore.retrainDue(bc(), bc(0L -> 1L)))
  }

  test("rebuild policy: exact basis-point arithmetic at the thresholds") {
    // tombstone threshold 500 bp: 499/10000 stays, 500/10000 fires
    assert(!ModelStore.rebuildDue(10000L, 499L, 0L)._3)
    assert(ModelStore.rebuildDue(10000L, 500L, 0L)._3)
    // churn threshold 2000 bp: deletes+adds combine; integer floor div
    assert(!ModelStore.rebuildDue(10000L, 100L, 1899L)._3) // 1999 bp
    assert(ModelStore.rebuildDue(10000L, 100L, 1900L)._3)  // 2000 bp
    val (delBp, churnBp, due) = ModelStore.rebuildDue(7L, 1L, 0L)
    assert(delBp === 1428L && churnBp === 1428L && due) // floor(10000/7)
    intercept[IllegalArgumentException](ModelStore.rebuildDue(0L, 0L, 0L))
    intercept[IllegalArgumentException](ModelStore.rebuildDue(10L, 11L, 0L))
  }
}
