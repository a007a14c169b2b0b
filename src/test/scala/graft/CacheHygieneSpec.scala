package graft

import org.apache.spark.sql.functions._

import graft.operators.{CurationPipeline, DedupOps}

/** The eager chain runners must leave executor storage exactly as they
  * found it: a long-lived session running curation or ingest dedup
  * repeatedly must not accumulate cached frames (round-4/5 advice — the
  * lazy chains persist between stages by design, so the parquet-sink
  * variants own the unpersist).
  */
class CacheHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    new java.io.File(sys.props("java.io.tmpdir"), s"graft_cachehygiene_$name").getPath

  private lazy val docs = ((0 until 60).map { i =>
    (i.toLong, s"document number $i about topic ${i % 7} with several words of content to pass the gates easily", "en")
  } ++ Seq(
    (100L, "document number 3 about topic 3 with several words of content to pass the gates easily", "en"), // exact dup of 3
    (900L, "an evaluation benchmark question about topic seven and its answer text", "en")
  )).toDF("doc_id", "text", "lang")

  test("curateToParquet unpersists every chain cache") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = CurationPipeline.curateToParquet(docs, "text", "doc_id", "lang",
      col("doc_id") >= 900, tmp("curate"))
    assert(out.count() > 0)
    // RDD-id SETS, not counts: the ContextCleaner may concurrently
    // unpersist OTHER suites' dead caches between the two measurements
    // (seen once under heavy host load), which under a count compare
    // masks a real leak of the same size. The cleaner only ever REMOVES
    // ids, and suites run sequentially in the forked JVM, so any id in
    // after-minus-before was cached by the operation under test
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"curateToParquet leaked cached frames with RDD ids $leaked")
  }

  test("curateFullToParquet unpersists every chain cache") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = CurationPipeline.curateFullToParquet(docs, "text", "doc_id", "lang",
      col("doc_id") >= 900, tmp("curatefull"),
      minWords = 3, lineWords = 2, lineMinDocs = 50, spanWords = 3, spanMinCount = 50)
    assert(out.count() > 0)
    // RDD-id SETS, not counts: the ContextCleaner may concurrently
    // unpersist OTHER suites' dead caches between the two measurements
    // (seen once under heavy host load), which under a count compare
    // masks a real leak of the same size. The cleaner only ever REMOVES
    // ids, and suites run sequentially in the forked JVM, so any id in
    // after-minus-before was cached by the operation under test
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"curateFullToParquet leaked cached frames with RDD ids $leaked")
  }

  test("the WithCaches variants hand back every persisted frame (round-15 advice)") {
    import graft.operators.{ScrubOps, SimilarityOps, TextOps}
    // distinctive literals so CacheManager plan-matching can't alias
    // these frames with another suite's cached plans
    val vecs = (0 until 24).map { i =>
      (i.toLong + 7000L, Seq.tabulate(4)(d =>
        (if (d == i % 3) 11.0 else 0.0) + 0.01 * ((i * 7 + d) % 5)))
    }.toDF("vec_id", "embedding")
    val texts = (0 until 30).map(i =>
      (i.toLong + 7000L, s"hygiene fixture doc $i topic ${i % 5} with shared window phrase alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")

    def assertClean(label: String)(run: => Seq[org.apache.spark.sql.DataFrame]): Unit = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val caches = run
      caches.foreach(_.unpersist(true))
      // RDD-id SETS, not counts (see the suites above for the rationale)
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty, s"$label leaked cached frames with RDD ids $leaked")
    }

    assertClean("semanticDedupWithCaches (capped)") {
      val (res, caches) = SimilarityOps.semanticDedupWithCaches(vecs, "vec_id",
        "embedding", k = 3, maxIter = 5, t2 = 0.81, maxCell = 5)
      res.collect()
      assert(caches.size == 2, "expected the labeled frame + the cell-width frame")
      caches
    }
    assertClean("incrementalSemanticDedupWithCaches (capped)") {
      val batch = vecs.filter(col("vec_id") % 4 === 0)
        .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
      val (res, caches) = SimilarityOps.incrementalSemanticDedupWithCaches(
        batch, vecs, "vec_id", "embedding", k = 3, maxIter = 5, t2 = 0.81,
        maxCell = 5)
      res.collect()
      assert(caches.size == 4, "expected both labeled sides + both width frames")
      caches
    }
    // The PLAIN capped wrappers cannot hand caches back, so they must
    // release the cap width frame(s) themselves (round-16 advice: the
    // q143/q144 shape through the plain entry point leaked the width
    // frame for the session). With cacheLabeled=false the call must
    // leave storage exactly as found.
    assertClean("semanticDedup plain (capped, cacheLabeled=false)") {
      val res = SimilarityOps.semanticDedup(vecs, "vec_id", "embedding",
        k = 3, maxIter = 5, t2 = 0.81, cacheLabeled = false, maxCell = 5)
      res.collect()
      Nil
    }
    assertClean("incrementalSemanticDedup plain (capped, cacheLabeled=false)") {
      val batch = vecs.filter(col("vec_id") % 4 === 0)
        .select((col("vec_id") + 2000L).as("vec_id"), col("embedding"))
      val res = SimilarityOps.incrementalSemanticDedup(batch, vecs, "vec_id",
        "embedding", k = 3, maxIter = 5, t2 = 0.81, cacheLabeled = false,
        maxCell = 5)
      res.collect()
      Nil
    }
    assertClean("qualityClassifierWithCaches") {
      val (res, caches) = TextOps.qualityClassifierWithCaches(texts, "text",
        "doc_id", col("doc_id") % 3 === 0, steps = 2)
      res.collect()
      assert(caches.size == 1, "expected the persisted feature table")
      caches
    }
    assertClean("decontaminateScrubWithCaches") {
      val (res, caches) = ScrubOps.decontaminateScrubWithCaches(texts, "text",
        "doc_id", col("doc_id") % 3 === 0, n = 5, window = 2)
      res.collect()
      assert(caches.size == 1, "expected the persisted tokenized frame")
      caches
    }
  }

  test("semanticDedup plain (cacheQuantized) releases the quantized frame (r19 advice)") {
    import graft.operators.SimilarityOps
    // distinctive literals so CacheManager plan-matching can't alias
    // these frames with another suite's cached plans
    val vecs = (0 until 24).map { i =>
      (i.toLong + 91000L, Seq.tabulate(4)(d =>
        (if (d == i % 3) 13.0 else 0.0) + 0.01 * ((i * 11 + d) % 5)))
    }.toDF("vec_id", "embedding")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val res = SimilarityOps.semanticDedup(vecs, "vec_id", "embedding",
      k = 3, maxIter = 5, t2 = 0.81, cacheQuantized = true)
    res.collect()
    // the labeled frame stays cached BY DESIGN (the verdict plan reads
    // it); the quantized (vid, qv) frame must not — before the fix each
    // plain cacheQuantized call leaked a second corpus-sized cache
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1,
      s"expected at most the labeled frame cached, got RDD ids $leaked")
    spark.catalog.clearCache()
  }

  test("incrementalDedupToParquet unpersists the index and batch caches") {
    val corpus = docs.filter(col("doc_id") < 900)
    val batch = Seq(
      (5000L, "document number 3 about topic 3 with several words of content to pass the gates easily"),
      (5001L, "a brand new document with entirely original content today")
    ).toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = DedupOps.incrementalDedupToParquet(batch, corpus, "text", "doc_id", tmp("inc"))
    val byId = out.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(byId(5000L) == "exact_dup" && byId(5001L) == "kept")
    // RDD-id SETS, not counts: the ContextCleaner may concurrently
    // unpersist OTHER suites' dead caches between the two measurements
    // (seen once under heavy host load), which under a count compare
    // masks a real leak of the same size. The cleaner only ever REMOVES
    // ids, and suites run sequentially in the forked JVM, so any id in
    // after-minus-before was cached by the operation under test
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"incrementalDedupToParquet leaked cached frames with RDD ids $leaked")
  }
}
