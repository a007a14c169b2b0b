package graft

import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** LSH bucket-width cap (the 100 TB skew guard): a planted degenerate
  * bucket — a family of near-identical templated docs that exact dedup
  * would NOT collapse — must be dropped by every banded candidate
  * generator before its member list materializes, while genuine near-dup
  * pairs outside the hot bucket keep flowing. Also pins the plan shape:
  * the width-counting window and the member-collecting groupBy share one
  * exchange (the cap must not buy memory safety with a second shuffle).
  */
class BucketCapSpec extends SparkSpec {
  import spark.implicits._

  // Templated docs: identical 20-word skeleton + one trailing unique
  // token → pairwise 3-shingle Jaccard 18/20 = 0.9, so per band ~90% of
  // the family shares the all-common-shingle band hash (one bucket of
  // width ≈ 0.9·n in every band); distinct texts, so exact dedupe keeps
  // them all. This is exactly the boilerplate shape the cap targets.
  private def templated(n: Int): Seq[(Long, String)] =
    (0 until n).map(i =>
      (100L + i, "breaking news update follow this link for the full exclusive " +
        s"story today with more details inside our live coverage page v$i"))

  private lazy val docs = (templated(40) ++ Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"),
    (3L, "a completely different document about spark aggregation pipelines")
  )).toDF("doc_id", "text")

  test("minhash cap drops the degenerate bucket, keeps the genuine pair") {
    val capped = DedupOps.minhashNearDupPairs(docs, "text", "doc_id",
        n = 3, numHashes = 64, bands = 32, threshold = 0.5, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the templated family (≥11-wide buckets in every band) produces no pairs
    assert(!capped.exists { case (a, b) => a >= 100L && b >= 100L },
      s"degenerate-bucket pairs leaked through the cap: $capped")
    // the genuine near-dup pair lives in width-2 buckets — unaffected
    assert(capped.contains((1L, 2L)), s"cap dropped the genuine pair: $capped")
    // control: an ample cap recovers the templated pairs
    val uncapped = DedupOps.minhashNearDupPairs(docs, "text", "doc_id",
        n = 3, numHashes = 64, bands = 32, threshold = 0.5, maxBucket = 5000)
      .count()
    assert(uncapped > 40L * 39 / 2 - 50, s"control run lost real pairs: $uncapped")
  }

  test("bare capped generators surface their drop counts (no silent caps)") {
    // minhash: the planted 40-member family fills ≥11-wide buckets in
    // every band → the WithDrops report names them and the one-row
    // rollup counts them (the bare call logs the same rollup)
    val (pairs, drops) = DedupOps.minhashNearDupPairsFromShinglesWithDrops(
      DedupOps.shingleHashTable(docs, "text", "doc_id", 3), maxBucket = 10)
    assert(drops.isDefined, "capped call returned no drop report")
    val summary = DedupOps.capDropSummary(drops.get).collect()(0)
    assert(summary.getLong(0) > 0, "planted hot bucket not counted as dropped")
    assert(summary.getLong(1) >= summary.getLong(0) * 11,
      s"dropped-row mass ${summary.getLong(1)} too small for " +
        s"${summary.getLong(0)} buckets wider than 10")
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .contains((1L, 2L)), "pairs result changed by the WithDrops split")
    // uncapped: no report, nothing to log
    assert(DedupOps.minhashNearDupPairsFromShinglesWithDrops(
      DedupOps.shingleHashTable(docs, "text", "doc_id", 3),
      maxBucket = DedupOps.NoBucketCap)._2.isEmpty)

    // simhash: 30 identical signatures → one width-30 bucket per band
    val planted = 0x0123456789ABCDEFL
    val sig = ((0 until 30).map(i => (100L + i, planted)) ++
      Seq((1L, 0x7F00FF00FF00FF00L))).toDF("doc_id", "simhash")
    val (_, simDrops) = DedupOps.simhashNearDupPairsWithDrops(sig, maxBucket = 10)
    assert(simDrops.isDefined)
    val simSummary = DedupOps.capDropSummary(simDrops.get).collect()(0)
    assert(simSummary.getLong(0) == 4L && simSummary.getLong(1) == 120L,
      s"expected 4 width-30 buckets dropped, got ${simSummary.mkString(",")}")
  }

  test("simhash cap drops the degenerate bucket, keeps the genuine pair") {
    // planted signatures: 30 identical (one bucket of width 30 in all 4
    // bands), a hamming-1 genuine pair whose 16-bit bands never collide
    // with the planted value, and one far-away singleton
    val planted = 0x0123456789ABCDEFL
    val g = 0x7F00FF00FF00FF00L
    val sig = ((0 until 30).map(i => (100L + i, planted)) ++ Seq(
      (1L, g), (2L, g ^ 1L), (3L, -1L))).toDF("doc_id", "simhash")
    val capped = DedupOps.simhashNearDupPairs(sig, maxHamming = 3, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists { case (a, b) => a >= 100L && b >= 100L },
      s"degenerate-bucket pairs leaked through the simhash cap: $capped")
    assert(capped == Set((1L, 2L)), s"expected only the genuine pair: $capped")
    val control = DedupOps.simhashNearDupPairs(sig, maxHamming = 3, maxBucket = 5000).count()
    assert(control == 30L * 29 / 2 + 1, s"control run wrong pair count: $control")
  }

  test("embedding-LSH cap drops a degenerate vector bucket") {
    // 30 near-identical vectors (one hot cluster) + 2 genuine near-dups
    // apart from the cluster + 1 unrelated direction
    val dim = 8
    val hot = Array(1f, 2f, 3f, 4f, 4f, 3f, 2f, 1f)
    val other = Array(-5f, 4f, -3f, 2f, -2f, 3f, -4f, 5f)
    // hot cluster: tiny unique bump on dim 0 → distinct vectors, cosine
    // ≈ 1, identical sign buckets in (nearly) every band
    val vecs = (0 until 30).map(i =>
      (100L + i, hot.toSeq.updated(0, hot(0) + 0.0001f * i))) ++ Seq(
      (1L, other.toSeq), (2L, other.toSeq.updated(0, other(0) + 0.001f)),
      (3L, Seq(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f)))
    val emb = vecs.toDF("vid", "vd")
    val capped = DedupOps.lshEmbeddingNearDupPairs(emb, "vid", "vd", dim,
        t2 = 0.98, maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists { case (a, b) => a >= 100L && b >= 100L },
      s"degenerate vector bucket leaked: $capped")
    assert(capped.contains((1L, 2L)), s"cap dropped the genuine vector pair: $capped")
  }

  test("incremental prepared dedup caps both candidate legs and still judges every new doc") {
    val corpus = (templated(25) ++ Seq(
      (3L, "a completely different document about spark aggregation pipelines")))
      .toDF("doc_id", "text")
    val newBatch = Seq(
      (1000L, "breaking news update follow this link for the full exclusive " +
        "story today with more details inside our live coverage page v999"),
      (1001L, "a completely different document about spark aggregation pipes"),
      (1002L, "entirely novel content with no relatives anywhere in the corpus at all")
    ).toDF("doc_id", "text")
    val idx = DedupOps.buildCorpusDedupIndex(corpus, "text", "doc_id", maxBucket = 10)
    val out = DedupOps.incrementalDedupPrepared(newBatch, idx, "text", "doc_id", maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // every new doc gets a verdict even when its buckets were dropped
    assert(out.keySet == Set(1000L, 1001L, 1002L))
    // 1000 joins only degenerate (dropped) corpus buckets → judged kept
    assert(out(1000L) == "kept", s"dropped-bucket doc judged ${out(1000L)}")
    // 1001's neighborhood (width ≤ 2) is untouched by the cap
    assert(out(1001L) == "near_dup", s"genuine near-dup judged ${out(1001L)}")
    assert(out(1002L) == "kept")
  }

  test("oversizedBuckets reports the planted bucket") {
    val sh = DedupOps.shingleHashTable(docs, "text", "doc_id", 3)
    val sig = DedupOps.minhashSignaturesFromShingles(sh, 64)
    // rebuild the band table through the public generator's own params by
    // probing the monitor at a cap the fixture exceeds
    val report = DedupOps.oversizedBuckets(
      sig.select(col("doc_id"), explode(array((0 until 32).map { j =>
        struct(lit(j).as("band_idx"),
          xxhash64(col(s"h${j * 2}"), col(s"h${j * 2 + 1}")).as("band_hash"))
      }: _*)).as("b")).select(col("b.band_idx"), col("b.band_hash")),
      Seq("band_idx", "band_hash"), maxBucket = 10)
    val widths = report.collect().map(_.getAs[Long]("bucket_width"))
    assert(widths.nonEmpty && widths.forall(_ > 10), s"monitor missed the hot bucket: ${widths.toSeq}")
  }

  test("index build reports what the cap dropped; summary rolls it up") {
    val (idx, drops) = DedupOps.buildCorpusDedupIndexWithReport(
      docs, "text", "doc_id", maxBucket = 10)
    assert(idx.params.exists(_.maxBucket == 10))
    val rows = drops.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("bucket_width") > 10),
      s"index-build report missed the hot bucket: ${rows.toSeq}")
    val s = DedupOps.capDropSummary(drops).collect()(0)
    assert(s.getAs[Long]("n_dropped_buckets") == rows.length.toLong)
    assert(s.getAs[Long]("n_dropped_rows") == rows.map(_.getAs[Long]("bucket_width")).sum)
    // and an uncapped summary is an explicit zero row, not an empty frame
    val z = DedupOps.capDropSummary(
      DedupOps.minhashOversizedBuckets(
        DedupOps.shingleHashTable(docs, "text", "doc_id", 3),
        maxBucket = DedupOps.NoBucketCap)).collect()(0)
    assert(z.getAs[Long]("n_dropped_buckets") == 0L && z.getAs[Long]("n_dropped_rows") == 0L)
  }

  test("curation sink records the near-dup cap drops next to the stage outputs") {
    val out = new java.io.File(sys.props("java.io.tmpdir"), "graft_cap_report_chain").getPath
    try {
      val curated = graft.operators.CurationPipeline.curateToParquet(
        docs.withColumn("lang", lit("en")), "text", "doc_id", "lang",
        evalPred = col("doc_id") < 0, outDir = out, maxBucket = 10)
      // the cap protected the run: templated family survives (no pairs)
      assert(curated.count() >= 40)
      val report = spark.read.parquet(s"$out/reports/near_dup_cap_drops.parquet")
      val widths = report.collect().map(_.getAs[Long]("bucket_width"))
      assert(widths.nonEmpty && widths.forall(_ > 10),
        s"chain cap-drop report missed the hot bucket: ${widths.toSeq}")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    }
  }

  test("width window and member collect share one exchange; candidate stage shape is unchanged") {
    // literal signature frame isolates the candidate generator's plan
    val sig = (1 to 6).map(i => (i.toLong, (i % 2).toLong, (i % 3).toLong))
      .toDF("doc_id", "h0", "h1")
    val plan = DedupOps.lshCandidatePairs(sig, bands = 1, rowsPerBand = 2)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    // 1 = bucket-key shuffle (window + groupBy reuse it), 2 = pair distinct;
    // a third exchange means the cap added its own shuffle
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
