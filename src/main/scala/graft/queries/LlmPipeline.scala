package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{CurationPipeline, DedupOps, GraphOps, MultimodalOps, ScrubOps, SimilarityOps, SplitOps, TextOps, VectorIndex}

/** Training-data-pipeline operator surface (north star beyond the
  * reference): dedupe, similarity search, text analysis, multimodal
  * plumbing — over the `documents` and `embeddings` tables.
  */
object LlmPipeline {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedupe: planted duplicates (every 50th doc re-appended with a
    // shifted id) collapse to the smallest id.
    "q26_dedup_exact" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") % 50 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val (_, groups) = DedupOps.exactDedup(docs.unionByName(planted), "text", "doc_id")
      groups.select(col("keeper_id").cast("long").as("keeper_id"),
          col("n_docs").cast("long").as("n_docs"))
        .orderBy("keeper_id")
    }),

    // Near-dup pairs, brute-force 3-gram shingle Jaccard (correctness
    // baseline for the LSH path).
    "q27_neardup_brute" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      DedupOps.bruteNearDupPairs(docs, "text", "doc_id", n = 3, threshold = 0.5)
        .orderBy("doc_a", "doc_b")
    }),

    // Same pairs via MinHash+LSH (64 hashes, 32 bands × 2 rows) with exact
    // post-verification — the 100 TB path; shares the brute-force oracle.
    "q28_neardup_minhash" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      DedupOps.minhashNearDupPairs(docs, "text", "doc_id",
          n = 3, numHashes = 64, bands = 32, threshold = 0.5,
          maxBucket = DedupOps.NoBucketCap)
        .orderBy("doc_a", "doc_b")
    }),

    // SimHash near-dup pairs (hamming ≤ 3). Signatures use the sha256-
    // prefix 60-bit token hash so DuckDB recomputes the identical pipeline
    // end-to-end (the xxhash64 default stays for production speed — same
    // operator, different tokenHash argument).
    "q29_neardup_simhash" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sig = DedupOps.simhash(docs, "text", "doc_id",
        tokenHash = DedupOps.shaTokenHash, bits = 60)
      DedupOps.simhashNearDupPairs(sig, maxHamming = 3, bits = 60,
          maxBucket = DedupOps.NoBucketCap)
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
        .orderBy("doc_a", "doc_b")
    }),

    // ANN: brute-force cosine top-5 neighbors per vector.
    "q30_ann_topk_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilarityOps.bruteTopK(emb, "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    // ANN scale path: IVF-style search restricted to the coarse cell
    // (the precomputed cluster label).
    "q31_ann_topk_cell" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilarityOps.topKWithinPartition(emb, "vec_id", "embedding", "label", k = 3)
        .select(col("cell").cast("long").as("cell"), col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy("query_id", "rank")
    }),

    // ANN memory-compressed scale path: product quantization. Codebooks
    // seed deterministically (16 smallest-id vectors, 4 subspaces of 16
    // dims), every vector encodes to 4 small codes, and search is the
    // asymmetric-distance scan (per-query lookup table, m adds per
    // neighbor, never the neighbor's floats) restricted to the query's
    // IVF cell — the composition that scans a 100 TB corpus from ~1.5%
    // of its bytes. Integer-exact throughout, so the oracle rebuilds
    // codebooks, codes, lookup tables, and ranks end-to-end.
    "q102_ann_topk_pq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cb = SimilarityOps.pqCodebooks(emb, "vec_id", "embedding",
        dim = 64, m = 4, k = 16)
      SimilarityOps.pqAdcTopK(emb, "vec_id", "embedding", cb, k = 3,
          cellCol = Some("label"))
        .orderBy("query_id", "rank")
    }),

    // q102 with TRAINED codebooks: two Lloyd iterations refine every
    // subspace codebook (one Spark job per iteration trains all four —
    // the (subspace, code, dim) sufficient-statistics shuffle is
    // O(k·dim) rows regardless of corpus size), then the same
    // encode + cell-restricted ADC scan runs on the trained model.
    // Integer-exact end to end; the oracle unrolls
    // seed → assign → update → assign → update → encode → rank in SQL.
    "q103_ann_topk_pq_trained" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cb = SimilarityOps.pqTrainCodebooks(emb, "vec_id", "embedding",
        dim = 64, m = 4, k = 16, maxIter = 2)
      SimilarityOps.pqAdcTopK(emb, "vec_id", "embedding", cb, k = 3,
          cellCol = Some("label"))
        .orderBy("query_id", "rank")
    }),

    // Residual IVF-PQ (the IVFADC composition): same cell restriction
    // as q102, but codes quantize cell-centroid RESIDUALS instead of
    // raw vectors — residuals cluster around zero with far smaller
    // spread, so the same 4×16 code budget quantizes finer (the design
    // every production IVF-PQ store uses). Centroids are truncating
    // integer means per cell (the kmeansTrain update rule), residuals
    // and ADC distances exact longs, so the oracle rebuilds
    // centroid → residual → codebooks → codes → rank bit-identically.
    "q107_ann_topk_ivfpq_residual" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilarityOps.ivfPqTopK(emb, "vec_id", "embedding", "label",
          dim = 64, m = 4, k = 16, topK = 3)
        .orderBy("query_id", "rank")
    }),

    // q107 with multi-probe: each query searches its TWO nearest cells
    // by centroid distance (re-residualizing against each probed cell's
    // centroid, the per-list ADC a disk-resident IVFADC runs) — the
    // recall lever for queries filed near a cell boundary. Neighbor
    // codes are q107's own-cell residual codes, encoded once.
    "q108_ann_topk_ivfpq_probed" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilarityOps.ivfPqTopKProbed(emb, "vec_id", "embedding", "label",
          dim = 64, m = 4, k = 16, nprobe = 2, topK = 3)
        .orderBy("query_id", "rank")
    }),

    // Two-stage retrieval: q108's multi-probe ADC scan kept to a
    // 10-candidate shortlist per query, then EXACT squared-L2 re-rank
    // on the quantized vectors — only the |Q|·10 surviving pairs touch
    // raw vectors, so at 100 TB the exact arithmetic runs on a
    // vanishing fraction of the corpus (the standard IVF-PQ refinement
    // stage). Exact longs end to end.
    "q109_ann_topk_ivfpq_refined" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilarityOps.ivfPqTopKRefined(emb, "vec_id", "embedding", "label",
          dim = 64, m = 4, k = 16, nprobe = 2, shortlist = 10, topK = 3)
        .orderBy("query_id", "rank")
    }),

    // The PERSISTED-index lifecycle (the q78 pattern applied to ANN):
    // build the residual IVF-PQ index ONCE per corpus (cell-partitioned
    // codes parquet + model tables under a data-stamped tmp dir), then
    // answer q109's exact query THROUGH the stored files — the
    // build-once / query-many path a serving vector store runs, where
    // per-query cost is the probed partitions' codes + a |Q|·shortlist
    // raw-vector fetch, never a corpus re-encode. Results (and the
    // DuckDB oracle) are q109's verbatim — VectorIndexSpec pins the
    // persisted-vs-derived equality.
    "q110_ann_topk_indexed" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val root = ensureQ110Index(s, dir, emb)
      val model = VectorIndex.readModel(s, root, dim = 64, m = 4, k = 16)
      val codes = VectorIndex.readCodes(s, root)
      VectorIndex.query(emb, "vec_id", "embedding", model, codes,
          rawVectors = emb, nprobe = 2, shortlist = 10, topK = 3)
        .orderBy("query_id", "rank")
    }),

    // The index-lifecycle oracle: build the persisted index on the
    // FIRST HALF of the corpus (vec_id <= max/2), APPEND the second
    // half through the stored quantizer (coarse-assign to the nearest
    // stored centroid, encode with the stale codebooks — the standard
    // between-retrains ingest, where model staleness is the documented
    // trade), then answer q109's query over the combined index. The
    // DuckDB oracle unrolls base-model → base-codes → assign → append-
    // codes → probe → ADC → exact re-rank end to end. A fresh work dir
    // per run: append is cumulative, so reuse would double rows.
    "q111_ann_topk_index_appended" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cutoff = emb.agg(max(col("vec_id").cast("long"))).head().getLong(0) / 2
      val base = emb.filter(col("vec_id") <= cutoff)
      val rest = emb.filter(col("vec_id") > cutoff)
      val root = java.nio.file.Files.createTempDirectory("graft_q111_vindex_").toFile
      org.apache.commons.io.FileUtils.forceDeleteOnExit(root)
      val (model, codes) = VectorIndex.build(base, "vec_id", "embedding", "label",
        dim = 64, m = 4, k = 16)
      VectorIndex.write(model, codes, root.getPath)
      VectorIndex.append(rest, "vec_id", "embedding", model, root.getPath)
      VectorIndex.query(emb, "vec_id", "embedding", model,
          VectorIndex.readCodes(s, root.getPath), rawVectors = emb,
          nprobe = 2, shortlist = 10, topK = 3)
        .orderBy("query_id", "rank")
    }),

    // The FULL lifecycle loop, closing q111's documented staleness trade:
    // build v1 on the base half → swap the pointer → append the second
    // half through the (now stale) v1 model and serve it (phase 'stale'
    // ≡ q111's answer) → RETRAIN from the full corpus into v2 → atomic
    // pointer swap → serve again (phase 'retrained' ≡ q109's answer,
    // because a full retrain is definitionally the derive-in-query model
    // on the full corpus). The oracle is the two phases' SQL composed
    // verbatim — no third derivation to drift.
    "q112_ann_index_retrain_swap" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cutoff = emb.agg(max(col("vec_id").cast("long"))).head().getLong(0) / 2
      val base = emb.filter(col("vec_id") <= cutoff)
      val rest = emb.filter(col("vec_id") > cutoff)
      val root = java.nio.file.Files.createTempDirectory("graft_q112_vindex_").toFile
      org.apache.commons.io.FileUtils.forceDeleteOnExit(root)
      val (m1, c1) = VectorIndex.build(base, "vec_id", "embedding", "label",
        dim = 64, m = 4, k = 16)
      VectorIndex.writeVersion(m1, c1, root.getPath, 1)
      VectorIndex.swapPointer(root.getPath, 1)
      VectorIndex.append(rest, "vec_id", "embedding", m1,
        VectorIndex.versionDir(root.getPath, 1))
      val stale = VectorIndex.query(emb, "vec_id", "embedding",
          VectorIndex.readCurrentModel(s, root.getPath, dim = 64, m = 4, k = 16),
          VectorIndex.readCurrentCodes(s, root.getPath), rawVectors = emb,
          nprobe = 2, shortlist = 10, topK = 3)
        .withColumn("phase", lit("stale"))
      VectorIndex.retrainAndSwap(emb, "vec_id", "embedding", "label",
        dim = 64, m = 4, k = 16, root.getPath)
      val fresh = VectorIndex.query(emb, "vec_id", "embedding",
          VectorIndex.readCurrentModel(s, root.getPath, dim = 64, m = 4, k = 16),
          VectorIndex.readCurrentCodes(s, root.getPath), rawVectors = emb,
          nprobe = 2, shortlist = 10, topK = 3)
        .withColumn("phase", lit("retrained"))
      stale.unionByName(fresh)
        .select("phase", "query_id", "neighbor_id", "exact_dist", "rank")
        .orderBy("phase", "query_id", "rank")
    }),

    // Filtered ANN (the serving store's metadata pre-filter): the
    // predicate narrows the candidate set BEFORE the ADC scan — a
    // post-filter would return fewer than topK — and sits directly on
    // the codes relation, so it runs inside the scan stage before the
    // probe join (a comparison/IN predicate would additionally push
    // into parquet row-group stats). Served through q110's cached
    // persisted index.
    "q113_ann_topk_filtered" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val root = ensureQ110Index(s, dir, emb)
      VectorIndex.query(emb, "vec_id", "embedding",
          VectorIndex.readModel(s, root, dim = 64, m = 4, k = 16),
          VectorIndex.readCodes(s, root), rawVectors = emb,
          nprobe = 2, shortlist = 10, topK = 3,
          neighborFilter = Some(col("vid") % 2 === 0))
        .orderBy("query_id", "rank")
    }),

    // Tombstoned deletes: ids % 7 == 0 are deleted from a fresh copy of
    // the index (tombstones are an append-only side table anti-joined
    // out before the ADC scan; code files never rewritten — the
    // LSM-style delete, folded away at the next retrain). A fresh work
    // dir per run keeps the tombstone table deterministic.
    "q114_ann_topk_deleted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val root = java.nio.file.Files.createTempDirectory("graft_q114_vindex_").toFile
      org.apache.commons.io.FileUtils.forceDeleteOnExit(root)
      val (model, codes) = VectorIndex.build(emb, "vec_id", "embedding", "label",
        dim = 64, m = 4, k = 16)
      VectorIndex.write(model, codes, root.getPath)
      VectorIndex.delete(emb.filter(col("vec_id") % 7 === 0).select("vec_id"),
        "vec_id", root.getPath)
      VectorIndex.query(emb, "vec_id", "embedding", model,
          VectorIndex.readCodes(s, root.getPath), rawVectors = emb,
          nprobe = 2, shortlist = 10, topK = 3,
          tombstones = Some(VectorIndex.readTombstones(s, root.getPath)))
        .orderBy("query_id", "rank")
    }),

    // Streaming ingest into the persisted vector index: build the base
    // index on the first half of the corpus, then stream the second
    // half through StreamOps.vectorIngestSink in three REAL micro-batch
    // triggers (split by vec_id % 3) of one unrestarted query — each
    // trigger encodes against the STORED model and commits its own
    // exactly-once ingest segment. Encoding is per-row against the
    // stored model, so any batch split yields byte-identical codes to
    // q111's one bulk append — the final query over base + committed
    // segments answers exactly q111's oracle (which unrolls the
    // stale-model append end to end in SQL). VectorIndexSpec pins the
    // replay/torn-segment exactly-once semantics; this entry pins the
    // multi-trigger end state under the driver's hash gate.
    "q115_ann_stream_ingest" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val emb = t(s, dir, "embeddings")
      val cutoff = emb.agg(max(col("vec_id").cast("long"))).head().getLong(0) / 2
      val base = emb.filter(col("vec_id") <= cutoff)
      val rest = emb.filter(col("vec_id") > cutoff)
      val root = java.nio.file.Files.createTempDirectory("graft_q115_vindex_").toFile
      org.apache.commons.io.FileUtils.forceDeleteOnExit(root)
      val ckpt = java.nio.file.Files.createTempDirectory("graft_q115_ckpt_").toFile
      org.apache.commons.io.FileUtils.forceDeleteOnExit(ckpt)
      val (model, codes) = VectorIndex.build(base, "vec_id", "embedding", "label",
        dim = 64, m = 4, k = 16)
      VectorIndex.write(model, codes, root.getPath)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Double])]
      val q = graft.streaming.StreamOps.vectorIngestSink(
          input.toDF().toDF("vec_id", "embedding"),
          "vec_id", "embedding", model, root.getPath)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("0 seconds"))
        .option("checkpointLocation", ckpt.getPath)
        .start()
      def feed(df: DataFrame): Unit = {
        input.addData(df.select(col("vec_id").cast("long"),
            col("embedding").cast("array<double>"))
          .as[(Long, Seq[Double])].collect().toSeq: _*)
        q.processAllAvailable()
      }
      try (0 until 3).foreach(r => feed(rest.filter(col("vec_id") % 3 === r)))
      finally q.stop()
      VectorIndex.query(emb, "vec_id", "embedding", model,
          VectorIndex.readCodesWithIngest(s, root.getPath), rawVectors = emb,
          nprobe = 2, shortlist = 10, topK = 3)
        .orderBy("query_id", "rank")
    }),

    // Segment-fold compaction: q115's streamed ingest segments are
    // folded into the next index version (same model, one consolidated
    // cell-partitioned codes tree — the small-files compaction a
    // per-trigger segment layout needs at scale) and the query is
    // served through the SWAPPED version. Fold never re-encodes, so
    // the answer is q111's oracle verbatim — byte-identical to the
    // pre-fold q115 state, proven under the driver's hash gate.
    "q116_ann_stream_ingest_folded" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val emb = t(s, dir, "embeddings")
      val cutoff = emb.agg(max(col("vec_id").cast("long"))).head().getLong(0) / 2
      val base = emb.filter(col("vec_id") <= cutoff)
      val rest = emb.filter(col("vec_id") > cutoff)
      val root = java.nio.file.Files.createTempDirectory("graft_q116_vindex_").toFile
      org.apache.commons.io.FileUtils.forceDeleteOnExit(root)
      val ckpt = java.nio.file.Files.createTempDirectory("graft_q116_ckpt_").toFile
      org.apache.commons.io.FileUtils.forceDeleteOnExit(ckpt)
      val (model, codes) = VectorIndex.build(base, "vec_id", "embedding", "label",
        dim = 64, m = 4, k = 16)
      VectorIndex.writeVersion(model, codes, root.getPath, 1)
      VectorIndex.swapPointer(root.getPath, 1)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Double])]
      val q = graft.streaming.StreamOps.vectorIngestSink(
          input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
          model, VectorIndex.versionDir(root.getPath, 1))
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("0 seconds"))
        .option("checkpointLocation", ckpt.getPath)
        .start()
      try (0 until 3).foreach { r =>
        input.addData(rest.filter(col("vec_id") % 3 === r)
          .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
          .as[(Long, Seq[Double])].collect().toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      val v = VectorIndex.foldIngestAndSwap(s, root.getPath, dim = 64, m = 4, k = 16)
      require(v == 2, s"fold must swap to version 2, got $v")
      VectorIndex.query(emb, "vec_id", "embedding",
          VectorIndex.readCurrentModel(s, root.getPath, dim = 64, m = 4, k = 16),
          VectorIndex.readCurrentCodes(s, root.getPath), rawVectors = emb,
          nprobe = 2, shortlist = 10, topK = 3)
        .orderBy("query_id", "rank")
    }),

    // The versioned ingest lifecycle under the hash gate: POINTER-
    // resolved streaming sink (each trigger re-reads root/POINTER, so
    // maintenance swaps roll the running ingest with no restart) driven
    // across a segment fold AND a full retrain — triggers 1-2 land in
    // v1, the fold absorbs them into v2 (carrying the folded-batch
    // ledger that keeps cross-swap replays exactly-once), trigger 3
    // lands in v2, and the closing full-corpus retrain produces v3 =
    // the derive-in-query model over the full corpus, so the final
    // answer is q109's oracle verbatim. VectorIndexSpec pins the
    // cross-swap replay no-ops this entry's determinism rests on.
    "q117_ann_stream_ingest_versioned" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val emb = t(s, dir, "embeddings")
      val cutoff = emb.agg(max(col("vec_id").cast("long"))).head().getLong(0) / 2
      val base = emb.filter(col("vec_id") <= cutoff)
      val rest = emb.filter(col("vec_id") > cutoff)
      val root = java.nio.file.Files.createTempDirectory("graft_q117_vindex_").toFile
      org.apache.commons.io.FileUtils.forceDeleteOnExit(root)
      val ckpt = java.nio.file.Files.createTempDirectory("graft_q117_ckpt_").toFile
      org.apache.commons.io.FileUtils.forceDeleteOnExit(ckpt)
      val (m1, c1) = VectorIndex.build(base, "vec_id", "embedding", "label",
        dim = 64, m = 4, k = 16)
      VectorIndex.writeVersion(m1, c1, root.getPath, 1)
      VectorIndex.swapPointer(root.getPath, 1)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Double])]
      val q = graft.streaming.StreamOps.vectorIngestSinkVersioned(
          input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
          root.getPath, dim = 64, m = 4, k = 16)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("0 seconds"))
        .option("checkpointLocation", ckpt.getPath)
        .start()
      def feed(r: Int): Unit = {
        input.addData(rest.filter(col("vec_id") % 3 === r)
          .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
          .as[(Long, Seq[Double])].collect().toSeq: _*)
        q.processAllAvailable()
      }
      try {
        feed(0); feed(1)
        VectorIndex.foldIngestAndSwap(s, root.getPath, dim = 64, m = 4, k = 16)
        feed(2)
      } finally q.stop()
      val v = VectorIndex.retrainAndSwap(emb, "vec_id", "embedding", "label",
        dim = 64, m = 4, k = 16, root.getPath)
      require(v == 3, s"lifecycle must close on version 3, got $v")
      VectorIndex.query(emb, "vec_id", "embedding",
          VectorIndex.readCurrentModel(s, root.getPath, dim = 64, m = 4, k = 16),
          VectorIndex.readCurrentCodes(s, root.getPath), rawVectors = emb,
          nprobe = 2, shortlist = 10, topK = 3)
        .orderBy("query_id", "rank")
    }),

    // Retention GC under the hash gate: build → batch-append → fold
    // (v2) → prune. Vector versions are self-contained (fold rewrites
    // codes and carries both ledgers into the new dir), so the prune
    // collects v1 whole, the served answer is STILL q111's oracle
    // (fold re-encodes nothing), and a replay of the folded batch
    // against the pruned index still no-ops through the CARRIED ledger.
    "q129_ann_index_pruned" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cutoff = emb.agg(max(col("vec_id").cast("long"))).head().getLong(0) / 2
      val base = emb.filter(col("vec_id") <= cutoff)
      val rest = emb.filter(col("vec_id") > cutoff)
      val root = java.nio.file.Files.createTempDirectory("graft_q129_vindex_").toFile
      org.apache.commons.io.FileUtils.forceDeleteOnExit(root)
      val (m1, c1) = VectorIndex.build(base, "vec_id", "embedding", "label",
        dim = 64, m = 4, k = 16)
      VectorIndex.writeVersion(m1, c1, root.getPath, 1)
      VectorIndex.swapPointer(root.getPath, 1)
      val batch = rest.select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      require(VectorIndex.appendBatch(batch, "vec_id", "embedding", m1,
        VectorIndex.versionDir(root.getPath, 1), batchId = 0L))
      VectorIndex.foldIngestAndSwap(s, root.getPath, dim = 64, m = 4, k = 16)
      require(VectorIndex.pruneVersions(root.getPath) == Seq(1),
        "prune must collect exactly the superseded version")
      require(!graft.io.IndexMeta.exists(VectorIndex.versionDir(root.getPath, 1)))
      require(!VectorIndex.appendBatch(batch, "vec_id", "embedding",
        VectorIndex.readCurrentModel(s, root.getPath, dim = 64, m = 4, k = 16),
        VectorIndex.versionDir(root.getPath, 2), batchId = 0L),
        "the carried ledger must keep blocking the folded batch's replay")
      VectorIndex.query(emb, "vec_id", "embedding",
          VectorIndex.readCurrentModel(s, root.getPath, dim = 64, m = 4, k = 16),
          VectorIndex.readCurrentCodes(s, root.getPath), rawVectors = emb,
          nprobe = 2, shortlist = 10, topK = 3)
        .orderBy("query_id", "rank")
    }),

    // q129's END STATE served without re-running the lifecycle: the
    // pruned vector index (half-build + batch append + fold + prune) is
    // built ONCE per (sf, fingerprint) and cached; later calls only
    // resolve the pointer and query — the q134 bench-hygiene split for
    // the vector family. Answer is q111's oracle verbatim (fold
    // re-encodes nothing, prune collects only unreferenced versions).
    "q135_ann_pruned_serve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val root = ensurePrunedVectorIndex(s, dir, emb)
      VectorIndex.query(emb, "vec_id", "embedding",
          VectorIndex.readCurrentModel(s, root, dim = 64, m = 4, k = 16),
          VectorIndex.readCurrentCodes(s, root), rawVectors = emb,
          nprobe = 2, shortlist = 10, topK = 3)
        .orderBy("query_id", "rank")
    }),

    // ANN without a precomputed label: hyperplane-LSH quantizer with
    // multi-probe (flip the lowest-|margin| plane bits). Plane signs are
    // sha-derived and projections integer-quantized, so the oracle
    // recomputes buckets, probes, candidates, and ranks end-to-end.
    "q53_ann_topk_hyperplane" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilarityOps.multiProbeTopK(emb, "vec_id", "embedding",
          numPlanes = 4, dim = 64, probes = 4, k = 5)
        .orderBy("query_id", "rank")
    }),

    // Embedding-cosine near-dup, brute baseline: all pairs with cosine
    // ≥ 0.9 over the embeddings corpus plus deterministic near-copies
    // (the base table has no organic high-cosine pairs — max ≈ 0.6 — so
    // every 5th vector is re-appended with its first component × 1.25,
    // cosine ≥ 0.99 to its source). Arithmetic is integer-quantized
    // (floor(x·1e6) longs) so the oracle is bit-exact.
    "q54_neardup_embedding" -> ((s, dir) => {
      DedupOps.bruteEmbeddingNearDupPairs(nearDupCorpus(s, dir), "vid", "vd", t2 = 0.81)
        .orderBy("vec_a", "vec_b")
    }),

    // Same pairs via banded sign-LSH (16 bands × 8 hyperplanes) with exact
    // integer-cosine verification — the 100 TB path; shares q54's corpus
    // and produces identical output (miss probability ≈ 6e-11 per true
    // pair at cosine 0.99).
    // 16 planes/band: 16-bit buckets hold the ~1/65536 random-collision
    // rate down so the exact-verify join sees thousands of candidates,
    // not millions (8-bit buckets cost 5x the whole query); planted
    // near-dups are cos ≥ 0.996, where a 16x16 banding misses with
    // p ≈ 1e-7.
    "q55_neardup_embedding_lsh" -> ((s, dir) => {
      DedupOps.lshEmbeddingNearDupPairs(nearDupCorpus(s, dir), "vid", "vd",
          dim = 64, bands = 16, planesPerBand = 16, t2 = 0.81,
          maxBucket = DedupOps.NoBucketCap)
        .orderBy("vec_a", "vec_b")
    }),

    // Language ID (marker-word heuristic) vs the labeled lang column.
    "q32_lang_id" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id").cast("long").as("doc_id"),
          TextOps.langId(col("text")).as("lang_pred"),
          col("lang").as("lang_label"))
        .orderBy("doc_id")
    }),

    // Quality scoring bands.
    "q33_quality_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      TextOps.qualityMetrics(docs, "text")
        .select("doc_id", "n_words", "n_chars", "distinct_ratio", "quality_score", "quality_band")
        .orderBy("doc_id")
    }),

    // Fingerprint + token count.
    "q34_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"),
          TextOps.fingerprint(col("text")).as("fp"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .orderBy("doc_id")
    }),

    // Multimodal plumbing: binary payload → mapPartitions decode (stub
    // codec) → typed metadata.
    "q35_multimodal_meta" -> ((s, dir) => {
      val media = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("media_id"), encode(col("text"), "UTF-8").as("payload"))
      MultimodalOps.decodeMetadata(media, "media_id", "payload")
        .toDF().orderBy("media_id")
    }),

    // Frame sampling: every 3rd frame of each decoded payload as its own
    // row — the video-to-frames explode a training pipeline feeds into
    // per-frame dedupe/embedding.
    "q56_frame_sample" -> ((s, dir) => {
      val media = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("media_id"), encode(col("text"), "UTF-8").as("payload"))
      MultimodalOps.sampleFrames(media, "media_id", "payload", everyK = 3)
        .orderBy("media_id", "frame_idx")
    }),

    // Gopher-style repetition filter: per-doc word/bigram distinct ratios
    // with an integer-arithmetic 30%-duplicate-words flag. Scan-side only.
    "q64_repetition_ratio" -> ((s, dir) => {
      TextOps.repetitionStats(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")
    }),

    // Benchmark decontamination: docs with doc_id % 10 == 0 stand in for
    // the eval set; report training docs sharing any distinct 5-gram.
    "q65_contamination_check" -> ((s, dir) => {
      DedupOps.contaminationReport(t(s, dir, "documents"), "text", "doc_id",
          col("doc_id") % 10 === 0, n = 5)
        .orderBy("train_doc")
    }),

    // GPT-3-style decontamination SCRUB: instead of dropping docs that
    // share a 5-gram with the eval set (q65), excise the overlap plus
    // 10 words each side and keep the rest. Oracle replays coverage on
    // the span STRINGS (the q75 convention).
    "q142_decontaminate_scrub" -> ((s, dir) => {
      ScrubOps.decontaminateScrub(t(s, dir, "documents"), "text", "doc_id",
          col("doc_id") % 10 === 0, n = 5, window = 10)
        .orderBy("doc_id")
    }),

    // Corpus statistics: global top-20 trigrams by count (count desc,
    // gram asc) — map-side partial agg + TakeOrderedAndProject.
    "q66_top_ngrams" -> ((s, dir) => {
      TextOps.topNgrams(t(s, dir, "documents"), "text", n = 3, k = 20)
    }),

    // Bigram-LM surprisal scoring (the CCNet-style perplexity quality
    // signal), self-trained on the corpus: the 25 most-surprising docs
    // by integer mean surprisal. The oracle re-derives the model AND
    // the scores — add-one-smoothed conditional MLE, per-bigram
    // floor(-ln(p)·10⁶) longs (the BM25 quantization convention, so
    // the per-doc sums are exact integers on both engines).
    "q131_bigram_surprisal" -> ((s, dir) => {
      TextOps.bigramSurprisal(t(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("avg_q").desc, col("doc_id").asc).limit(25)
    }),

    // The SALTED Zipf-skew path of q131 (SkewOps.saltedJoin on both
    // model joins — the scale shape AQE can't rewrite here): same
    // arithmetic, different routing, so the output is bit-identical
    // and q131's oracle gates it verbatim — the salted path was
    // spec-only (TextStatsSpec) before this.
    "q145_bigram_surprisal_salted" -> ((s, dir) => {
      TextOps.bigramSurprisal(t(s, dir, "documents"), "text", "doc_id",
          saltBuckets = 4)
        .orderBy(col("avg_q").desc, col("doc_id").asc).limit(25)
    }),

    // SemDeDup-style semantic dedup over the planted near-dup corpus:
    // train the k=8 coarse quantizer (2 Lloyd iterations, integer-
    // exact), then judge pairs WITHIN a trained cell by the exact
    // integer-quantized cosine (≥ 0.9 ⇒ the higher id is a duplicate of
    // its lowest matching cluster-mate). The oracle unrolls the
    // training (q76's CTEs) and replays the in-cell pair math (q54's).
    "q136_semantic_dedup" -> ((s, dir) => {
      SimilarityOps.semanticDedup(nearDupCorpus(s, dir), "vid", "vd",
          k = 8, maxIter = 2, t2 = 0.81)
        .orderBy("vid")
    }),

    // Leakage-safe train/val/test split: the q68 near-dup components
    // (MinHash+LSH pairs, identical to the brute set) are the unit of
    // assignment — cluster-mates can never straddle a split — gated by
    // the portable sha256 prefix of the component id. The oracle
    // re-derives the components (recursive-CTE reachability) and the
    // gate.
    "q140_leakage_safe_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = DedupOps.minhashNearDupPairs(docs, "text", "doc_id",
        n = 3, numHashes = 64, bands = 32, threshold = 0.5,
        maxBucket = DedupOps.NoBucketCap)
      SplitOps.leakageSafeSplit(docs, "doc_id", pairs, "doc_a", "doc_b")
        .orderBy("doc_id")
    }),

    // Keep-best near-dup retention (RefinedWeb/FineWeb "keep longest"):
    // q68's components keep their longest member (n_chars, min-id
    // tie-break) instead of the min id — the keeper derives from a
    // combinable struct-max, never a per-cluster sort window.
    "q141_neardup_keep_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = DedupOps.minhashNearDupPairs(docs, "text", "doc_id",
        n = 3, numHashes = 64, bands = 32, threshold = 0.5,
        maxBucket = DedupOps.NoBucketCap)
      SplitOps.nearDupKeepBest(docs, "doc_id", col("n_chars"),
          pairs, "doc_a", "doc_b")
        .orderBy("doc_id")
    }),

    // SemDeDup hot-cell cap under PLANTED skew (the q82 maxBucket
    // pattern applied to trained cells): 250 identical clones of vector
    // 1 collapse onto one centroid, blowing that cell past maxCell=150 —
    // the capped pair legs drop the hot cell (members KEPT, recall gone
    // by policy), while normal cells keep judging the planted pert
    // dups. The oracle mirrors the deterministic cell-width exclusion:
    // widths from the final assignment, wide cells out of the pair CTE,
    // verdicts over ALL vectors.
    "q143_semantic_dedup_capped" -> ((s, dir) => {
      SimilarityOps.semanticDedup(hotCellCorpus(s, dir), "vid", "vd",
          k = 8, maxIter = 2, t2 = 0.81, maxCell = 150)
        .orderBy("vid")
    }),

    // Incremental SemDeDup (the q73/q78 ingestion stance applied to
    // embedding dedup): the coarse quantizer trains on the CORPUS only;
    // the batch is judged within trained cells against corpus vectors
    // AND lower-id batch-mates, dup_of = least match. The oracle
    // re-trains (q136's unroll), assigns the batch through the trained
    // centroids, and replays both pair legs.
    "q139_semantic_dedup_incremental" -> ((s, dir) => {
      val (corpus, batch) = semBatchParts(s, dir)
      SimilarityOps.incrementalSemanticDedup(batch, corpus, "vid", "vd",
          k = 8, maxIter = 2, t2 = 0.81)
        .orderBy("vid")
    }),

    // Incremental SemDeDup's hot-cell cap under PLANTED skew on BOTH
    // legs (q143's gate applied to the q139 shape): clones of vector 1
    // blow one corpus cell (+3e5, half the base) AND one batch cell
    // (+4e5, a third of the base) past maxCell=150 — the corpus leg
    // stops offering candidates from the wide corpus cell, the batch
    // leg from the wide batch cell, while every batch vector still
    // receives a verdict (judged side uncapped). The oracle adds the
    // per-leg width exclusions to q139's unroll — widths counted on
    // each side's OWN final assignment.
    "q144_semantic_dedup_incremental_capped" -> ((s, dir) => {
      val (corpus, batch) = semBatchPartsHot(s, dir)
      SimilarityOps.incrementalSemanticDedup(batch, corpus, "vid", "vd",
          k = 8, maxIter = 2, t2 = 0.81, maxCell = 150)
        .orderBy("vid")
    }),

    // DSIR-style hashed importance scores: docs with doc_id % 10 == 0
    // stand in for the high-quality target (the q65 convention); every
    // raw doc scores by the sum of per-bucket smoothed log-ratio
    // micro-nats over its 256-bucket hashed unigrams. The oracle
    // re-derives the bucket model AND the scores.
    "q137_dsir_scores" -> ((s, dir) => {
      TextOps.dsirScores(t(s, dir, "documents"), "text", "doc_id",
          col("doc_id") % 10 === 0)
        .orderBy("doc_id")
    }),

    // Trained quality classifier (the GPT-3-pipeline recipe): 3
    // full-batch logistic-regression epochs over 256-bucket hashed
    // binary features, target = doc_id % 10 == 0, exact integer
    // micro-unit weights. The oracle unrolls all three epochs —
    // residuals, gradients, truncating updates — and replays the
    // trained margins.
    "q138_quality_classifier" -> ((s, dir) => {
      TextOps.qualityClassifier(t(s, dir, "documents"), "text", "doc_id",
          col("doc_id") % 10 === 0, steps = 3)
        .orderBy("doc_id")
    }),

    // Transitive near-dup clusters: connected components over the
    // 3-gram Jaccard ≥ 0.5 pair graph (pairs via MinHash+LSH+verify,
    // identical to the brute set) — component = min member id, the
    // canonical keeper a chain a~b~c collapses to even when a~c is
    // below threshold. Oracle: DuckDB recursive CTE reachability.
    "q68_neardup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = DedupOps.minhashNearDupPairs(docs, "text", "doc_id",
        n = 3, numHashes = 64, bands = 32, threshold = 0.5,
        maxBucket = DedupOps.NoBucketCap)
      GraphOps.connectedComponents(pairs, "doc_a", "doc_b")
        .orderBy("doc_id")
    }),

    // One Lloyd step of the IVF coarse-quantizer training: deterministic
    // first-k-by-id seeds, exact integer assignment + sufficient
    // statistics (per-cell, per-dim component sums and counts) — the
    // full distributed inner loop of kmeansTrain, oracle-checked.
    "q72_kmeans_step" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = SimilarityOps.initialCentroids(emb, "vec_id", "embedding", k = 8)
      SimilarityOps.kmeansStepSums(emb, "vec_id", "embedding", cents)
        .orderBy("cell", "dim")
    }),

    // FULL curation chain v2: quality gate → exact dedup → line-level
    // boilerplate removal → span-level substring dedup → near-dup
    // removal → decontamination (vs the ORIGINAL eval texts), then
    // per-language stats. The oracle replays every stage in SQL.
    "q77_corpus_pipeline_full" -> ((s, dir) => {
      val curated = CurationPipeline.curateFull(t(s, dir, "documents"),
        "text", "doc_id", "lang", col("doc_id") % 10 === 0,
        maxBucket = DedupOps.NoBucketCap)
      CurationPipeline.statsByLang(curated)
    }),

    // End-to-end trained-quantizer IVF ANN: two Lloyd iterations train
    // the coarse cells (integer-exact, deterministic), then the
    // cell-restricted top-3 search runs on the TRAINED labels. The
    // oracle unrolls both iterations (assign -> update -> assign ->
    // update -> final assign) and re-ranks in SQL.
    "q76_ann_topk_trained" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = SimilarityOps.kmeansTrain(emb, "vec_id", "embedding", k = 8, maxIter = 2)
      val labeled = SimilarityOps.kmeansAssign(
        emb.select(col("vec_id").cast("long").as("vec_id"), col("embedding")),
        "vec_id", "embedding", cents)
      SimilarityOps.topKWithinPartition(labeled, "vec_id", "embedding", "cell", k = 3)
        .select(col("cell"), col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy("query_id", "rank")
    }),

    // Incremental ingestion dedup: the new batch = re-id'd docs
    // (doc_id%7==3 under +1e6; planted corpus exact-dups %50==0 under
    // +2e6; planted in-batch dups %100==1 under +3e6) judged against the
    // corpus (everything else) — exact fingerprint stage, then MinHash-
    // banded near-dup stage with side-aware candidate generation.
    "q73_incremental_dedup" -> ((s, dir) => {
      val (corpus, newBatch) = incrementalBatchParts(s, dir)
      DedupOps.incrementalDedup(newBatch, corpus, "text", "doc_id",
          n = 3, numHashes = 64, bands = 32, threshold = 0.5,
          maxBucket = DedupOps.NoBucketCap)
        .orderBy("new_id")
    }),

    // Same judgment through the PREPARED path: the corpus fingerprint/
    // shingle/band index is materialized ONCE per sf dir as bucketed
    // tables (each bucketed by its join key) and every subsequent run
    // only reads it — per-ingest compute is proportional to the batch
    // and the corpus side joins co-located with no exchange, which is
    // what makes daily ingestion into a 100 TB corpus viable. Output
    // (and oracle) identical to q73.
    "q78_incremental_dedup_prepared" -> ((s, dir) => {
      val (corpus, newBatch) = incrementalBatchParts(s, dir)
      // v2: uncapped build (oracle parity — see DedupOps.NoBucketCap) +
      // layout manifest; the name bump orphans pre-manifest index dirs
      val prefix = "graft_q78v2_index_" + corpusStamp(dir)
      val root = new java.io.File(sys.props("java.io.tmpdir"), prefix)
      if (!DedupOps.corpusDedupIndexExists(s, prefix)) {
        cleanStaleIndexDirs("graft_q78v2_index_" +
          Integer.toHexString(dir.hashCode) + "_", prefix)
        // bucketed files survive across sessions; the in-memory catalog
        // doesn't — re-attach when present, build+write only once per dir
        if (new java.io.File(root, "manifest.json").exists())
          DedupOps.attachCorpusDedupIndex(s, prefix, root.getPath)
        else DedupOps.writeCorpusDedupIndex(
          DedupOps.buildCorpusDedupIndex(corpus, "text", "doc_id",
            n = 3, numHashes = 64, bands = 32,
            maxBucket = DedupOps.NoBucketCap),
          prefix, buckets = 16, path = Some(root.getPath))
      }
      val idx = DedupOps.readCorpusDedupIndex(s, prefix)
      DedupOps.incrementalDedupPrepared(newBatch, idx, "text", "doc_id",
          n = 3, numHashes = 64, bands = 32, threshold = 0.5,
          maxBucket = DedupOps.NoBucketCap)
        .orderBy("new_id")
    }),

    // Retention GC for the corpus-dedup index family — the q128/q129
    // analogue for the third persisted index. Lifecycle per evaluation:
    // gen1 build (q78 params) → promote → compact to gen2 → checked
    // promote (retires gen1 into the retirement ledger) →
    // pruneCorpusDedupIndex collects gen1 → judge the q78 batch through
    // the pointer-resolved PRUNED index. Shares q78's oracle: the GC
    // must not change a single judgment — dedup state and replay
    // idempotence ride the compaction (copied fingerprints + carried
    // tags), never the collected generation.
    "q132_dedup_index_pruned" -> ((s, dir) => {
      val (corpus, newBatch) = incrementalBatchParts(s, dir)
      val runTag = java.util.UUID.randomUUID().toString.take(8)
      val (g1, g2) = (s"graft_q132_gen1_$runTag", s"graft_q132_gen2_$runTag")
      val work = java.nio.file.Files.createTempDirectory("graft_q132_").toFile
      org.apache.commons.io.FileUtils.forceDeleteOnExit(work)
      def sub(n: String) = new java.io.File(work, n).getPath
      val store = graft.io.BatchStore.local(sub("store"))
      val key = "pointers/dedup_index.json"
      DedupOps.writeCorpusDedupIndex(
        DedupOps.buildCorpusDedupIndex(corpus, "text", "doc_id",
          n = 3, numHashes = 64, bands = 32, maxBucket = DedupOps.NoBucketCap),
        g1, buckets = 16, path = Some(sub("gen1")))
      DedupOps.promoteCorpusDedupIndexChecked(s, store, key, g1, Some(sub("gen1")))
      DedupOps.compactCorpusDedupIndex(s, g1, g2, buckets = 16,
        path = Some(sub("gen2"))).count()
      DedupOps.promoteCorpusDedupIndexChecked(s, store, key, g2, Some(sub("gen2")))
      val collected = DedupOps.pruneCorpusDedupIndex(s, store, key, keepRetired = 0)
      require(collected.map(e => String.valueOf(e("collected"))) == Seq("deleted"),
        s"q132 lifecycle: expected gen1 collected, got $collected")
      require(!graft.io.IndexMeta.exists(sub("gen1")),
        "q132 lifecycle: collected generation's files survived the prune")
      val prefix = DedupOps.resolveCorpusDedupIndex(s, store, key)
      val idx = DedupOps.readCorpusDedupIndex(s, prefix)
      DedupOps.incrementalDedupPrepared(newBatch, idx, "text", "doc_id",
          n = 3, numHashes = 64, bands = 32, threshold = 0.5,
          maxBucket = DedupOps.NoBucketCap)
        .orderBy("new_id")
    }),

    // Span-level substring dedup (Lee-et-al-style, order-free variant):
    // every 10-word span occurring ≥2 times corpus-wide is removed from
    // every covered position; planted full copies (every 25th doc under
    // +500000) blank out both copies entirely.
    "q75_span_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
      ScrubOps.spanDedup(docs.unionByName(planted), "text", "doc_id",
          spanWords = 10, minCount = 2)
        .orderBy("doc_id")
    }),

    // C4-style line-level boilerplate removal. The corpus has no
    // newlines, so both engines deterministically re-chunk each doc into
    // 4-word lines first; a line appearing in ≥3 distinct docs is dropped
    // from every doc and the survivors reassemble in original order.
    "q69_line_dedup" -> ((s, dir) => {
      val ws = col("_ws")
      val lines = transform(sequence(lit(0), floor((size(ws) - 1) / 4).cast("int")),
        i => array_join(slice(ws, i * 4 + 1, lit(4)), " "))
      val withNl = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"),
          split(DedupOps.normText(col("text")), " ").as("_ws"))
        .select(col("doc_id"), array_join(lines, "\n").as("text"))
      ScrubOps.lineFrequencyFilter(withNl, "text", "doc_id", minDocs = 3)
        .orderBy("doc_id")
    }),

    // PII redaction: deterministic synthetic PII (email/phone/IPv4 built
    // from doc_id) appended to each doc, then scrubbed. Counts measure
    // the raw text per pattern; replacement order email → phone → ip.
    "q70_pii_redact" -> ((s, dir) => {
      val id = col("doc_id")
      val withPii = t(s, dir, "documents")
        .select(id.cast("long").as("doc_id"),
          concat(col("text"),
            lit(" contact u"), id.cast("string"), lit("@ex"),
            (id % 10).cast("string"), lit(".org call 555-01"),
            lpad((id % 100).cast("string"), 2, "0"), lit("-4567 ip 10.0."),
            (id % 256).cast("string"), lit("."), (id % 100).cast("string")).as("text"))
      ScrubOps.redactPii(withPii, "text", "doc_id").orderBy("doc_id")
    }),

    // Gopher-style quality gate: integer-arithmetic rules, per-rule
    // flags folded into an ordered fail-reasons audit string.
    "q71_quality_gate" -> ((s, dir) =>
      TextOps.gopherQuality(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")),

    // Full curation chain: repetition filter (≤70% dup words) → exact
    // dedup → near-dup removal (MinHash+LSH, Jaccard ≥ 0.5) →
    // decontamination (5-gram overlap with the doc_id%10==0 eval set),
    // then per-language corpus stats. The oracle independently reruns
    // the whole chain in SQL (brute-force near-dup pairs).
    "q67_corpus_pipeline" -> ((s, dir) => {
      val curated = CurationPipeline.curate(t(s, dir, "documents"),
        "text", "doc_id", "lang", col("doc_id") % 10 === 0,
        maxBucket = DedupOps.NoBucketCap)
      CurationPipeline.statsByLang(curated)
    }),

    // ---- skewed-corpus fixture: the LSH bucket cap AT BENCH SCALE ----
    // A 4×-corpus-size templated family (identical 20-word skeleton +
    // one unique trailing token per doc — distinct texts, so exact dedup
    // keeps all of them; pairwise Jaccard 0.9) lands ~90% of its members
    // in ONE band bucket per band. Uncapped, that is O(famN²) candidate
    // pairs (2e8 at sf0.1) — the web-boilerplate pathology the cap
    // exists for. Capped at `skewCap`, the family contributes nothing.

    // Near-dup pairs over the skewed corpus, cap active: the family's
    // wide buckets drop before member lists build, its suffix-influenced
    // buckets are width-1 (no pairs), and every genuine base pair is in
    // narrow buckets — so the capped output over base∪family equals the
    // BRUTE pairs over base alone, which is exactly the oracle.
    "q82_skew_neardup_capped" -> ((s, dir) => {
      DedupOps.minhashNearDupPairs(skewedDocs(s, dir), "text", "doc_id",
          n = 3, numHashes = 64, bands = 32, threshold = 0.5,
          maxBucket = skewCap)
        .orderBy("doc_a", "doc_b")
    }),

    // Daily-ingest shape under skew: the capped bucketed index is built
    // (and persisted, q78-style) over base∪family; the batch carries
    // exact copies, near-perturbed copies, and 20 fresh family members.
    // Expected: copies judge exact_dup, perturbed judge near_dup, and
    // the family probes' corpus buckets were dropped at index build so
    // they judge against each other only (greedy: first kept, rest
    // near_dup of it). The oracle replays the uncapped stages brute
    // WITH the family removed from the corpus-near leg — modeling the
    // cap — so a cap regression (family pairs leaking, or probes
    // fanning out) diverges loudly.
    "q83_skew_ingest_capped" -> ((s, dir) => {
      val (corpus, batch) = skewIngestParts(s, dir)
      val prefix = "graft_q83_index_" + corpusStamp(dir)
      val root = new java.io.File(sys.props("java.io.tmpdir"), prefix)
      if (!DedupOps.corpusDedupIndexExists(s, prefix)) {
        cleanStaleIndexDirs("graft_q83_index_" +
          Integer.toHexString(dir.hashCode) + "_", prefix)
        if (new java.io.File(root, "manifest.json").exists())
          DedupOps.attachCorpusDedupIndex(s, prefix, root.getPath)
        else DedupOps.writeCorpusDedupIndex(
          DedupOps.buildCorpusDedupIndex(corpus, "text", "doc_id",
            n = 3, numHashes = 64, bands = 32, maxBucket = skewCap),
          prefix, buckets = 16, path = Some(root.getPath))
      }
      val idx = DedupOps.readCorpusDedupIndex(s, prefix)
      DedupOps.incrementalDedupPrepared(batch, idx, "text", "doc_id",
          n = 3, numHashes = 64, bands = 32, threshold = 0.5,
          maxBucket = skewCap)
        .orderBy("new_id")
    }),

    // ---- full index lifecycle at bench scale: append → compact → ----
    // ---- re-ingest, under planted skew --------------------------------
    // Round-8 proof that the maintenance half of the daily-ingest story
    // holds: a batch of 800 fresh family members is ACCEPTED into the
    // capped index (batch-sized tag-keyed append — idempotent, so bench
    // reps and verify re-runs hit the committed epoch and skip), the
    // index is then COMPACTED with re-cap (the appended family's ~0.9 ×
    // 800-wide band buckets exceed skewCap and drop — the compaction
    // report must be non-empty), and a second batch is judged against
    // the compacted index. The batch2 legs pin every lifecycle
    // property: exact copies of appended docs prove the append survived
    // compaction (fingerprints are never capped); perturbed base copies
    // prove compaction preserved the base bands; 20 fresh family
    // members prove the re-cap holds (their only corpus neighborhood
    // was dropped, so they judge in-batch greedy only); exact base
    // copies prove the exact stage end-to-end. The oracle replays all
    // four legs brute-force with the cap modeled (near leg sees BASE
    // docs only).
    "q84_skew_lifecycle_compacted" -> ((s, dir) => {
      val (corpus, batch1, batch2) = skewLifecycleParts(s, dir)
      val work = "graft_q84_work_" + corpusStamp(dir)
      val compacted = work + "_c"
      val workRoot = new java.io.File(sys.props("java.io.tmpdir"), work)
      if (!DedupOps.corpusDedupIndexExists(s, work)) {
        cleanStaleIndexDirs("graft_q84_work_" +
          Integer.toHexString(dir.hashCode) + "_", work)
        if (new java.io.File(workRoot, "manifest.json").exists())
          DedupOps.attachCorpusDedupIndex(s, work, workRoot.getPath)
        else DedupOps.writeCorpusDedupIndex(
          DedupOps.buildCorpusDedupIndex(corpus, "text", "doc_id",
            n = 3, numHashes = 64, bands = 32, maxBucket = skewCap),
          work, buckets = 16, path = Some(workRoot.getPath))
      }
      // accept batch1 into the corpus: tag-keyed, so a committed epoch
      // (earlier rep / earlier JVM over the same persisted index) is a
      // no-op and the judged state stays deterministic across runs
      DedupOps.appendToCorpusDedupIndex(batch1, "text", "doc_id", work,
        epochTag = Some("q84-batch1"))
      // compact with re-cap into a fresh prefix (copy-on-write swap
      // target); the appended hot-family buckets MUST show up dropped
      val report = DedupOps.compactCorpusDedupIndex(s, work, compacted,
        buckets = 16, path = Some(new java.io.File(
          sys.props("java.io.tmpdir"), compacted).getPath))
      require(report.count() > 0,
        "q84 lifecycle: compaction dropped no buckets — the appended hot " +
          "family should have grown past the cap")
      DedupOps.incrementalDedupPrepared(batch2,
          DedupOps.readCorpusDedupIndex(s, compacted), "text", "doc_id",
          n = 3, numHashes = 64, bands = 32, threshold = 0.5,
          maxBucket = skewCap)
        .orderBy("new_id")
    }),

    // Streaming-state oracle: the ACTUAL index-updating intake sink
    // (StreamOps.nearDupIntakeSinkWithIndexUpdate) driven through three
    // real micro-batch triggers of one unrestarted query — batch 2
    // carries near-dups of batch-1-ACCEPTED docs (the cross-trigger
    // case the per-trigger index append exists for) and batch 3 exact
    // copies of batch-2-accepted docs. Rows 1-3 are the kept docs read
    // back from the sink's partitioned parquet; src=4 rows re-judge
    // every streamed doc against the FINAL index (all copies must judge
    // dup — proving the three appends landed). The oracle replays the
    // sequential judgment (corpus, then corpus ∪ kept₁, then
    // corpus ∪ kept₁ ∪ kept₂, then the probe against everything)
    // brute-force in SQL.
    "q104_stream_intake_multi_trigger" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val docs = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") % 7 =!= 3)
      val b1 = docs.filter(col("doc_id") % 21 === 3)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .unionByName(corpus.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
      val b2 = docs.filter(col("doc_id") % 21 === 10)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 21 === 3 && col("doc_id") % 2 === 1)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            concat(col("text"), lit(" zz")).as("text")))
      val b3 = docs.filter(col("doc_id") % 21 === 17)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 21 === 10)
          .select((col("doc_id") + 4000000L).as("doc_id"), col("text")))
      val work = "graft_q104_idx_" + Integer.toHexString(dir.hashCode)
      Seq("_fingerprints", "_shingles", "_bands")
        .foreach(sfx => s.sql(s"DROP TABLE IF EXISTS $work$sfx"))
      def fresh(name: String): java.io.File = {
        val f = new java.io.File(sys.props("java.io.tmpdir"),
          s"${name}_${Integer.toHexString(dir.hashCode)}")
        org.apache.commons.io.FileUtils.deleteQuietly(f); f
      }
      val idxRoot = fresh("graft_q104_idx")
      val target = fresh("graft_q104_sink").getPath
      val ckpt = fresh("graft_q104_ckpt").getPath
      DedupOps.writeCorpusDedupIndex(
        DedupOps.buildCorpusDedupIndex(corpus, "text", "doc_id",
          n = 3, numHashes = 64, bands = 32, maxBucket = DedupOps.NoBucketCap),
        work, buckets = 8, path = Some(idxRoot.getPath))
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val q = graft.streaming.StreamOps.nearDupIntakeSinkWithIndexUpdate(
          input.toDF().toDF("doc_id", "text"), work, "text", "doc_id", target,
          n = 3, numHashes = 64, bands = 32, threshold = 0.5,
          maxBucket = DedupOps.NoBucketCap)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("0 seconds"))
        .option("checkpointLocation", ckpt)
        .start()
      def feed(df: DataFrame): Unit = {
        input.addData(df.select(col("doc_id"), col("text"))
          .as[(Long, String)].collect().toSeq: _*)
        q.processAllAvailable()
      }
      try { feed(b1); feed(b2); feed(b3) } finally q.stop()
      // src from the id band, not the batch tag (tags carry the run's
      // random streaming query id): +2e6 → b1, +3e6 → b2, +4e6 → b3,
      // +1e6 by %21 residue; probes sit at +10e6 over their batch id
      def srcOf(c: org.apache.spark.sql.Column) =
        when(c >= 10000000L, lit(4L))
          .when(c >= 4000000L, lit(3L)).when(c >= 3000000L, lit(2L))
          .when(c >= 2000000L, lit(1L))
          .otherwise(floor(((c % 1000000L) % 21L + 4L) / 7L).cast("long"))
      val sink = s.read.parquet(target)
        .select(srcOf(col("doc_id")).as("src"),
          col("doc_id").cast("long").as("doc_id"), lit("kept").as("status"))
      val probe = b1.unionByName(b2).unionByName(b3)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      val probed = DedupOps.incrementalDedupPrepared(probe,
          DedupOps.readCorpusDedupIndex(s, work), "text", "doc_id",
          n = 3, numHashes = 64, bands = 32, threshold = 0.5,
          maxBucket = DedupOps.NoBucketCap)
        .select(lit(4L).as("src"), col("new_id").as("doc_id"), col("status"))
      sink.unionByName(probed).orderBy("src", "doc_id")
    }),

    // Streaming SemDeDup intake against the PERSISTED trained-cell
    // layout (round-16 verdict item 2): the corpus trains+labels once
    // into a served SemanticIndex version; the q139 batch then arrives
    // as TWO micro-batches — the perturbed near-dups (+1e5) first, the
    // exact clones (+2e5) second — with a foldIngestAndSwap BETWEEN
    // them, so the second batch judges through the swapped version and
    // against the first batch's KEPT rows (sequential intake semantics:
    // unlike q139's one-shot judge, a b2 vector can only dup against
    // corpus + kept-b1 + lower-id b2-mates — the oracle replays exactly
    // that). Exactly-once across the swap rides the carried ledger.
    "q146_semantic_dedup_stream_intake" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val (corpus, batch) = semBatchParts(s, dir)
      val b1 = batch.filter(col("vid") < 200000L)  // perturbed near-dups
      val b2 = batch.filter(col("vid") >= 200000L) // exact clones
      def fresh(name: String): java.io.File = {
        val f = new java.io.File(sys.props("java.io.tmpdir"),
          s"${name}_${Integer.toHexString(dir.hashCode)}")
        org.apache.commons.io.FileUtils.deleteQuietly(f); f
      }
      val root = fresh("graft_q146_semidx").getPath
      val target = fresh("graft_q146_sink").getPath
      val ckpt = fresh("graft_q146_ckpt").getPath
      graft.operators.SemanticIndex.buildAndServe(corpus, "vid", "vd",
        k = 8, maxIter = 2, root)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Double])]
      val q = graft.streaming.StreamOps.semanticIntakeSink(
          input.toDF().toDF("vid", "vd"), "vid", "vd", root, target, t2 = 0.81)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("0 seconds"))
        .option("checkpointLocation", ckpt)
        .start()
      def feed(df: DataFrame): Unit = {
        input.addData(df.select(col("vid"), col("vd"))
          .as[(Long, Seq[Double])].collect().toSeq: _*)
        q.processAllAvailable()
      }
      try {
        feed(b1)
        // mid-stream maintenance: consolidate kept-b1 segments into the
        // next version and swap — b2 must judge identically through it
        graft.operators.SemanticIndex.foldIngestAndSwap(s, root)
        feed(b2)
      } finally q.stop()
      s.read.parquet(target)
        .select(col("vid").cast("long").as("vid"),
          col("cell").cast("long").as("cell"),
          col("dup_of").cast("long").as("dup_of"), col("kept"))
        .orderBy("vid")
    }),
  )

  /** Persisted-index dir stamp: the sf dir's identity PLUS the source
    * table's (name, size, mtime) fingerprint, so a regenerated testdata
    * set orphans the previous rounds' index instead of silently joining
    * a stale corpus (the driver rewrote every parquet in round 7 — an
    * index keyed on the path alone would have gone quietly wrong).
    * Descends into directories: a Spark-written parquet DIRECTORY would
    * otherwise stamp only directory metadata and could miss a
    * regeneration that rewrote the part files in place.
    */
  private def corpusStamp(dir: String): String =
    Integer.toHexString(dir.hashCode) + "_" + graft.io.Fingerprint.ofTree(
      s"${dir.stripSuffix("/")}/documents.parquet")

  /** Drop persisted index dirs whose data stamp no longer matches —
    * regenerated testdata would otherwise accumulate one orphaned
    * bucketed index per generation under java.io.tmpdir.
    */
  private def cleanStaleIndexDirs(family: String, keep: String): Unit = {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    Option(tmp.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith(family) && f.getName != keep)
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
  }

  /** Build-once cache of the q110 persisted ANN index for this sf dir
    * (data-stamped like [[corpusStamp]], but keyed on the embeddings
    * table). Shared by every query that serves through the stored index
    * (q110, q113) — the build cost is paid once per corpus generation.
    */
  /** Build-once cache of the PRUNED versioned vector index (the q129
    * lifecycle end state) for the q135 serve-only headliner. A corrupt
    * cached pointer is a cache miss, not an error (the Retrieval
    * cachedIndexPresent convention).
    */
  private def ensurePrunedVectorIndex(s: SparkSession, dir: String,
                                      emb: DataFrame): String = {
    val stamp = Integer.toHexString(dir.hashCode) + "_" +
      graft.io.Fingerprint.ofTree(s"${dir.stripSuffix("/")}/embeddings.parquet")
    val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_q135_vindexp_" + stamp)
    val cached =
      try VectorIndex.currentVersion(root.getPath).isDefined
      catch { case _: IllegalStateException =>
        graft.io.IndexMeta.deleteTree(root.getPath); false }
    if (!cached) {
      cleanStaleIndexDirs("graft_q135_vindexp_" +
        Integer.toHexString(dir.hashCode) + "_", "graft_q135_vindexp_" + stamp)
      val cutoff = emb.agg(max(col("vec_id").cast("long"))).head().getLong(0) / 2
      val (m1, c1) = VectorIndex.build(emb.filter(col("vec_id") <= cutoff),
        "vec_id", "embedding", "label", dim = 64, m = 4, k = 16)
      VectorIndex.writeVersion(m1, c1, root.getPath, 1)
      VectorIndex.swapPointer(root.getPath, 1)
      val batch = emb.filter(col("vec_id") > cutoff)
        .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      require(VectorIndex.appendBatch(batch, "vec_id", "embedding", m1,
        VectorIndex.versionDir(root.getPath, 1), batchId = 0L),
        "q135 cache build: the append batch must apply")
      VectorIndex.foldIngestAndSwap(s, root.getPath, dim = 64, m = 4, k = 16)
      VectorIndex.pruneVersions(root.getPath)
    }
    root.getPath
  }

  private def ensureQ110Index(s: SparkSession, dir: String,
                              emb: DataFrame): String = {
    val stamp = Integer.toHexString(dir.hashCode) + "_" +
      graft.io.Fingerprint.ofTree(s"${dir.stripSuffix("/")}/embeddings.parquet")
    val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_q110_vindex_" + stamp)
    if (!VectorIndex.exists(root.getPath)) {
      cleanStaleIndexDirs("graft_q110_vindex_" +
        Integer.toHexString(dir.hashCode) + "_", "graft_q110_vindex_" + stamp)
      val (model, codes) = VectorIndex.build(emb, "vec_id", "embedding", "label",
        dim = 64, m = 4, k = 16)
      VectorIndex.write(model, codes, root.getPath)
    }
    root.getPath
  }

  /** Bucket cap for the planted-skew fixture: far below the family's
    * per-band bucket width (~0.9 × 4 × corpus size) and far above any
    * genuine bucket in the base corpus.
    */
  private[graft] val skewCap = 500

  /** One 21-word near-identical family member per k: 20 shared words + a
    * unique trailing token vk. 3-gram shingles: 18 shared + 1 unique →
    * pairwise Jaccard 18/20 = 0.9. Keep in byte-sync with the SQL
    * oracles, which rebuild the family with this exact literal.
    */
  private val skewTemplate = "breaking news update follow this link for the " +
    "full exclusive story today with more details inside our live coverage page v"

  /** Base documents ∪ the templated hot family (4× the base count, ids
    * under +1e6). The family count derives from the base table so the
    * fixture scales with SF; the count() is a parquet-metadata job.
    */
  private def skewedDocs(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val famN = base.count() * 4
    val fam = s.range(famN).select((col("id") + 1000000L).as("doc_id"),
      concat(lit(skewTemplate), col("id")).as("text"))
    base.unionByName(fam)
  }

  /** q83 parts: (skewed corpus, ingest batch). Batch legs: exact copies
    * of every 50th base doc (+2e6), ` zz<id>`-perturbed copies of every
    * 40th-remainder-7 base doc (+4e6; 2 new shingles → Jaccard ≥ 0.83
    * vs source for any doc of ≥ 4 words), and 20 fresh family members
    * (+3e6, suffix ids beyond the corpus family's).
    */
  private def skewIngestParts(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val famN = base.count() * 4
    val fam = s.range(famN).select((col("id") + 1000000L).as("doc_id"),
      concat(lit(skewTemplate), col("id")).as("text"))
    val exactLeg = base.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    val nearLeg = base.filter(col("doc_id") % 40 === 7)
      .select((col("doc_id") + 4000000L).as("doc_id"),
        concat(col("text"), lit(" zz"), col("doc_id")).as("text"))
    val probes = s.range(20).select((col("id") + 3000000L).as("doc_id"),
      concat(lit(skewTemplate), col("id") + famN).as("text"))
    (base.unionByName(fam),
      exactLeg.unionByName(nearLeg).unionByName(probes))
  }

  /** q84 parts: (skewed corpus, accepted batch1, re-ingest batch2).
    * batch1 = 800 fresh family members (suffix ids famN..famN+799): wide
    * enough that their common band buckets (~0.9 × 800 ≈ 718 members)
    * exceed `skewCap` both in-batch at judgment time and in the index
    * after the append — the compaction re-cap target. batch2 legs:
    * exact copies of every 40th batch1 doc (+5e6), ` zz`-perturbed base
    * docs (+4e6, q83's near leg), 20 fresh family members past batch1's
    * suffixes (+6e6), exact base copies (+2e6, q83's exact leg).
    */
  private[graft] def skewLifecycleParts(s: SparkSession, dir: String)
  : (DataFrame, DataFrame, DataFrame) = {
    val base = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val famN = base.count() * 4
    val fam = s.range(famN).select((col("id") + 1000000L).as("doc_id"),
      concat(lit(skewTemplate), col("id")).as("text"))
    val batch1 = s.range(800).select((col("id") + 3000000L).as("doc_id"),
      concat(lit(skewTemplate), col("id") + famN).as("text"))
    val aLeg = s.range(20).select((col("id") * 40 + 5000000L).as("doc_id"),
      concat(lit(skewTemplate), col("id") * 40 + famN).as("text"))
    val bLeg = base.filter(col("doc_id") % 40 === 7)
      .select((col("doc_id") + 4000000L).as("doc_id"),
        concat(col("text"), lit(" zz"), col("doc_id")).as("text"))
    val cLeg = s.range(20).select((col("id") + 6000000L).as("doc_id"),
      concat(lit(skewTemplate), col("id") + famN + 800L).as("text"))
    val dLeg = base.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    (base.unionByName(fam), batch1,
      aLeg.unionByName(bLeg).unionByName(cLeg).unionByName(dLeg))
  }

  /** q73/q78 shared batch construction: corpus = doc_id % 7 != 3; the new
    * batch re-ids %7==3 docs under +1e6, plants corpus exact-dups (%50==0
    * under +2e6) and in-batch dups (%7==3 ∧ %100==1 under +3e6).
    */
  private def incrementalBatchParts(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 7 =!= 3)
    val newBatch = docs.filter(col("doc_id") % 7 === 3)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .unionByName(corpus.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") % 7 === 3 && col("doc_id") % 100 === 1)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
    (corpus, newBatch)
  }

  /** Embeddings ∪ near-dup copies: every 5th vector re-appended under
    * vid+100000 with its first component scaled by 1.25 (exact in binary
    * floating point, so both engines synthesize identical vectors).
    */
  /** q139 corpus/batch split: corpus = the embeddings table; batch =
    * every 5th vector perturbed (first component ×1.25 under +1e5 —
    * a planted near-dup of its corpus source) plus every 7th-mod-3
    * vector re-idd verbatim under +2e5 (an exact-direction corpus dup;
    * ids where both legs fire also plant an in-batch pair).
    */
  private def semBatchParts(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = t(s, dir, "embeddings").select(col("vec_id").cast("long").as("vid"),
      transform(col("embedding"), x => x.cast("double")).as("vd"))
    val pert = base.filter(col("vid") % 5 === 0)
      .select((col("vid") + 100000L).as("vid"),
        concat(array(element_at(col("vd"), 1) * lit(1.25)),
          slice(col("vd"), lit(2), size(col("vd")) - 1)).as("vd"))
    val exact = base.filter(col("vid") % 7 === 3)
      .select((col("vid") + 200000L).as("vid"), col("vd"))
    (base, pert.unionByName(exact))
  }

  /** q144 fixture: [[semBatchParts]] with a planted hot cell on EACH
    * side — verbatim clones of vector 1 under +3e5 (every even base
    * vid → the corpus side) and +4e5 (every third base vid → the batch
    * side). Clones copy an existing row's components (no arithmetic),
    * so both engines synthesize bit-identical vectors; both hot masses
    * collapse onto vector 1's trained cell.
    */
  private def semBatchPartsHot(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val (corpus, batch) = semBatchParts(s, dir)
    val base = t(s, dir, "embeddings").select(col("vec_id").cast("long").as("vid"),
      transform(col("embedding"), x => x.cast("double")).as("vd"))
    val hotRef = base.filter(col("vid") === 1).select(col("vd").as("hot_vd"))
    def clones(pred: org.apache.spark.sql.Column, offset: Long): DataFrame =
      base.filter(pred).crossJoin(broadcast(hotRef))
        .select((col("vid") + offset).as("vid"), col("hot_vd").as("vd"))
    (corpus.unionByName(clones(col("vid") % 2 === 0, 300000L)),
      batch.unionByName(clones(col("vid") % 3 === 0, 400000L)))
  }

  private def nearDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "embeddings").select(col("vec_id").cast("long").as("vid"),
      transform(col("embedding"), x => x.cast("double")).as("vd"))
    val pert = base.filter(col("vid") % 5 === 0)
      .select((col("vid") + 100000L).as("vid"),
        concat(array(element_at(col("vd"), 1) * lit(1.25)),
          slice(col("vd"), lit(2), size(col("vd")) - 1)).as("vd"))
    base.unionByName(pert)
  }

  /** q143 fixture: [[nearDupCorpus]] plus a planted HOT CELL — every
    * even base vid contributes a verbatim clone of vector 1 under
    * +3e5, so half the corpus collapses onto one trained centroid (the
    * q82 skew-fixture pattern for the cell-cap path). Clones copy an
    * EXISTING row's components (no arithmetic), so both engines
    * synthesize bit-identical vectors.
    */
  private def hotCellCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "embeddings").select(col("vec_id").cast("long").as("vid"),
      transform(col("embedding"), x => x.cast("double")).as("vd"))
    val hotRef = base.filter(col("vid") === 1).select(col("vd").as("hot_vd"))
    val hot = base.filter(col("vid") % 2 === 0)
      .crossJoin(broadcast(hotRef))
      .select((col("vid") + 300000L).as("vid"), col("hot_vd").as("vd"))
    nearDupCorpus(s, dir).unionByName(hot)
  }

  /** Shared brute-force SQL for q54/q55 — the LSH path must reproduce the
    * brute output exactly (banding recall is effectively 1 at the verify
    * threshold).
    */
  private val embeddingNearDupCte =
    """WITH base AS (SELECT CAST(vec_id AS BIGINT) AS vid, CAST(embedding AS DOUBLE[]) AS vd FROM embeddings),
      |pert AS (SELECT vid + 100000 AS vid, list_concat([vd[1] * 1.25], vd[2:]) AS vd
      |         FROM base WHERE vid % 5 = 0),
      |v AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
      |q AS (SELECT vid, list_transform(vd, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv FROM v),
      |n AS (SELECT vid, qv, list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS n2 FROM q),
      |p AS (SELECT a.vid AS va, b.vid AS vb,
      |        list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) AS d,
      |        a.n2 AS na2, b.n2 AS nb2
      |      FROM n a JOIN n b ON a.vid < b.vid)
      |SELECT va AS vec_a, vb AS vec_b, CAST(d AS BIGINT) AS dot_q
      |FROM p WHERE d > 0 AND d * d >= 0.81 * na2 * nb2
      |ORDER BY vec_a, vec_b""".stripMargin

  private val shingleCte =
    """WITH w AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws FROM documents),
      |sh AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |  list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sg
      |  FROM w WHERE len(ws) >= 3),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    len(list_intersect(a.sg, b.sg)) * 1.0 / len(list_distinct(list_concat(a.sg, b.sg))) AS jaccard
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin

  val oracles: Map[String, String] = oraclesMain +
    // the salted-join routing is arithmetic-identical to the plain
    // shape (TextStatsSpec pins equality under planted Zipf) — q131's
    // oracle verbatim, now enforced by hash instead of spec alone
    ("q145_bigram_surprisal_salted" -> oraclesMain("q131_bigram_surprisal")) +
    // the persisted-index query (q110) is exactly q109's math answered
    // through the stored files — one oracle, two engines-side paths
    ("q110_ann_topk_indexed" -> oraclesMain("q109_ann_topk_ivfpq_refined")) +
    // streaming ingest commits the SAME per-row encodes as q111's bulk
    // append (any batch split of a per-row encode is identity-preserving),
    // so the multi-trigger end state answers q111's oracle verbatim
    ("q115_ann_stream_ingest" -> oraclesMain("q111_ann_topk_index_appended")) +
    // segment-fold compaction consolidates files without re-encoding a
    // single row, so the post-fold answer is still q111's oracle
    ("q116_ann_stream_ingest_folded" -> oraclesMain("q111_ann_topk_index_appended")) +
    // retention GC moves no answer: the fold re-encoded nothing and the
    // prune deleted only the unreachable predecessor — q111's oracle
    ("q129_ann_index_pruned" -> oraclesMain("q111_ann_topk_index_appended")) +
    // the cached pruned lifecycle serves the q129 end state, which is
    // q111's index exactly (fold re-encodes nothing)
    ("q135_ann_pruned_serve" -> oraclesMain("q111_ann_topk_index_appended")) +
    // the versioned lifecycle closes on a FULL-corpus retrain, which is
    // definitionally the derive-in-query model — q109's oracle verbatim
    ("q117_ann_stream_ingest_versioned" -> oraclesMain("q109_ann_topk_ivfpq_refined")) +
    // the retrain lifecycle's two phases ARE the two existing oracles:
    // stale = q111 (appends through the base-half model), retrained =
    // q109 (full-corpus model) — composed verbatim, no third derivation
    ("q112_ann_index_retrain_swap" ->
      s"""SELECT 'stale' AS phase, * FROM (
         |${oraclesMain("q111_ann_topk_index_appended")})
         |UNION ALL
         |SELECT 'retrained' AS phase, * FROM (
         |${oraclesMain("q109_ann_topk_ivfpq_refined")})
         |ORDER BY phase, query_id, rank""".stripMargin) +
    // pre-filter / tombstone serving paths: q109's oracle with the
    // candidate set narrowed at the pair join — the single point where
    // a neighbor enters the ADC ranking, so patching there is exactly
    // the engine's filter-before-shortlist semantics
    ("q113_ann_topk_filtered" -> patchedOracle(
      oraclesMain("q109_ann_topk_ivfpq_refined"),
      "AND l.vid <> c.vid", "AND l.vid <> c.vid AND c.vid % 2 = 0")) +
    ("q114_ann_topk_deleted" -> patchedOracle(
      oraclesMain("q109_ann_topk_ivfpq_refined"),
      "AND l.vid <> c.vid", "AND l.vid <> c.vid AND c.vid % 7 <> 0"))

  /** Splice a predicate into a base oracle at a unique anchor; refuses
    * a missing or ambiguous anchor so a reworded base oracle can never
    * silently produce an unpatched derived one.
    */
  private def patchedOracle(base: String, anchor: String, repl: String): String = {
    val hits = base.sliding(anchor.length).count(_ == anchor)
    require(hits == 1, s"oracle patch anchor must occur exactly once, found $hits: $anchor")
    base.replace(anchor, repl)
  }

  private def oraclesMain: Map[String, String] = Map(
    // Recomputes the whole simhash pipeline independently: sha256-prefix
    // 60-bit token hashes, per-bit weighted sums, signature assembly, and
    // an O(n²) pair scan (fine at oracle scale; the Spark side stays
    // banded). Any signature-bit divergence fails the hash compare.
    "q29_neardup_simhash" ->
      """WITH tok AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    list_reduce([CAST(strpos('0123456789abcdef', x) - 1 AS BIGINT)
        |                 FOR x IN string_split(substring(sha256(token), 1, 15), '')],
        |                (a, b) -> a * 16 + b) AS th
        |  FROM tok),
        |bits AS (
        |  SELECT doc_id, r.range AS b,
        |    SUM(CASE WHEN (th >> CAST(r.range AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM h CROSS JOIN range(60) r
        |  GROUP BY doc_id, r.range),
        |sig AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS simhash
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q26_dedup_exact" ->
      """WITH base AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
        |  UNION ALL
        |  SELECT CAST(doc_id AS BIGINT) + 1000000, text FROM documents WHERE doc_id % 50 = 0),
        |h AS (SELECT doc_id, sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS th FROM base)
        |SELECT CAST(MIN(doc_id) AS BIGINT) AS keeper_id, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM h GROUP BY th HAVING COUNT(*) > 1 ORDER BY keeper_id""".stripMargin,

    "q27_neardup_brute" -> shingleCte,
    "q28_neardup_minhash" -> shingleCte,

    "q54_neardup_embedding" -> embeddingNearDupCte,
    "q55_neardup_embedding_lsh" -> embeddingNearDupCte,

    "q30_ann_topk_brute" ->
      """WITH v AS (SELECT CAST(vec_id AS BIGINT) AS vid, CAST(embedding AS DOUBLE[]) AS vd FROM embeddings),
        |s AS (SELECT q.vid AS query_id, c.vid AS neighbor_id,
        |    list_cosine_similarity(q.vd, c.vd) AS score
        |  FROM v q JOIN v c ON q.vid <> c.vid),
        |r AS (SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rnk FROM s)
        |SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank FROM r WHERE rnk <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q31_ann_topk_cell" ->
      """WITH v AS (SELECT CAST(label AS BIGINT) AS cell, CAST(vec_id AS BIGINT) AS vid,
        |    CAST(embedding AS DOUBLE[]) AS vd FROM embeddings),
        |s AS (SELECT q.cell, q.vid AS query_id, c.vid AS neighbor_id,
        |    list_cosine_similarity(q.vd, c.vd) AS score
        |  FROM v q JOIN v c ON q.cell = c.cell AND q.vid <> c.vid),
        |r AS (SELECT cell, query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rnk FROM s)
        |SELECT cell, query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank FROM r WHERE rnk <= 3
        |ORDER BY query_id, rank""".stripMargin,

    "q102_ann_topk_pq" ->
      """WITH v AS (SELECT CAST(vec_id AS BIGINT) AS vid, CAST(label AS BIGINT) AS cell,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(FLOOR(x * 1000000) AS BIGINT)) AS q
        |  FROM embeddings),
        |seeds AS (SELECT q, ROW_NUMBER() OVER (ORDER BY vid) - 1 AS ci
        |  FROM (SELECT vid, q FROM v ORDER BY vid LIMIT 16)),
        |cb AS (SELECT s.ci, m.range AS mi, d.range AS d,
        |    s.q[CAST(m.range * 16 + d.range AS INT) + 1] AS c
        |  FROM seeds s CROSS JOIN range(4) m CROSS JOIN range(16) d),
        |ve AS (SELECT v.vid, v.cell, m.range AS mi, d.range AS d,
        |    v.q[CAST(m.range * 16 + d.range AS INT) + 1] AS x
        |  FROM v CROSS JOIN range(4) m CROSS JOIN range(16) d),
        |dists AS (SELECT ve.vid, ve.cell, ve.mi, cb.ci,
        |    SUM((ve.x - cb.c) * (ve.x - cb.c)) AS dist
        |  FROM ve JOIN cb ON ve.mi = cb.mi AND ve.d = cb.d
        |  GROUP BY 1, 2, 3, 4),
        |codes AS (SELECT vid, cell, mi, ci AS code FROM (
        |    SELECT vid, cell, mi, ci,
        |      ROW_NUMBER() OVER (PARTITION BY vid, mi ORDER BY dist ASC, ci ASC) AS rn
        |    FROM dists) WHERE rn = 1),
        |pair AS (SELECT dq.vid AS query_id, c.vid AS neighbor_id, dq.cell,
        |    SUM(dq.dist) AS adc_dist
        |  FROM codes c JOIN dists dq ON dq.mi = c.mi AND dq.ci = c.code
        |    AND dq.cell = c.cell AND dq.vid <> c.vid
        |  GROUP BY 1, 2, 3),
        |r AS (SELECT query_id, neighbor_id, cell, adc_dist,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY adc_dist ASC, neighbor_id ASC) AS rnk FROM pair)
        |SELECT query_id, neighbor_id, CAST(adc_dist AS BIGINT) AS adc_dist,
        |  CAST(rnk AS BIGINT) AS rank, cell
        |FROM r WHERE rnk <= 3
        |ORDER BY query_id, rank""".stripMargin,

    // Trained-PQ: per-subspace Lloyd unrolled exactly — cb0 seeds, two
    // (assign → truncating-integer-mean update) rounds per subspace,
    // encode on the trained books, then the same cell-restricted ADC
    // ranking as q102. d is the WITHIN-subspace index (0..15) so each
    // (mi, d) pair addresses one codebook component.
    "q103_ann_topk_pq_trained" ->
      """WITH v AS (SELECT CAST(vec_id AS BIGINT) AS vid, CAST(label AS BIGINT) AS cell,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(FLOOR(x * 1000000) AS BIGINT)) AS q
        |  FROM embeddings),
        |ve AS (SELECT v.vid, v.cell, m.range AS mi, d.range AS d,
        |    v.q[CAST(m.range * 16 + d.range AS INT) + 1] AS x
        |  FROM v CROSS JOIN range(4) m CROSS JOIN range(16) d),
        |seeds AS (SELECT q, ROW_NUMBER() OVER (ORDER BY vid) - 1 AS ci
        |  FROM (SELECT vid, q FROM v ORDER BY vid LIMIT 16)),
        |cb0 AS (SELECT s.ci, m.range AS mi, d.range AS d,
        |    s.q[CAST(m.range * 16 + d.range AS INT) + 1] AS c
        |  FROM seeds s CROSS JOIN range(4) m CROSS JOIN range(16) d),
        |d1 AS (SELECT ve.vid, ve.mi, cb.ci, SUM((ve.x - cb.c) * (ve.x - cb.c)) AS dist
        |  FROM ve JOIN cb0 cb ON ve.mi = cb.mi AND ve.d = cb.d GROUP BY 1, 2, 3),
        |a1 AS (SELECT vid, mi, ci FROM (SELECT vid, mi, ci,
        |    ROW_NUMBER() OVER (PARTITION BY vid, mi ORDER BY dist ASC, ci ASC) AS rn
        |  FROM d1) WHERE rn = 1),
        |s1 AS (SELECT a.mi, a.ci, e.d, CAST(SUM(e.x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM a1 a JOIN ve e ON a.vid = e.vid AND a.mi = e.mi GROUP BY 1, 2, 3),
        |cb1 AS (SELECT c.ci, c.mi, c.d,
        |    COALESCE(CASE WHEN s1.s >= 0 THEN s1.s // s1.n ELSE -((-s1.s) // s1.n) END, c.c) AS c
        |  FROM cb0 c LEFT JOIN s1 ON c.mi = s1.mi AND c.ci = s1.ci AND c.d = s1.d),
        |d2 AS (SELECT ve.vid, ve.mi, cb.ci, SUM((ve.x - cb.c) * (ve.x - cb.c)) AS dist
        |  FROM ve JOIN cb1 cb ON ve.mi = cb.mi AND ve.d = cb.d GROUP BY 1, 2, 3),
        |a2 AS (SELECT vid, mi, ci FROM (SELECT vid, mi, ci,
        |    ROW_NUMBER() OVER (PARTITION BY vid, mi ORDER BY dist ASC, ci ASC) AS rn
        |  FROM d2) WHERE rn = 1),
        |s2 AS (SELECT a.mi, a.ci, e.d, CAST(SUM(e.x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM a2 a JOIN ve e ON a.vid = e.vid AND a.mi = e.mi GROUP BY 1, 2, 3),
        |cb2 AS (SELECT c.ci, c.mi, c.d,
        |    COALESCE(CASE WHEN s2.s >= 0 THEN s2.s // s2.n ELSE -((-s2.s) // s2.n) END, c.c) AS c
        |  FROM cb1 c LEFT JOIN s2 ON c.mi = s2.mi AND c.ci = s2.ci AND c.d = s2.d),
        |d3 AS (SELECT ve.vid, ve.cell, ve.mi, cb.ci, SUM((ve.x - cb.c) * (ve.x - cb.c)) AS dist
        |  FROM ve JOIN cb2 cb ON ve.mi = cb.mi AND ve.d = cb.d GROUP BY 1, 2, 3, 4),
        |codes AS (SELECT vid, cell, mi, ci AS code FROM (
        |    SELECT vid, cell, mi, ci,
        |      ROW_NUMBER() OVER (PARTITION BY vid, mi ORDER BY dist ASC, ci ASC) AS rn
        |    FROM d3) WHERE rn = 1),
        |pair AS (SELECT dq.vid AS query_id, c.vid AS neighbor_id, dq.cell,
        |    SUM(dq.dist) AS adc_dist
        |  FROM codes c JOIN d3 dq ON dq.mi = c.mi AND dq.ci = c.code
        |    AND dq.cell = c.cell AND dq.vid <> c.vid
        |  GROUP BY 1, 2, 3),
        |r AS (SELECT query_id, neighbor_id, cell, adc_dist,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY adc_dist ASC, neighbor_id ASC) AS rnk FROM pair)
        |SELECT query_id, neighbor_id, CAST(adc_dist AS BIGINT) AS adc_dist,
        |  CAST(rnk AS BIGINT) AS rank, cell
        |FROM r WHERE rnk <= 3
        |ORDER BY query_id, rank""".stripMargin,

    // Residual IVF-PQ: cent = truncating-integer-mean centroid per
    // (cell, subspace, within-subspace dim); vr = residuals; codebooks
    // seed from the 16 smallest-id vectors' RESIDUALS; then the same
    // encode + cell-restricted ADC ranking as q102 runs in residual
    // space. The CASE-guarded // emulates Long division's truncation
    // toward zero (DuckDB // floors).
    "q107_ann_topk_ivfpq_residual" ->
      """WITH v AS (SELECT CAST(vec_id AS BIGINT) AS vid, CAST(label AS BIGINT) AS cell,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(FLOOR(x * 1000000) AS BIGINT)) AS q
        |  FROM embeddings),
        |ve AS (SELECT v.vid, v.cell, m.range AS mi, d.range AS d,
        |    v.q[CAST(m.range * 16 + d.range AS INT) + 1] AS x
        |  FROM v CROSS JOIN range(4) m CROSS JOIN range(16) d),
        |cent AS (SELECT cell, mi, d,
        |    CASE WHEN SUM(x) >= 0 THEN SUM(x) // COUNT(*)
        |         ELSE -((-SUM(x)) // COUNT(*)) END AS c
        |  FROM ve GROUP BY 1, 2, 3),
        |vr AS (SELECT ve.vid, ve.cell, ve.mi, ve.d, ve.x - cent.c AS x
        |  FROM ve JOIN cent ON ve.cell = cent.cell AND ve.mi = cent.mi AND ve.d = cent.d),
        |sv AS (SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) - 1 AS ci
        |  FROM (SELECT vid FROM v ORDER BY vid LIMIT 16)),
        |cb AS (SELECT sv.ci, vr.mi, vr.d, vr.x AS c
        |  FROM vr JOIN sv ON vr.vid = sv.vid),
        |dists AS (SELECT vr.vid, vr.cell, vr.mi, cb.ci,
        |    SUM((vr.x - cb.c) * (vr.x - cb.c)) AS dist
        |  FROM vr JOIN cb ON vr.mi = cb.mi AND vr.d = cb.d
        |  GROUP BY 1, 2, 3, 4),
        |codes AS (SELECT vid, cell, mi, ci AS code FROM (
        |    SELECT vid, cell, mi, ci,
        |      ROW_NUMBER() OVER (PARTITION BY vid, mi ORDER BY dist ASC, ci ASC) AS rn
        |    FROM dists) WHERE rn = 1),
        |pair AS (SELECT dq.vid AS query_id, c.vid AS neighbor_id, dq.cell,
        |    SUM(dq.dist) AS adc_dist
        |  FROM codes c JOIN dists dq ON dq.mi = c.mi AND dq.ci = c.code
        |    AND dq.cell = c.cell AND dq.vid <> c.vid
        |  GROUP BY 1, 2, 3),
        |r AS (SELECT query_id, neighbor_id, cell, adc_dist,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY adc_dist ASC, neighbor_id ASC) AS rnk FROM pair)
        |SELECT query_id, neighbor_id, CAST(adc_dist AS BIGINT) AS adc_dist,
        |  CAST(rnk AS BIGINT) AS rank, cell
        |FROM r WHERE rnk <= 3
        |ORDER BY query_id, rank""".stripMargin,

    // Multi-probe residual IVF-PQ: q107's cent/vr/cb/codes, plus
    // qcd = per-(query, cell) centroid distances, probes = each query's
    // 2 nearest cells, qres/qlut = the query re-residualized against
    // each probed cell's centroid, then ADC pairs joined on the PROBED
    // cell and ranked globally per query.
    "q108_ann_topk_ivfpq_probed" ->
      """WITH v AS (SELECT CAST(vec_id AS BIGINT) AS vid, CAST(label AS BIGINT) AS cell,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(FLOOR(x * 1000000) AS BIGINT)) AS q
        |  FROM embeddings),
        |ve AS (SELECT v.vid, v.cell, m.range AS mi, d.range AS d,
        |    v.q[CAST(m.range * 16 + d.range AS INT) + 1] AS x
        |  FROM v CROSS JOIN range(4) m CROSS JOIN range(16) d),
        |cent AS (SELECT cell, mi, d,
        |    CASE WHEN SUM(x) >= 0 THEN SUM(x) // COUNT(*)
        |         ELSE -((-SUM(x)) // COUNT(*)) END AS c
        |  FROM ve GROUP BY 1, 2, 3),
        |vr AS (SELECT ve.vid, ve.cell, ve.mi, ve.d, ve.x - cent.c AS x
        |  FROM ve JOIN cent ON ve.cell = cent.cell AND ve.mi = cent.mi AND ve.d = cent.d),
        |sv AS (SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) - 1 AS ci
        |  FROM (SELECT vid FROM v ORDER BY vid LIMIT 16)),
        |cb AS (SELECT sv.ci, vr.mi, vr.d, vr.x AS c
        |  FROM vr JOIN sv ON vr.vid = sv.vid),
        |dists AS (SELECT vr.vid, vr.cell, vr.mi, cb.ci,
        |    SUM((vr.x - cb.c) * (vr.x - cb.c)) AS dist
        |  FROM vr JOIN cb ON vr.mi = cb.mi AND vr.d = cb.d
        |  GROUP BY 1, 2, 3, 4),
        |codes AS (SELECT vid, cell, mi, ci AS code FROM (
        |    SELECT vid, cell, mi, ci,
        |      ROW_NUMBER() OVER (PARTITION BY vid, mi ORDER BY dist ASC, ci ASC) AS rn
        |    FROM dists) WHERE rn = 1),
        |qcd AS (SELECT ve.vid, cent.cell, SUM((ve.x - cent.c) * (ve.x - cent.c)) AS cdist
        |  FROM ve JOIN cent ON ve.mi = cent.mi AND ve.d = cent.d
        |  GROUP BY 1, 2),
        |probes AS (SELECT vid, cell FROM (
        |    SELECT vid, cell,
        |      ROW_NUMBER() OVER (PARTITION BY vid ORDER BY cdist ASC, cell ASC) AS rn
        |    FROM qcd) WHERE rn <= 2),
        |qres AS (SELECT ve.vid, p.cell, ve.mi, ve.d, ve.x - cent.c AS x
        |  FROM ve JOIN probes p ON ve.vid = p.vid
        |  JOIN cent ON cent.cell = p.cell AND cent.mi = ve.mi AND cent.d = ve.d),
        |qlut AS (SELECT qr.vid, qr.cell, qr.mi, cb.ci,
        |    SUM((qr.x - cb.c) * (qr.x - cb.c)) AS dist
        |  FROM qres qr JOIN cb ON qr.mi = cb.mi AND qr.d = cb.d
        |  GROUP BY 1, 2, 3, 4),
        |pair AS (SELECT l.vid AS query_id, c.vid AS neighbor_id, c.cell,
        |    SUM(l.dist) AS adc_dist
        |  FROM codes c JOIN qlut l ON l.mi = c.mi AND l.ci = c.code
        |    AND l.cell = c.cell AND l.vid <> c.vid
        |  GROUP BY 1, 2, 3),
        |r AS (SELECT query_id, neighbor_id, cell, adc_dist,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY adc_dist ASC, neighbor_id ASC) AS rnk FROM pair)
        |SELECT query_id, neighbor_id, CAST(adc_dist AS BIGINT) AS adc_dist,
        |  CAST(rnk AS BIGINT) AS rank, cell
        |FROM r WHERE rnk <= 3
        |ORDER BY query_id, rank""".stripMargin,

    // Two-stage refine: q108's chain cut to a 10-candidate shortlist,
    // then exact squared L2 over the per-dim quantized components (ve
    // joined on both sides) and a fresh per-query re-rank.
    "q109_ann_topk_ivfpq_refined" ->
      """WITH v AS (SELECT CAST(vec_id AS BIGINT) AS vid, CAST(label AS BIGINT) AS cell,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(FLOOR(x * 1000000) AS BIGINT)) AS q
        |  FROM embeddings),
        |ve AS (SELECT v.vid, v.cell, m.range AS mi, d.range AS d,
        |    v.q[CAST(m.range * 16 + d.range AS INT) + 1] AS x
        |  FROM v CROSS JOIN range(4) m CROSS JOIN range(16) d),
        |cent AS (SELECT cell, mi, d,
        |    CASE WHEN SUM(x) >= 0 THEN SUM(x) // COUNT(*)
        |         ELSE -((-SUM(x)) // COUNT(*)) END AS c
        |  FROM ve GROUP BY 1, 2, 3),
        |vr AS (SELECT ve.vid, ve.cell, ve.mi, ve.d, ve.x - cent.c AS x
        |  FROM ve JOIN cent ON ve.cell = cent.cell AND ve.mi = cent.mi AND ve.d = cent.d),
        |sv AS (SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) - 1 AS ci
        |  FROM (SELECT vid FROM v ORDER BY vid LIMIT 16)),
        |cb AS (SELECT sv.ci, vr.mi, vr.d, vr.x AS c
        |  FROM vr JOIN sv ON vr.vid = sv.vid),
        |dists AS (SELECT vr.vid, vr.cell, vr.mi, cb.ci,
        |    SUM((vr.x - cb.c) * (vr.x - cb.c)) AS dist
        |  FROM vr JOIN cb ON vr.mi = cb.mi AND vr.d = cb.d
        |  GROUP BY 1, 2, 3, 4),
        |codes AS (SELECT vid, cell, mi, ci AS code FROM (
        |    SELECT vid, cell, mi, ci,
        |      ROW_NUMBER() OVER (PARTITION BY vid, mi ORDER BY dist ASC, ci ASC) AS rn
        |    FROM dists) WHERE rn = 1),
        |qcd AS (SELECT ve.vid, cent.cell, SUM((ve.x - cent.c) * (ve.x - cent.c)) AS cdist
        |  FROM ve JOIN cent ON ve.mi = cent.mi AND ve.d = cent.d
        |  GROUP BY 1, 2),
        |probes AS (SELECT vid, cell FROM (
        |    SELECT vid, cell,
        |      ROW_NUMBER() OVER (PARTITION BY vid ORDER BY cdist ASC, cell ASC) AS rn
        |    FROM qcd) WHERE rn <= 2),
        |qres AS (SELECT ve.vid, p.cell, ve.mi, ve.d, ve.x - cent.c AS x
        |  FROM ve JOIN probes p ON ve.vid = p.vid
        |  JOIN cent ON cent.cell = p.cell AND cent.mi = ve.mi AND cent.d = ve.d),
        |qlut AS (SELECT qr.vid, qr.cell, qr.mi, cb.ci,
        |    SUM((qr.x - cb.c) * (qr.x - cb.c)) AS dist
        |  FROM qres qr JOIN cb ON qr.mi = cb.mi AND qr.d = cb.d
        |  GROUP BY 1, 2, 3, 4),
        |pair AS (SELECT l.vid AS query_id, c.vid AS neighbor_id, c.cell,
        |    SUM(l.dist) AS adc_dist
        |  FROM codes c JOIN qlut l ON l.mi = c.mi AND l.ci = c.code
        |    AND l.cell = c.cell AND l.vid <> c.vid
        |  GROUP BY 1, 2, 3),
        |shortlist AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY adc_dist ASC, neighbor_id ASC) AS rnk FROM pair)
        |  WHERE rnk <= 10),
        |exact AS (SELECT s.query_id, s.neighbor_id,
        |    SUM((a.x - b.x) * (a.x - b.x)) AS exact_dist
        |  FROM shortlist s
        |  JOIN ve a ON a.vid = s.query_id
        |  JOIN ve b ON b.vid = s.neighbor_id AND b.mi = a.mi AND b.d = a.d
        |  GROUP BY 1, 2),
        |rr AS (SELECT query_id, neighbor_id, exact_dist,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY exact_dist ASC, neighbor_id ASC) AS rnk FROM exact)
        |SELECT query_id, neighbor_id, CAST(exact_dist AS BIGINT) AS exact_dist,
        |  CAST(rnk AS BIGINT) AS rank
        |FROM rr WHERE rnk <= 3
        |ORDER BY query_id, rank""".stripMargin,

    // Index lifecycle: stored model from the base half (vec_id <= max/2),
    // appended half coarse-assigned + encoded against that stale model,
    // then the full q109 probe/ADC/exact-re-rank over the combined codes.
    "q111_ann_topk_index_appended" ->
      """WITH v AS (SELECT CAST(vec_id AS BIGINT) AS vid, CAST(label AS BIGINT) AS lbl,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(FLOOR(x * 1000000) AS BIGINT)) AS q
        |  FROM embeddings),
        |cut AS (SELECT CAST(MAX(vid) // 2 AS BIGINT) AS cutoff FROM v),
        |ve AS (SELECT v.vid, v.lbl, m.range AS mi, d.range AS d,
        |    v.q[CAST(m.range * 16 + d.range AS INT) + 1] AS x
        |  FROM v CROSS JOIN range(4) m CROSS JOIN range(16) d),
        |-- stored model: centroids + codebooks from the BASE half only
        |cent AS (SELECT lbl AS cell, mi, d,
        |    CASE WHEN SUM(x) >= 0 THEN SUM(x) // COUNT(*)
        |         ELSE -((-SUM(x)) // COUNT(*)) END AS c
        |  FROM ve, cut WHERE ve.vid <= cut.cutoff GROUP BY 1, 2, 3),
        |vrb AS (SELECT ve.vid, ve.lbl AS cell, ve.mi, ve.d, ve.x - cent.c AS x
        |  FROM ve JOIN cent ON ve.lbl = cent.cell AND ve.mi = cent.mi AND ve.d = cent.d
        |  CROSS JOIN cut WHERE ve.vid <= cut.cutoff),
        |sv AS (SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) - 1 AS ci
        |  FROM (SELECT vid FROM v, cut WHERE vid <= cut.cutoff ORDER BY vid LIMIT 16)),
        |cb AS (SELECT sv.ci, vrb.mi, vrb.d, vrb.x AS c
        |  FROM vrb JOIN sv ON vrb.vid = sv.vid),
        |-- base codes: own-label cell
        |bdists AS (SELECT vrb.vid, vrb.cell, vrb.mi, cb.ci,
        |    SUM((vrb.x - cb.c) * (vrb.x - cb.c)) AS dist
        |  FROM vrb JOIN cb ON vrb.mi = cb.mi AND vrb.d = cb.d
        |  GROUP BY 1, 2, 3, 4),
        |bcodes AS (SELECT vid, cell, mi, ci AS code FROM (
        |    SELECT vid, cell, mi, ci,
        |      ROW_NUMBER() OVER (PARTITION BY vid, mi ORDER BY dist ASC, ci ASC) AS rn
        |    FROM bdists) WHERE rn = 1),
        |-- appended vectors: coarse-assign with the stored quantizer
        |acd AS (SELECT ve.vid, cent.cell, SUM((ve.x - cent.c) * (ve.x - cent.c)) AS cdist
        |  FROM ve JOIN cent ON ve.mi = cent.mi AND ve.d = cent.d
        |  CROSS JOIN cut WHERE ve.vid > cut.cutoff
        |  GROUP BY 1, 2),
        |aassign AS (SELECT vid, cell FROM (
        |    SELECT vid, cell,
        |      ROW_NUMBER() OVER (PARTITION BY vid ORDER BY cdist ASC, cell ASC) AS rn
        |    FROM acd) WHERE rn = 1),
        |vra AS (SELECT ve.vid, a.cell, ve.mi, ve.d, ve.x - cent.c AS x
        |  FROM ve JOIN aassign a ON ve.vid = a.vid
        |  JOIN cent ON cent.cell = a.cell AND cent.mi = ve.mi AND cent.d = ve.d),
        |adists AS (SELECT vra.vid, vra.cell, vra.mi, cb.ci,
        |    SUM((vra.x - cb.c) * (vra.x - cb.c)) AS dist
        |  FROM vra JOIN cb ON vra.mi = cb.mi AND vra.d = cb.d
        |  GROUP BY 1, 2, 3, 4),
        |acodes AS (SELECT vid, cell, mi, ci AS code FROM (
        |    SELECT vid, cell, mi, ci,
        |      ROW_NUMBER() OVER (PARTITION BY vid, mi ORDER BY dist ASC, ci ASC) AS rn
        |    FROM adists) WHERE rn = 1),
        |codes AS (SELECT * FROM bcodes UNION ALL SELECT * FROM acodes),
        |-- every vector queries: probe 2 nearest stored centroids
        |qcd AS (SELECT ve.vid, cent.cell, SUM((ve.x - cent.c) * (ve.x - cent.c)) AS cdist
        |  FROM ve JOIN cent ON ve.mi = cent.mi AND ve.d = cent.d
        |  GROUP BY 1, 2),
        |probes AS (SELECT vid, cell FROM (
        |    SELECT vid, cell,
        |      ROW_NUMBER() OVER (PARTITION BY vid ORDER BY cdist ASC, cell ASC) AS rn
        |    FROM qcd) WHERE rn <= 2),
        |qres AS (SELECT ve.vid, p.cell, ve.mi, ve.d, ve.x - cent.c AS x
        |  FROM ve JOIN probes p ON ve.vid = p.vid
        |  JOIN cent ON cent.cell = p.cell AND cent.mi = ve.mi AND cent.d = ve.d),
        |qlut AS (SELECT qr.vid, qr.cell, qr.mi, cb.ci,
        |    SUM((qr.x - cb.c) * (qr.x - cb.c)) AS dist
        |  FROM qres qr JOIN cb ON qr.mi = cb.mi AND qr.d = cb.d
        |  GROUP BY 1, 2, 3, 4),
        |pair AS (SELECT l.vid AS query_id, c.vid AS neighbor_id, c.cell,
        |    SUM(l.dist) AS adc_dist
        |  FROM codes c JOIN qlut l ON l.mi = c.mi AND l.ci = c.code
        |    AND l.cell = c.cell AND l.vid <> c.vid
        |  GROUP BY 1, 2, 3),
        |shortlist AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY adc_dist ASC, neighbor_id ASC) AS rnk FROM pair)
        |  WHERE rnk <= 10),
        |exact AS (SELECT s.query_id, s.neighbor_id,
        |    SUM((a.x - b.x) * (a.x - b.x)) AS exact_dist
        |  FROM shortlist s
        |  JOIN ve a ON a.vid = s.query_id
        |  JOIN ve b ON b.vid = s.neighbor_id AND b.mi = a.mi AND b.d = a.d
        |  GROUP BY 1, 2),
        |rr AS (SELECT query_id, neighbor_id, exact_dist,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY exact_dist ASC, neighbor_id ASC) AS rnk FROM exact)
        |SELECT query_id, neighbor_id, CAST(exact_dist AS BIGINT) AS exact_dist,
        |  CAST(rnk AS BIGINT) AS rank
        |FROM rr WHERE rnk <= 3
        |ORDER BY query_id, rank""".stripMargin,

    "q53_ann_topk_hyperplane" ->
      """WITH v AS (SELECT CAST(vec_id AS BIGINT) AS vid, CAST(embedding AS DOUBLE[]) AS vd FROM embeddings),
        |signs AS (
        |  SELECT p.range AS p, d.range AS d,
        |    CASE WHEN strpos('02468ace', substring(sha256(CAST(p.range AS VARCHAR) || ':' || CAST(d.range AS VARCHAR)), 1, 1)) > 0
        |         THEN 1 ELSE -1 END AS s
        |  FROM range(4) p CROSS JOIN range(64) d),
        |elems AS (
        |  SELECT vid, d.range AS d, vd[CAST(d.range AS INT) + 1] AS x
        |  FROM v CROSS JOIN range(64) d),
        |contribs AS (
        |  SELECT e.vid, s.p, SUM(CAST(FLOOR(e.x * 1000000) AS BIGINT) * s.s) AS c
        |  FROM elems e JOIN signs s ON e.d = s.d
        |  GROUP BY e.vid, s.p),
        |buckets AS (
        |  SELECT vid, SUM(CASE WHEN c > 0 THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END) AS bucket
        |  FROM contribs GROUP BY vid),
        |ranked_planes AS (
        |  SELECT vid, p, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY abs(c) ASC, p ASC) AS rn
        |  FROM contribs),
        |probes AS (
        |  SELECT DISTINCT vid, probe FROM (
        |    SELECT vid, bucket AS probe FROM buckets
        |    UNION ALL
        |    SELECT b.vid, xor(b.bucket, CAST(1 AS BIGINT) << CAST(r.p AS INT)) AS probe
        |    FROM buckets b JOIN ranked_planes r ON b.vid = r.vid AND r.rn <= 3)),
        |cand AS (
        |  SELECT q.vid AS query_id, i.vid AS neighbor_id,
        |    list_cosine_similarity(qv.vd, iv.vd) AS score
        |  FROM probes q JOIN buckets i ON q.probe = i.bucket AND q.vid <> i.vid
        |  JOIN v qv ON qv.vid = q.vid JOIN v iv ON iv.vid = i.vid),
        |r AS (SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rnk FROM cand)
        |SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank FROM r WHERE rnk <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q32_lang_id" ->
      """WITH w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws FROM documents),
        |sc AS (SELECT doc_id, lang,
        |    len(list_filter(ws, x -> x IN ('der','die','und','das','ist'))) AS s_de,
        |    len(list_filter(ws, x -> x IN ('the','a','of','and','is'))) AS s_en,
        |    len(list_filter(ws, x -> x IN ('el','la','de','que','y'))) AS s_es,
        |    len(list_filter(ws, x -> x IN ('le','la','et','les','des'))) AS s_fr,
        |    len(list_filter(ws, x -> x IN ('的','是','了','在','我'))) AS s_zh
        |  FROM w),
        |b AS (SELECT *, GREATEST(s_de, s_en, s_es, s_fr, s_zh) AS best FROM sc)
        |SELECT doc_id,
        |  CASE WHEN best = 0 THEN 'und'
        |    WHEN s_de = best THEN 'de' WHEN s_en = best THEN 'en' WHEN s_es = best THEN 'es'
        |    WHEN s_fr = best THEN 'fr' ELSE 'zh' END AS lang_pred,
        |  lang AS lang_label
        |FROM b ORDER BY doc_id""".stripMargin,

    "q33_quality_score" ->
      """WITH w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS distinct_ratio
        |  FROM w)
        |SELECT doc_id, n_words, n_chars, distinct_ratio,
        |  CAST(CASE WHEN n_words BETWEEN 20 AND 1000 THEN 0.5 ELSE 0.0 END +
        |   CASE WHEN distinct_ratio >= 0.3 THEN 0.5 ELSE 0.0 END AS DOUBLE) AS quality_score,
        |  CASE WHEN (CASE WHEN n_words BETWEEN 20 AND 1000 THEN 0.5 ELSE 0.0 END +
        |        CASE WHEN distinct_ratio >= 0.3 THEN 0.5 ELSE 0.0 END) >= 1.0 THEN 'high'
        |    WHEN (CASE WHEN n_words BETWEEN 20 AND 1000 THEN 0.5 ELSE 0.0 END +
        |        CASE WHEN distinct_ratio >= 0.3 THEN 0.5 ELSE 0.0 END) >= 0.5 THEN 'medium'
        |    ELSE 'low' END AS quality_band
        |FROM m ORDER BY doc_id""".stripMargin,

    "q34_fingerprint" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q35_multimodal_meta" ->
      """WITH m AS (SELECT CAST(doc_id AS BIGINT) AS media_id, CAST(strlen(text) AS BIGINT) AS n FROM documents)
        |SELECT media_id,
        |  CASE WHEN n % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        |  64 + (n % 448) AS width,
        |  64 + ((n * 7) % 448) AS height,
        |  1 + (n % 16) AS n_frames,
        |  n AS n_bytes
        |FROM m ORDER BY media_id""".stripMargin,

    "q56_frame_sample" ->
      """WITH m AS (SELECT CAST(doc_id AS BIGINT) AS media_id, CAST(strlen(text) AS BIGINT) AS n FROM documents),
        |meta AS (SELECT media_id,
        |    1 + (n % 16) AS n_frames,
        |    64 + (n % 448) AS width,
        |    64 + ((n * 7) % 448) AS height,
        |    CASE WHEN n % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
        |  FROM m)
        |SELECT media_id, unnest(range(0, n_frames, 3)) AS frame_idx, width, height, format
        |FROM meta ORDER BY media_id, frame_idx""".stripMargin,

    // integer-only outputs; the repetitive flag compares in integer
    // arithmetic so no float crosses the engine boundary
    "q64_repetition_ratio" ->
      """WITH w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws FROM documents)
        |SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words,
        |  CAST(len(ws) - 1 AS BIGINT) AS n_bigrams,
        |  CAST(len(list_distinct([array_to_string(ws[i:i+1], ' ') for i in range(1, len(ws))])) AS BIGINT) AS n_distinct_bigrams,
        |  ((len(ws) - len(list_distinct(ws))) * 10 > len(ws) * 3) AS repetitive
        |FROM w WHERE len(ws) >= 2 ORDER BY doc_id""".stripMargin,

    "q65_contamination_check" ->
      """WITH w AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws FROM documents),
        |sh AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  unnest(list_distinct([array_to_string(ws[i:i+4], ' ') for i in range(1, len(ws) - 3)])) AS sg
        |  FROM w WHERE len(ws) >= 5)
        |SELECT t.doc_id AS train_doc,
        |  CAST(COUNT(DISTINCT e.doc_id) AS BIGINT) AS n_eval_docs,
        |  CAST(COUNT(DISTINCT t.sg) AS BIGINT) AS n_shared_ngrams
        |FROM sh t JOIN sh e ON t.sg = e.sg AND e.doc_id % 10 = 0 AND t.doc_id % 10 <> 0
        |GROUP BY t.doc_id ORDER BY train_doc""".stripMargin,

    "q66_top_ngrams" ->
      """WITH w AS (SELECT string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws FROM documents),
        |g AS (SELECT unnest([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS gram FROM w WHERE len(ws) >= 3)
        |SELECT gram, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY gram
        |ORDER BY n DESC, gram LIMIT 20""".stripMargin,

    // the float tree mirrors TextOps.bigramSurprisal op for op:
    // p = (c12+1)/(c1+V) as one double division of exact integers,
    // then floor((-ln(p)) * 1e6) per bigram BEFORE the per-doc sum
    "q131_bigram_surprisal" ->
      """WITH w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents),
        |v AS (SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS vocab
        |  FROM (SELECT unnest(ws) AS tk FROM w) WHERE tk <> ''),
        |g AS (SELECT doc_id,
        |    unnest([array_to_string(ws[i:i+1], ' ') for i in range(1, len(ws))]) AS gram
        |  FROM w WHERE len(ws) >= 2),
        |c12 AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS c12 FROM g GROUP BY gram),
        |c1 AS (SELECT split_part(gram, ' ', 1) AS w1, CAST(COUNT(*) AS BIGINT) AS c1
        |  FROM g GROUP BY 1),
        |q AS (SELECT doc_id, CAST(floor((-ln(
        |      CAST(c12 + 1 AS DOUBLE) / CAST(c1 + vocab AS DOUBLE)))
        |      * 1000000.0) AS BIGINT) AS q
        |  FROM g JOIN c12 USING (gram)
        |  JOIN c1 ON split_part(g.gram, ' ', 1) = c1.w1
        |  CROSS JOIN v),
        |s AS (SELECT doc_id, CAST(SUM(q) AS BIGINT) AS surprisal,
        |    CAST(COUNT(*) AS BIGINT) AS n_bigrams
        |  FROM q GROUP BY doc_id)
        |SELECT doc_id, surprisal, n_bigrams, surprisal // n_bigrams AS avg_q
        |FROM s ORDER BY avg_q DESC, doc_id ASC LIMIT 25""".stripMargin,

    "q68_neardup_clusters" ->
      """WITH w AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws FROM documents),
        |sh AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sg
        |  FROM w WHERE len(ws) >= 3),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.sg, b.sg)) * 2.0 >= len(list_distinct(list_concat(a.sg, b.sg)))),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT DISTINCT a AS node FROM edges),
        |reach AS (
        |  WITH RECURSIVE r(node, t) AS (
        |    SELECT node, node FROM nodes
        |    UNION
        |    SELECT e.b, r.t FROM edges e JOIN r ON r.node = e.a)
        |  SELECT * FROM r)
        |SELECT node AS doc_id, MIN(t) AS component FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,

    // independently re-runs the whole curation chain: repetition filter,
    // min-id exact dedup, brute-force Jaccard near-dup drop (the Spark
    // side's LSH+verify must produce the identical pair set), 5-gram
    // decontamination, per-lang stats
    "q67_corpus_pipeline" ->
      """WITH w AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents),
        |keep1 AS (
        |  SELECT * FROM w
        |  WHERE doc_id % 10 <> 0
        |    AND len(ws) >= 2 AND (len(ws) - len(list_distinct(ws))) * 10 <= len(ws) * 7),
        |keep2 AS (
        |  SELECT * FROM keep1
        |  WHERE doc_id IN (SELECT min(doc_id) FROM keep1 GROUP BY sha256(nt))),
        |sh3 AS (
        |  SELECT doc_id, list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sg
        |  FROM keep2 WHERE len(ws) >= 3),
        |dropped_neardup AS (
        |  SELECT DISTINCT b.doc_id AS doc_id
        |  FROM sh3 a JOIN sh3 b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.sg, b.sg)) * 2.0 >= len(list_distinct(list_concat(a.sg, b.sg)))),
        |keep3 AS (SELECT * FROM keep2 WHERE doc_id NOT IN (SELECT doc_id FROM dropped_neardup)),
        |sh5t AS (
        |  SELECT doc_id, unnest(list_distinct([array_to_string(ws[i:i+4], ' ') for i in range(1, len(ws) - 3)])) AS sg
        |  FROM keep3 WHERE len(ws) >= 5),
        |sh5e AS (  -- the FULL original eval set, not just survivors
        |  SELECT unnest(list_distinct([array_to_string(ws[i:i+4], ' ') for i in range(1, len(ws) - 3)])) AS sg
        |  FROM w WHERE doc_id % 10 = 0 AND len(ws) >= 5),
        |contaminated AS (
        |  SELECT DISTINCT t.doc_id FROM sh5t t JOIN sh5e e ON t.sg = e.sg),
        |final AS (
        |  SELECT * FROM keep3 WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(ws)) AS BIGINT) AS total_tokens,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc, CAST(MAX(doc_id) AS BIGINT) AS last_doc
        |FROM final GROUP BY lang ORDER BY lang""".stripMargin,

    // recomputes the Lloyd step end-to-end: quantized vectors, first-8
    // seeds, exact integer nearest-centroid assignment (tie -> lowest
    // cell), per-(cell, dim) sums/counts
    "q72_kmeans_step" ->
      """WITH v AS (SELECT CAST(vec_id AS BIGINT) AS vid,
        |    list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
        |  FROM embeddings),
        |c AS (SELECT vid, qv, CAST(ROW_NUMBER() OVER (ORDER BY vid) - 1 AS BIGINT) AS cell
        |      FROM (SELECT * FROM v ORDER BY vid LIMIT 8)),
        |d AS (SELECT v.vid, c.cell,
        |    list_sum([ (v.qv[i] - c.qv[i]) * (v.qv[i] - c.qv[i]) for i in range(1, len(v.qv) + 1) ]) AS dist
        |  FROM v CROSS JOIN c),
        |a AS (SELECT vid, cell FROM (
        |    SELECT vid, cell, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d)
        |  WHERE rn = 1),
        |e AS (SELECT a.cell, dd.range AS dim, v.qv[CAST(dd.range AS INT) + 1] AS x
        |  FROM a JOIN v ON a.vid = v.vid CROSS JOIN range(64) dd)
        |SELECT cell, CAST(dim AS BIGINT) AS dim, CAST(SUM(x) AS BIGINT) AS sum_q,
        |  CAST(COUNT(*) AS BIGINT) AS n_vecs
        |FROM e GROUP BY cell, dim ORDER BY cell, dim""".stripMargin,

    // replays the full v2 chain: gate, exact dedup (k1b), line filter,
    // span dedup, brute near-dup, decontamination vs original eval
    // texts, stats
    "q77_corpus_pipeline_full" ->
      """WITH w AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents),
        |evalg AS (
        |  SELECT DISTINCT unnest(list_distinct([array_to_string(ws[i:i+4], ' ') for i in range(1, len(ws) - 3)])) AS sg
        |  FROM w WHERE doc_id % 10 = 0 AND len(ws) >= 5),
        |k1 AS (
        |  SELECT doc_id, ws FROM w
        |  WHERE doc_id % 10 <> 0
        |    AND NOT (len(ws) < 15 OR len(ws) > 10000
        |      OR (length(array_to_string(ws, ' ')) - (len(ws) - 1)) < len(ws) * 3
        |      OR (length(array_to_string(ws, ' ')) - (len(ws) - 1)) > len(ws) * 10
        |      OR (len(ws) - len(list_distinct(ws))) * 10 > len(ws) * 7
        |      OR len(list_filter(ws, x -> x IN ('the','a','of','and','is'))) < 2)),
        |k1b AS (SELECT doc_id, ws FROM k1
        |  WHERE doc_id IN (SELECT min(doc_id) FROM (SELECT doc_id, array_to_string(ws, ' ') AS nt2 FROM k1) GROUP BY nt2)),
        |ld AS (SELECT doc_id, [array_to_string(ws[i:i+3], ' ') for i in range(1, len(ws) + 1, 4)] AS ls FROM k1b),
        |lfreq AS (SELECT line FROM (
        |    SELECT line, COUNT(DISTINCT doc_id) AS n
        |    FROM (SELECT doc_id, unnest(ls) AS line FROM ld) GROUP BY line) WHERE n >= 3),
        |lf AS (SELECT coalesce(list(line), CAST([] AS VARCHAR[])) AS fl FROM lfreq),
        |k2 AS (SELECT doc_id,
        |    string_split(array_to_string(list_filter(ld.ls, x -> NOT list_contains(lf.fl, x)), ' '), ' ') AS ws2
        |  FROM ld CROSS JOIN lf
        |  WHERE len(list_filter(ld.ls, x -> NOT list_contains(lf.fl, x))) > 0),
        |sp AS (SELECT doc_id,
        |    unnest([{'start': i - 1, 'g': array_to_string(ws2[i:i+9], ' ')} for i in range(1, len(ws2) - 8)],
        |           recursive := true)
        |  FROM k2 WHERE len(ws2) >= 10),
        |dupg AS (SELECT g FROM sp GROUP BY g HAVING COUNT(*) >= 2),
        |cov AS (SELECT DISTINCT doc_id, pos FROM (
        |    SELECT doc_id, unnest([p for p in range(start, start + 10)]) AS pos
        |    FROM sp WHERE g IN (SELECT g FROM dupg))),
        |cl AS (SELECT doc_id, list(pos ORDER BY pos) AS cl FROM cov GROUP BY doc_id),
        |k3 AS (SELECT k2.doc_id,
        |    [ws2[i] for i in range(1, len(ws2) + 1) if NOT list_contains(COALESCE(cl.cl, CAST([] AS BIGINT[])), i - 1)] AS ws3
        |  FROM k2 LEFT JOIN cl ON k2.doc_id = cl.doc_id),
        |k4 AS (SELECT doc_id, ws3, array_to_string(ws3, ' ') AS t3 FROM k3 WHERE len(ws3) > 0),
        |sh3 AS (SELECT doc_id, list_distinct([array_to_string(ws3[i:i+2], ' ') for i in range(1, len(ws3) - 1)]) AS sg
        |  FROM k4 WHERE len(ws3) >= 3),
        |nd AS (SELECT DISTINCT b.doc_id FROM sh3 a JOIN sh3 b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.sg, b.sg)) * 2.0 >= len(list_distinct(list_concat(a.sg, b.sg)))),
        |k5 AS (SELECT * FROM k4 WHERE doc_id NOT IN (SELECT doc_id FROM nd)),
        |sh5 AS (SELECT doc_id, unnest(list_distinct([array_to_string(ws3[i:i+4], ' ') for i in range(1, len(ws3) - 3)])) AS sg
        |  FROM k5 WHERE len(ws3) >= 5),
        |cont AS (SELECT DISTINCT t.doc_id FROM sh5 t JOIN evalg e ON t.sg = e.sg),
        |final AS (SELECT k5.doc_id, k5.ws3, w.lang FROM k5 JOIN w ON k5.doc_id = w.doc_id
        |          WHERE k5.doc_id NOT IN (SELECT doc_id FROM cont))
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(ws3)) AS BIGINT) AS total_tokens,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc, CAST(MAX(doc_id) AS BIGINT) AS last_doc
        |FROM final GROUP BY lang ORDER BY lang""".stripMargin,

    // unrolls the exact training loop: seed -> assign -> update ->
    // assign -> update -> final assign (truncating integer means,
    // emptied cells keep their centroid via the LEFT JOIN), then
    // re-ranks the cell-restricted cosine top-3
    "q76_ann_topk_trained" ->
      """WITH v AS (SELECT CAST(vec_id AS BIGINT) AS vid,
        |    CAST(embedding AS DOUBLE[]) AS vd,
        |    list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
        |  FROM embeddings),
        |e AS (SELECT vid, dd.range AS dim, qv[CAST(dd.range AS INT) + 1] AS x
        |      FROM v CROSS JOIN range(64) dd),
        |c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vid) - 1 AS BIGINT) AS cell, vid
        |       FROM (SELECT vid FROM v ORDER BY vid LIMIT 8)),
        |cent0 AS (SELECT c0.cell, e.dim, e.x AS comp FROM c0 JOIN e ON c0.vid = e.vid),
        |d1 AS (SELECT e.vid, c.cell, SUM((e.x - c.comp) * (e.x - c.comp)) AS dist
        |       FROM e JOIN cent0 c ON e.dim = c.dim GROUP BY e.vid, c.cell),
        |a1 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d1) WHERE rn = 1),
        |s1 AS (SELECT a.cell, e.dim, CAST(SUM(e.x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM a1 a JOIN e ON a.vid = e.vid GROUP BY a.cell, e.dim),
        |cent1 AS (SELECT c.cell, c.dim,
        |        COALESCE(CASE WHEN s1.s >= 0 THEN s1.s // s1.n ELSE -((-s1.s) // s1.n) END, c.comp) AS comp
        |       FROM cent0 c LEFT JOIN s1 ON c.cell = s1.cell AND c.dim = s1.dim),
        |d2 AS (SELECT e.vid, c.cell, SUM((e.x - c.comp) * (e.x - c.comp)) AS dist
        |       FROM e JOIN cent1 c ON e.dim = c.dim GROUP BY e.vid, c.cell),
        |a2 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d2) WHERE rn = 1),
        |s2 AS (SELECT a.cell, e.dim, CAST(SUM(e.x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM a2 a JOIN e ON a.vid = e.vid GROUP BY a.cell, e.dim),
        |cent2 AS (SELECT c.cell, c.dim,
        |        COALESCE(CASE WHEN s2.s >= 0 THEN s2.s // s2.n ELSE -((-s2.s) // s2.n) END, c.comp) AS comp
        |       FROM cent1 c LEFT JOIN s2 ON c.cell = s2.cell AND c.dim = s2.dim),
        |d3 AS (SELECT e.vid, c.cell, SUM((e.x - c.comp) * (e.x - c.comp)) AS dist
        |       FROM e JOIN cent2 c ON e.dim = c.dim GROUP BY e.vid, c.cell),
        |a3 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d3) WHERE rn = 1),
        |cand AS (SELECT aq.cell, aq.vid AS query_id, ac.vid AS neighbor_id,
        |      list_cosine_similarity(q.vd, c.vd) AS score
        |    FROM a3 aq JOIN a3 ac ON aq.cell = ac.cell AND aq.vid <> ac.vid
        |    JOIN v q ON q.vid = aq.vid JOIN v c ON c.vid = ac.vid),
        |r AS (SELECT cell, query_id, neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rnk FROM cand)
        |SELECT cell, query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank FROM r WHERE rnk <= 3
        |ORDER BY query_id, rank""".stripMargin,

    // same batch construction; exact stage on normalized text equality,
    // near stage brute-force Jaccard >= 0.5 (the Spark side's banded
    // LSH + verify must reproduce it), greedy keep-first semantics.
    // q78 (prepared-index path) must produce the identical judgment.
    "q78_incremental_dedup_prepared" -> incrementalDedupSql,
    // the pruned-lifecycle judgment must equal the fresh-index one
    "q132_dedup_index_pruned" -> incrementalDedupSql,
    "q73_incremental_dedup" -> incrementalDedupSql,

    // the cap makes the planted hot family contribute NOTHING, so the
    // capped pairs over base∪family must equal the brute pairs over the
    // base corpus alone — q27's oracle verbatim
    "q82_skew_neardup_capped" -> shingleCte,
    "q83_skew_ingest_capped" -> skewIngestSql,
    "q84_skew_lifecycle_compacted" -> skewLifecycleSql,
    "q104_stream_intake_multi_trigger" -> streamIntakeSql,
  ) ++ oraclesTail

  /** Shared q73/q78 oracle: exact stage on normalized-text equality, near
    * stage brute-force Jaccard ≥ 0.5, greedy keep-first. (def, not val —
    * referenced from `oracles`, which initializes earlier in the object.)
    */
  private def incrementalDedupSql: String =
      """WITH a0 AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents),
        |corpus AS (SELECT doc_id, nt, ws FROM a0 WHERE doc_id % 7 <> 3),
        |newb AS (
        |  SELECT doc_id + 1000000 AS nid, nt, ws FROM a0 WHERE doc_id % 7 = 3
        |  UNION ALL
        |  SELECT doc_id + 2000000, nt, ws FROM a0 WHERE doc_id % 7 <> 3 AND doc_id % 50 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, nt, ws FROM a0 WHERE doc_id % 7 = 3 AND doc_id % 100 = 1),
        |exact_c AS (SELECT n.nid, MIN(c.doc_id) AS m FROM newb n JOIN corpus c ON n.nt = c.nt GROUP BY n.nid),
        |exact_n AS (SELECT a.nid, MIN(b.nid) AS m FROM newb a JOIN newb b ON a.nt = b.nt AND b.nid < a.nid GROUP BY a.nid),
        |exact AS (SELECT COALESCE(ec.nid, en.nid) AS nid, COALESCE(LEAST(ec.m, en.m), ec.m, en.m) AS match_id
        |  FROM exact_c ec FULL OUTER JOIN exact_n en ON ec.nid = en.nid),
        |surv AS (SELECT * FROM newb WHERE nid NOT IN (SELECT nid FROM exact)),
        |shn AS (SELECT nid, list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sg
        |  FROM surv WHERE len(ws) >= 3),
        |shc AS (SELECT doc_id, list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sg
        |  FROM corpus WHERE len(ws) >= 3),
        |near_c AS (SELECT s.nid, MIN(c.doc_id) AS m FROM shn s JOIN shc c
        |  ON len(list_intersect(s.sg, c.sg)) * 2.0 >= len(list_distinct(list_concat(s.sg, c.sg))) GROUP BY s.nid),
        |near_n AS (SELECT b.nid, MIN(a.nid) AS m FROM shn a JOIN shn b ON a.nid < b.nid
        |  AND len(list_intersect(a.sg, b.sg)) * 2.0 >= len(list_distinct(list_concat(a.sg, b.sg))) GROUP BY b.nid),
        |near AS (SELECT COALESCE(nc.nid, nn.nid) AS nid, COALESCE(LEAST(nc.m, nn.m), nc.m, nn.m) AS m
        |  FROM near_c nc FULL OUTER JOIN near_n nn ON nc.nid = nn.nid)
        |SELECT n.nid AS new_id,
        |  CASE WHEN e.nid IS NOT NULL THEN 'exact_dup'
        |       WHEN nr.nid IS NOT NULL THEN 'near_dup' ELSE 'kept' END AS status,
        |  COALESCE(e.match_id, nr.m) AS match_id
        |FROM newb n LEFT JOIN exact e ON n.nid = e.nid LEFT JOIN near nr ON n.nid = nr.nid
        |ORDER BY new_id""".stripMargin

  /** q83 oracle: the q73-style uncapped brute replay over the skewed
    * corpus, with ONE deliberate divergence that models the cap — the
    * corpus-near leg (shc) sees the BASE documents only, because the
    * planted family's band buckets exceed skewCap and are dropped at
    * index build. Everything else (exact stage incl. the family,
    * in-batch greedy near stage incl. the 20 family probes matching
    * each other) replays uncapped semantics brute-force, so any cap
    * regression — family pairs leaking into candidates, probes fanning
    * out against the corpus family — diverges from this oracle.
    */
  private def skewIngestSql: String =
    """WITH a0 AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
      |  FROM documents),
      |famk AS (SELECT CAST((d.rn - 1) * 4 + x.i AS BIGINT) AS k
      |  FROM (SELECT ROW_NUMBER() OVER (ORDER BY doc_id) AS rn FROM documents) d
      |  CROSS JOIN (VALUES (0), (1), (2), (3)) AS x(i)),
      |fam AS (SELECT 1000000 + k AS doc_id, '@TPL' || k AS nt FROM famk),
      |corpus AS (SELECT doc_id, nt FROM a0 UNION ALL SELECT doc_id, nt FROM fam),
      |newb AS (
      |  SELECT doc_id + 2000000 AS nid, nt FROM a0 WHERE doc_id % 50 = 0
      |  UNION ALL
      |  SELECT doc_id + 4000000, nt || ' zz' || doc_id FROM a0 WHERE doc_id % 40 = 7
      |  UNION ALL
      |  SELECT 3000000 + r.range AS nid,
      |    '@TPL' || ((SELECT COUNT(*) * 4 FROM documents) + r.range) AS nt
      |  FROM range(20) r),
      |nb AS (SELECT nid, nt, string_split(nt, ' ') AS ws FROM newb),
      |exact_c AS (SELECT n.nid, MIN(c.doc_id) AS m FROM nb n JOIN corpus c ON n.nt = c.nt GROUP BY n.nid),
      |exact_n AS (SELECT a.nid, MIN(b.nid) AS m FROM nb a JOIN nb b ON a.nt = b.nt AND b.nid < a.nid GROUP BY a.nid),
      |exact AS (SELECT COALESCE(ec.nid, en.nid) AS nid, COALESCE(LEAST(ec.m, en.m), ec.m, en.m) AS match_id
      |  FROM exact_c ec FULL OUTER JOIN exact_n en ON ec.nid = en.nid),
      |surv AS (SELECT * FROM nb WHERE nid NOT IN (SELECT nid FROM exact)),
      |shn AS (SELECT nid, list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sg
      |  FROM surv WHERE len(ws) >= 3),
      |shc AS (SELECT doc_id, list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sg
      |  FROM (SELECT doc_id, string_split(nt, ' ') AS ws FROM a0) WHERE len(ws) >= 3),
      |near_c AS (SELECT s.nid, MIN(c.doc_id) AS m FROM shn s JOIN shc c
      |  ON len(list_intersect(s.sg, c.sg)) * 2.0 >= len(list_distinct(list_concat(s.sg, c.sg))) GROUP BY s.nid),
      |near_n AS (SELECT b.nid, MIN(a.nid) AS m FROM shn a JOIN shn b ON a.nid < b.nid
      |  AND len(list_intersect(a.sg, b.sg)) * 2.0 >= len(list_distinct(list_concat(a.sg, b.sg))) GROUP BY b.nid),
      |near AS (SELECT COALESCE(nc.nid, nn.nid) AS nid, COALESCE(LEAST(nc.m, nn.m), nc.m, nn.m) AS m
      |  FROM near_c nc FULL OUTER JOIN near_n nn ON nc.nid = nn.nid)
      |SELECT n.nid AS new_id,
      |  CASE WHEN e.nid IS NOT NULL THEN 'exact_dup'
      |       WHEN nr.nid IS NOT NULL THEN 'near_dup' ELSE 'kept' END AS status,
      |  COALESCE(e.match_id, nr.m) AS match_id
      |FROM newb n LEFT JOIN exact e ON n.nid = e.nid LEFT JOIN near nr ON n.nid = nr.nid
      |ORDER BY new_id""".stripMargin.replace("@TPL", skewTemplate)

  /** q84 oracle: the post-lifecycle corpus state replayed brute with the
    * cap modeled. Exact stage sees base ∪ family ∪ the 800 ACCEPTED
    * batch1 docs (the append is never capped on fingerprints); the
    * corpus-near leg sees the BASE docs only (the planted family was
    * dropped at build and the appended family's buckets at compaction);
    * the in-batch near leg replays greedy keep-first among survivors.
    * Any lifecycle regression — append lost by compaction, base bands
    * damaged, re-cap inactive — diverges from this oracle.
    */
  private def skewLifecycleSql: String =
    """WITH a0 AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
      |  FROM documents),
      |famn AS (SELECT COUNT(*) * 4 AS n FROM documents),
      |famk AS (SELECT CAST((d.rn - 1) * 4 + x.i AS BIGINT) AS k
      |  FROM (SELECT ROW_NUMBER() OVER (ORDER BY doc_id) AS rn FROM documents) d
      |  CROSS JOIN (VALUES (0), (1), (2), (3)) AS x(i)),
      |fam AS (SELECT 1000000 + k AS doc_id, '@TPL' || k AS nt FROM famk),
      |kept1 AS (SELECT 3000000 + r.range AS doc_id,
      |    '@TPL' || ((SELECT n FROM famn) + r.range) AS nt
      |  FROM range(800) r),
      |corpus AS (SELECT doc_id, nt FROM a0
      |  UNION ALL SELECT doc_id, nt FROM fam
      |  UNION ALL SELECT doc_id, nt FROM kept1),
      |newb AS (
      |  SELECT 5000000 + r.range * 40 AS nid,
      |    '@TPL' || ((SELECT n FROM famn) + r.range * 40) AS nt FROM range(20) r
      |  UNION ALL
      |  SELECT doc_id + 4000000, nt || ' zz' || doc_id FROM a0 WHERE doc_id % 40 = 7
      |  UNION ALL
      |  SELECT 6000000 + r.range AS nid,
      |    '@TPL' || ((SELECT n FROM famn) + 800 + r.range) AS nt FROM range(20) r
      |  UNION ALL
      |  SELECT doc_id + 2000000, nt FROM a0 WHERE doc_id % 50 = 0),
      |nb AS (SELECT nid, nt, string_split(nt, ' ') AS ws FROM newb),
      |exact_c AS (SELECT n.nid, MIN(c.doc_id) AS m FROM nb n JOIN corpus c ON n.nt = c.nt GROUP BY n.nid),
      |exact_n AS (SELECT a.nid, MIN(b.nid) AS m FROM nb a JOIN nb b ON a.nt = b.nt AND b.nid < a.nid GROUP BY a.nid),
      |exact AS (SELECT COALESCE(ec.nid, en.nid) AS nid, COALESCE(LEAST(ec.m, en.m), ec.m, en.m) AS match_id
      |  FROM exact_c ec FULL OUTER JOIN exact_n en ON ec.nid = en.nid),
      |surv AS (SELECT * FROM nb WHERE nid NOT IN (SELECT nid FROM exact)),
      |shn AS (SELECT nid, list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sg
      |  FROM surv WHERE len(ws) >= 3),
      |shc AS (SELECT doc_id, list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sg
      |  FROM (SELECT doc_id, string_split(nt, ' ') AS ws FROM a0) WHERE len(ws) >= 3),
      |near_c AS (SELECT s.nid, MIN(c.doc_id) AS m FROM shn s JOIN shc c
      |  ON len(list_intersect(s.sg, c.sg)) * 2.0 >= len(list_distinct(list_concat(s.sg, c.sg))) GROUP BY s.nid),
      |near_n AS (SELECT b.nid, MIN(a.nid) AS m FROM shn a JOIN shn b ON a.nid < b.nid
      |  AND len(list_intersect(a.sg, b.sg)) * 2.0 >= len(list_distinct(list_concat(a.sg, b.sg))) GROUP BY b.nid),
      |near AS (SELECT COALESCE(nc.nid, nn.nid) AS nid, COALESCE(LEAST(nc.m, nn.m), nc.m, nn.m) AS m
      |  FROM near_c nc FULL OUTER JOIN near_n nn ON nc.nid = nn.nid)
      |SELECT n.nid AS new_id,
      |  CASE WHEN e.nid IS NOT NULL THEN 'exact_dup'
      |       WHEN nr.nid IS NOT NULL THEN 'near_dup' ELSE 'kept' END AS status,
      |  COALESCE(e.match_id, nr.m) AS match_id
      |FROM newb n LEFT JOIN exact e ON n.nid = e.nid LEFT JOIN near nr ON n.nid = nr.nid
      |ORDER BY new_id""".stripMargin.replace("@TPL", skewTemplate)

  /** q104 oracle: the three-trigger intake replayed SEQUENTIALLY brute-
    * force — stage k judges batch k (exact stage on normalized text,
    * in-batch keep-first, then Jaccard ≥ 0.5 near stage) against
    * corpus ∪ every earlier stage's kept docs, exactly the state the
    * per-trigger index append accumulates; the probe stage re-judges all
    * streamed docs (+1e7) against the final index state.
    */
  private def streamIntakeSql: String = {
    // one judgment stage: batch `b` vs index `i` → exact set x$k, kept
    // k$k. Every CTE is MATERIALIZED: each stage references earlier
    // stages several times, and DuckDB's default CTE inlining would
    // re-expand the whole upstream pipeline per reference —
    // exponentially across four chained stages.
    def stage(k: String, b: String, i: String): String =
      s"""x${k}c AS MATERIALIZED (SELECT n.nid, MIN(c.doc_id) AS m FROM $b n JOIN $i c ON n.nt = c.nt GROUP BY n.nid),
         |x${k}n AS MATERIALIZED (SELECT a.nid, MIN(b.nid) AS m FROM $b a JOIN $b b ON a.nt = b.nt AND b.nid < a.nid GROUP BY a.nid),
         |x$k AS MATERIALIZED (SELECT COALESCE(ec.nid, en.nid) AS nid FROM x${k}c ec FULL OUTER JOIN x${k}n en ON ec.nid = en.nid),
         |v$k AS MATERIALIZED (SELECT * FROM $b WHERE nid NOT IN (SELECT nid FROM x$k)),
         |gn$k AS MATERIALIZED (SELECT nid, list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sg
         |  FROM (SELECT nid, string_split(nt, ' ') AS ws FROM v$k) WHERE len(ws) >= 3),
         |gc$k AS MATERIALIZED (SELECT doc_id, list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sg
         |  FROM (SELECT doc_id, string_split(nt, ' ') AS ws FROM $i) WHERE len(ws) >= 3),
         |n$k AS MATERIALIZED (SELECT s.nid FROM gn$k s JOIN gc$k c
         |    ON len(list_intersect(s.sg, c.sg)) * 2.0 >= len(list_distinct(list_concat(s.sg, c.sg))) GROUP BY s.nid
         |  UNION SELECT b.nid FROM gn$k a JOIN gn$k b ON a.nid < b.nid
         |    AND len(list_intersect(a.sg, b.sg)) * 2.0 >= len(list_distinct(list_concat(a.sg, b.sg))) GROUP BY b.nid),
         |k$k AS MATERIALIZED (SELECT nid, nt FROM v$k WHERE nid NOT IN (SELECT nid FROM n$k)),""".stripMargin
    s"""WITH a0 AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
       |  FROM documents),
       |i1 AS MATERIALIZED (SELECT doc_id, nt FROM a0 WHERE doc_id % 7 <> 3),
       |b1 AS MATERIALIZED (SELECT doc_id + 1000000 AS nid, nt FROM a0 WHERE doc_id % 21 = 3
       |  UNION ALL SELECT doc_id + 2000000, nt FROM a0 WHERE doc_id % 7 <> 3 AND doc_id % 50 = 0),
       |b2 AS MATERIALIZED (SELECT doc_id + 1000000 AS nid, nt FROM a0 WHERE doc_id % 21 = 10
       |  UNION ALL SELECT doc_id + 3000000, trim(nt || ' zz') FROM a0 WHERE doc_id % 21 = 3 AND doc_id % 2 = 1),
       |b3 AS MATERIALIZED (SELECT doc_id + 1000000 AS nid, nt FROM a0 WHERE doc_id % 21 = 17
       |  UNION ALL SELECT doc_id + 4000000, nt FROM a0 WHERE doc_id % 21 = 10),
       |${stage("1", "b1", "i1")}
       |i2 AS MATERIALIZED (SELECT doc_id, nt FROM i1 UNION ALL SELECT nid, nt FROM k1),
       |${stage("2", "b2", "i2")}
       |i3 AS MATERIALIZED (SELECT doc_id, nt FROM i2 UNION ALL SELECT nid, nt FROM k2),
       |${stage("3", "b3", "i3")}
       |i4 AS MATERIALIZED (SELECT doc_id, nt FROM i3 UNION ALL SELECT nid, nt FROM k3),
       |bp AS MATERIALIZED (SELECT nid + 10000000 AS nid, nt FROM b1
       |  UNION ALL SELECT nid + 10000000, nt FROM b2
       |  UNION ALL SELECT nid + 10000000, nt FROM b3),
       |${stage("4", "bp", "i4")}
       |probe AS (SELECT p.nid,
       |    CASE WHEN e.nid IS NOT NULL THEN 'exact_dup'
       |         WHEN nr.nid IS NOT NULL THEN 'near_dup' ELSE 'kept' END AS status
       |  FROM bp p LEFT JOIN x4 e ON p.nid = e.nid LEFT JOIN n4 nr ON p.nid = nr.nid)
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS src, nid AS doc_id, 'kept' AS status FROM k1
       |  UNION ALL SELECT 2, nid, 'kept' FROM k2
       |  UNION ALL SELECT 3, nid, 'kept' FROM k3
       |  UNION ALL SELECT 4, nid, status FROM probe)
       |ORDER BY src, doc_id""".stripMargin
  }

  private def oraclesTail: Map[String, String] = Map(
    // dirty-window coverage replayed on the 5-gram STRINGS: eval span
    // set, per-occurrence window [start-10, start+4+10] clamped,
    // uncovered-position reassembly (the q75 conventions)
    "q142_decontaminate_scrub" ->
      """WITH w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, doc_id % 10 = 0 AS is_eval,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws FROM documents),
        |ev AS (SELECT DISTINCT g FROM (
        |    SELECT unnest([array_to_string(ws[i:i+4], ' ') for i in range(1, len(ws) - 3)]) AS g
        |    FROM w WHERE is_eval AND len(ws) >= 5)),
        |sp AS (SELECT doc_id, len(ws) AS nw,
        |    unnest([{'start': i - 1, 'g': array_to_string(ws[i:i+4], ' ')} for i in range(1, len(ws) - 3)],
        |           recursive := true)
        |  FROM w WHERE NOT is_eval AND len(ws) >= 5),
        |cov AS (SELECT DISTINCT doc_id, pos FROM (
        |    SELECT doc_id, unnest([p for p in range(
        |        CASE WHEN start - 10 > 0 THEN start - 10 ELSE 0 END,
        |        CASE WHEN start + 15 < nw THEN start + 15 ELSE nw END)]) AS pos
        |    FROM sp WHERE g IN (SELECT g FROM ev))),
        |cl AS (SELECT doc_id, list(pos ORDER BY pos) AS cl FROM cov GROUP BY doc_id),
        |j AS (SELECT w.doc_id, w.ws, COALESCE(cl.cl, CAST([] AS BIGINT[])) AS cov
        |      FROM w LEFT JOIN cl ON w.doc_id = cl.doc_id WHERE NOT w.is_eval)
        |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words, CAST(len(cov) AS BIGINT) AS n_covered,
        |  COALESCE(array_to_string([ws[i] for i in range(1, len(ws) + 1) if NOT list_contains(cov, i - 1)], ' '), '') AS text_clean
        |FROM j ORDER BY doc_id""".stripMargin,

    // q68's recursive-CTE components + singleton fallback + the
    // deterministic per-component argmax (score desc, id asc)
    "q141_neardup_keep_best" ->
      """WITH w AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws FROM documents),
        |sh AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sg
        |  FROM w WHERE len(ws) >= 3),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.sg, b.sg)) * 2.0 >= len(list_distinct(list_concat(a.sg, b.sg)))),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT DISTINCT a AS node FROM edges),
        |reach AS (
        |  WITH RECURSIVE r(node, t) AS (
        |    SELECT node, node FROM nodes
        |    UNION
        |    SELECT e.b, r.t FROM edges e JOIN r ON r.node = e.a)
        |  SELECT * FROM r),
        |comp AS (SELECT node AS doc_id, MIN(t) AS component FROM reach GROUP BY node),
        |lab AS (SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
        |    CAST(d.n_chars AS BIGINT) AS score,
        |    COALESCE(c.component, CAST(d.doc_id AS BIGINT)) AS component
        |  FROM documents d LEFT JOIN comp c ON CAST(d.doc_id AS BIGINT) = c.doc_id),
        |k AS (SELECT component, doc_id AS keeper FROM (
        |    SELECT component, doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY component ORDER BY score DESC, doc_id ASC) AS rn
        |    FROM lab) WHERE rn = 1)
        |SELECT lab.doc_id, lab.component, lab.score, k.keeper, lab.doc_id = k.keeper AS kept
        |FROM lab JOIN k USING (component) ORDER BY lab.doc_id""".stripMargin,

    // q68's recursive-CTE components + singleton fallback + the
    // sha256-prefix split gate on the component id
    "q140_leakage_safe_split" ->
      """WITH w AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws FROM documents),
        |sh AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sg
        |  FROM w WHERE len(ws) >= 3),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.sg, b.sg)) * 2.0 >= len(list_distinct(list_concat(a.sg, b.sg)))),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT DISTINCT a AS node FROM edges),
        |reach AS (
        |  WITH RECURSIVE r(node, t) AS (
        |    SELECT node, node FROM nodes
        |    UNION
        |    SELECT e.b, r.t FROM edges e JOIN r ON r.node = e.a)
        |  SELECT * FROM r),
        |comp AS (SELECT node AS doc_id, MIN(t) AS component FROM reach GROUP BY node),
        |lab AS (SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
        |    COALESCE(c.component, CAST(d.doc_id AS BIGINT)) AS component
        |  FROM documents d LEFT JOIN comp c ON CAST(d.doc_id AS BIGINT) = c.doc_id),
        |g AS (SELECT doc_id, component,
        |    substring(sha256('graft-split:' || CAST(component AS VARCHAR)), 1, 2) AS gate FROM lab)
        |SELECT doc_id, component,
        |  CASE WHEN gate < '1a' THEN 'test' WHEN gate < '34' THEN 'val' ELSE 'train' END AS split
        |FROM g ORDER BY doc_id""".stripMargin,

    // three unrolled logistic epochs: residuals -> gradients ->
    // truncating micro-unit updates (the q76 CASE convention for
    // negative integer division), then the trained margins
    "q138_quality_classifier" ->
      """WITH feat AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id, doc_id % 10 = 0 AS is_target,
        |    substring(sha256('graft-qc:' || tk), 1, 2) AS bucket
        |  FROM (SELECT doc_id, unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tk
        |        FROM documents) WHERE tk <> ''),
        |nn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM feat),
        |docs AS (SELECT DISTINCT doc_id, is_target FROM feat),
        |r1 AS (SELECT doc_id, 500000 - CASE WHEN is_target THEN 1000000 ELSE 0 END AS r FROM docs),
        |g1 AS (SELECT bucket, SUM(r) AS g FROM feat JOIN r1 USING (doc_id) GROUP BY bucket),
        |w1 AS (SELECT bucket, -(CASE WHEN g * 4 >= 0 THEN (g * 4) // n ELSE -((-(g * 4)) // n) END) AS w FROM g1, nn),
        |m2 AS (SELECT f.doc_id, SUM(w1.w) AS m FROM feat f JOIN w1 USING (bucket) GROUP BY f.doc_id),
        |r2 AS (SELECT d.doc_id,
        |    CAST(floor(1000000.0 / (1.0 + exp(-CAST(m AS DOUBLE) / 1000000.0))) AS BIGINT)
        |      - CASE WHEN d.is_target THEN 1000000 ELSE 0 END AS r
        |  FROM m2 JOIN docs d USING (doc_id)),
        |g2 AS (SELECT bucket, SUM(r) AS g FROM feat JOIN r2 USING (doc_id) GROUP BY bucket),
        |w2 AS (SELECT w1.bucket, w1.w - (CASE WHEN g * 4 >= 0 THEN (g * 4) // n ELSE -((-(g * 4)) // n) END) AS w
        |  FROM w1 JOIN g2 USING (bucket), nn),
        |m3 AS (SELECT f.doc_id, SUM(w2.w) AS m FROM feat f JOIN w2 USING (bucket) GROUP BY f.doc_id),
        |r3 AS (SELECT d.doc_id,
        |    CAST(floor(1000000.0 / (1.0 + exp(-CAST(m AS DOUBLE) / 1000000.0))) AS BIGINT)
        |      - CASE WHEN d.is_target THEN 1000000 ELSE 0 END AS r
        |  FROM m3 JOIN docs d USING (doc_id)),
        |g3 AS (SELECT bucket, SUM(r) AS g FROM feat JOIN r3 USING (doc_id) GROUP BY bucket),
        |w3 AS (SELECT w2.bucket, w2.w - (CASE WHEN g * 4 >= 0 THEN (g * 4) // n ELSE -((-(g * 4)) // n) END) AS w
        |  FROM w2 JOIN g3 USING (bucket), nn)
        |SELECT f.doc_id, CAST(SUM(w3.w) AS BIGINT) AS margin_q, SUM(w3.w) > 0 AS predicted_target
        |FROM feat f JOIN w3 USING (bucket)
        |WHERE NOT f.is_target
        |GROUP BY f.doc_id ORDER BY f.doc_id""".stripMargin,

    // q136's corpus-side unroll, then the batch assigned through the
    // TRAINED centroids and judged on both legs (vs corpus cell-mates,
    // vs lower-id batch-mates), dup_of = least match
    "q139_semantic_dedup_incremental" ->
      """WITH base AS (SELECT CAST(vec_id AS BIGINT) AS vid, CAST(embedding AS DOUBLE[]) AS vd FROM embeddings),
        |bat0 AS (
        |  SELECT vid + 100000 AS vid, list_concat([vd[1] * 1.25], vd[2:]) AS vd FROM base WHERE vid % 5 = 0
        |  UNION ALL
        |  SELECT vid + 200000 AS vid, vd FROM base WHERE vid % 7 = 3),
        |v AS (SELECT vid, list_transform(vd, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv FROM base),
        |e AS (SELECT vid, dd.range AS dim, qv[CAST(dd.range AS INT) + 1] AS x FROM v CROSS JOIN range(64) dd),
        |c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vid) - 1 AS BIGINT) AS cell, vid
        |       FROM (SELECT vid FROM v ORDER BY vid LIMIT 8)),
        |cent0 AS (SELECT c0.cell, e.dim, e.x AS comp FROM c0 JOIN e ON c0.vid = e.vid),
        |d1 AS (SELECT e.vid, c.cell, SUM((e.x - c.comp) * (e.x - c.comp)) AS dist
        |       FROM e JOIN cent0 c ON e.dim = c.dim GROUP BY e.vid, c.cell),
        |a1 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d1) WHERE rn = 1),
        |s1 AS (SELECT a.cell, e.dim, CAST(SUM(e.x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM a1 a JOIN e ON a.vid = e.vid GROUP BY a.cell, e.dim),
        |cent1 AS (SELECT c.cell, c.dim,
        |        COALESCE(CASE WHEN s1.s >= 0 THEN s1.s // s1.n ELSE -((-s1.s) // s1.n) END, c.comp) AS comp
        |       FROM cent0 c LEFT JOIN s1 ON c.cell = s1.cell AND c.dim = s1.dim),
        |d2 AS (SELECT e.vid, c.cell, SUM((e.x - c.comp) * (e.x - c.comp)) AS dist
        |       FROM e JOIN cent1 c ON e.dim = c.dim GROUP BY e.vid, c.cell),
        |a2 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d2) WHERE rn = 1),
        |s2 AS (SELECT a.cell, e.dim, CAST(SUM(e.x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM a2 a JOIN e ON a.vid = e.vid GROUP BY a.cell, e.dim),
        |cent2 AS (SELECT c.cell, c.dim,
        |        COALESCE(CASE WHEN s2.s >= 0 THEN s2.s // s2.n ELSE -((-s2.s) // s2.n) END, c.comp) AS comp
        |       FROM cent1 c LEFT JOIN s2 ON c.cell = s2.cell AND c.dim = s2.dim),
        |bq AS (SELECT vid, list_transform(vd, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv FROM bat0),
        |be AS (SELECT vid, dd.range AS dim, qv[CAST(dd.range AS INT) + 1] AS x FROM bq CROSS JOIN range(64) dd),
        |d3 AS (SELECT e.vid, c.cell, SUM((e.x - c.comp) * (e.x - c.comp)) AS dist
        |       FROM e JOIN cent2 c ON e.dim = c.dim GROUP BY e.vid, c.cell),
        |a3 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d3) WHERE rn = 1),
        |bd AS (SELECT be.vid, c.cell, SUM((be.x - c.comp) * (be.x - c.comp)) AS dist
        |       FROM be JOIN cent2 c ON be.dim = c.dim GROUP BY be.vid, c.cell),
        |ba AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM bd) WHERE rn = 1),
        |nc AS (SELECT vid, qv, list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS n2 FROM v),
        |nb AS (SELECT vid, qv, list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS n2 FROM bq),
        |prc AS (SELECT a.vid AS va, b.vid AS vb,
        |        list_dot_product(CAST(na.qv AS DOUBLE[]), CAST(nb.qv AS DOUBLE[])) AS d,
        |        na.n2 AS na2, nb.n2 AS nb2
        |      FROM ba b JOIN a3 a ON a.cell = b.cell
        |      JOIN nc na ON na.vid = a.vid JOIN nb ON nb.vid = b.vid),
        |mc AS (SELECT vb AS vid, MIN(va) AS m FROM prc
        |      WHERE d > 0 AND d * d >= 0.81 * na2 * nb2 GROUP BY vb),
        |prb AS (SELECT a.vid AS va, b.vid AS vb,
        |        list_dot_product(CAST(na.qv AS DOUBLE[]), CAST(nb.qv AS DOUBLE[])) AS d,
        |        na.n2 AS na2, nb.n2 AS nb2
        |      FROM ba b JOIN ba a ON a.cell = b.cell AND a.vid < b.vid
        |      JOIN nb na ON na.vid = a.vid JOIN nb ON nb.vid = b.vid),
        |mb AS (SELECT vb AS vid, MIN(va) AS m FROM prb
        |      WHERE d > 0 AND d * d >= 0.81 * na2 * nb2 GROUP BY vb),
        |dups AS (SELECT COALESCE(mc.vid, mb.vid) AS vid,
        |      COALESCE(LEAST(mc.m, mb.m), mc.m, mb.m) AS dup_of
        |    FROM mc FULL OUTER JOIN mb ON mc.vid = mb.vid)
        |SELECT ba.vid, ba.cell, dups.dup_of, dups.dup_of IS NULL AS kept
        |FROM ba LEFT JOIN dups ON ba.vid = dups.vid
        |ORDER BY ba.vid""".stripMargin,

    // q139's unroll with the batch split into the stream's TWO
    // micro-batches and replayed SEQUENTIALLY: b1 (+1e5 perturbed)
    // judges against corpus + b1-mates; b2 (+2e5 exact clones) judges
    // against corpus ∪ KEPT-b1 + b2-mates — the persisted-index intake
    // semantics (dropped b1 rows never enter the corpus side; in q139's
    // one-shot judge they would still be mates). The mid-stream fold is
    // answer-preserving by construction, so the oracle needs no notion
    // of versions.
    "q146_semantic_dedup_stream_intake" ->
      """WITH base AS (SELECT CAST(vec_id AS BIGINT) AS vid, CAST(embedding AS DOUBLE[]) AS vd FROM embeddings),
        |b1r AS (SELECT vid + 100000 AS vid, list_concat([vd[1] * 1.25], vd[2:]) AS vd FROM base WHERE vid % 5 = 0),
        |b2r AS (SELECT vid + 200000 AS vid, vd FROM base WHERE vid % 7 = 3),
        |v AS (SELECT vid, list_transform(vd, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv FROM base),
        |e AS (SELECT vid, dd.range AS dim, qv[CAST(dd.range AS INT) + 1] AS x FROM v CROSS JOIN range(64) dd),
        |c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vid) - 1 AS BIGINT) AS cell, vid
        |       FROM (SELECT vid FROM v ORDER BY vid LIMIT 8)),
        |cent0 AS (SELECT c0.cell, e.dim, e.x AS comp FROM c0 JOIN e ON c0.vid = e.vid),
        |d1 AS (SELECT e.vid, c.cell, SUM((e.x - c.comp) * (e.x - c.comp)) AS dist
        |       FROM e JOIN cent0 c ON e.dim = c.dim GROUP BY e.vid, c.cell),
        |a1 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d1) WHERE rn = 1),
        |s1 AS (SELECT a.cell, e.dim, CAST(SUM(e.x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM a1 a JOIN e ON a.vid = e.vid GROUP BY a.cell, e.dim),
        |cent1 AS (SELECT c.cell, c.dim,
        |        COALESCE(CASE WHEN s1.s >= 0 THEN s1.s // s1.n ELSE -((-s1.s) // s1.n) END, c.comp) AS comp
        |       FROM cent0 c LEFT JOIN s1 ON c.cell = s1.cell AND c.dim = s1.dim),
        |d2 AS (SELECT e.vid, c.cell, SUM((e.x - c.comp) * (e.x - c.comp)) AS dist
        |       FROM e JOIN cent1 c ON e.dim = c.dim GROUP BY e.vid, c.cell),
        |a2 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d2) WHERE rn = 1),
        |s2 AS (SELECT a.cell, e.dim, CAST(SUM(e.x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM a2 a JOIN e ON a.vid = e.vid GROUP BY a.cell, e.dim),
        |cent2 AS (SELECT c.cell, c.dim,
        |        COALESCE(CASE WHEN s2.s >= 0 THEN s2.s // s2.n ELSE -((-s2.s) // s2.n) END, c.comp) AS comp
        |       FROM cent1 c LEFT JOIN s2 ON c.cell = s2.cell AND c.dim = s2.dim),
        |d3 AS (SELECT e.vid, c.cell, SUM((e.x - c.comp) * (e.x - c.comp)) AS dist
        |       FROM e JOIN cent2 c ON e.dim = c.dim GROUP BY e.vid, c.cell),
        |a3 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d3) WHERE rn = 1),
        |nc AS (SELECT vid, qv, list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS n2 FROM v),
        |q1 AS (SELECT vid, list_transform(vd, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv FROM b1r),
        |q2 AS (SELECT vid, list_transform(vd, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv FROM b2r),
        |e1 AS (SELECT vid, dd.range AS dim, qv[CAST(dd.range AS INT) + 1] AS x FROM q1 CROSS JOIN range(64) dd),
        |e2 AS (SELECT vid, dd.range AS dim, qv[CAST(dd.range AS INT) + 1] AS x FROM q2 CROSS JOIN range(64) dd),
        |bd1 AS (SELECT e1.vid, c.cell, SUM((e1.x - c.comp) * (e1.x - c.comp)) AS dist
        |       FROM e1 JOIN cent2 c ON e1.dim = c.dim GROUP BY e1.vid, c.cell),
        |ba1 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM bd1) WHERE rn = 1),
        |bd2 AS (SELECT e2.vid, c.cell, SUM((e2.x - c.comp) * (e2.x - c.comp)) AS dist
        |       FROM e2 JOIN cent2 c ON e2.dim = c.dim GROUP BY e2.vid, c.cell),
        |ba2 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM bd2) WHERE rn = 1),
        |n1 AS (SELECT vid, qv, list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS n2 FROM q1),
        |n2t AS (SELECT vid, qv, list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS n2 FROM q2),
        |prc1 AS (SELECT a.vid AS va, b.vid AS vb,
        |        list_dot_product(CAST(na.qv AS DOUBLE[]), CAST(nb.qv AS DOUBLE[])) AS d,
        |        na.n2 AS na2, nb.n2 AS nb2
        |      FROM ba1 b JOIN a3 a ON a.cell = b.cell
        |      JOIN nc na ON na.vid = a.vid JOIN n1 nb ON nb.vid = b.vid),
        |mc1 AS (SELECT vb AS vid, MIN(va) AS m FROM prc1
        |      WHERE d > 0 AND d * d >= 0.81 * na2 * nb2 GROUP BY vb),
        |prb1 AS (SELECT a.vid AS va, b.vid AS vb,
        |        list_dot_product(CAST(na.qv AS DOUBLE[]), CAST(nb.qv AS DOUBLE[])) AS d,
        |        na.n2 AS na2, nb.n2 AS nb2
        |      FROM ba1 b JOIN ba1 a ON a.cell = b.cell AND a.vid < b.vid
        |      JOIN n1 na ON na.vid = a.vid JOIN n1 nb ON nb.vid = b.vid),
        |mb1 AS (SELECT vb AS vid, MIN(va) AS m FROM prb1
        |      WHERE d > 0 AND d * d >= 0.81 * na2 * nb2 GROUP BY vb),
        |dups1 AS (SELECT COALESCE(mc1.vid, mb1.vid) AS vid,
        |      COALESCE(LEAST(mc1.m, mb1.m), mc1.m, mb1.m) AS dup_of
        |    FROM mc1 FULL OUTER JOIN mb1 ON mc1.vid = mb1.vid),
        |verd1 AS (SELECT ba1.vid, ba1.cell, dups1.dup_of, dups1.dup_of IS NULL AS kept
        |    FROM ba1 LEFT JOIN dups1 ON ba1.vid = dups1.vid),
        |corp2 AS (SELECT vid, cell FROM a3
        |    UNION ALL SELECT vid, cell FROM verd1 WHERE dup_of IS NULL),
        |nall AS (SELECT vid, qv, n2 FROM nc UNION ALL SELECT vid, qv, n2 FROM n1),
        |prc2 AS (SELECT a.vid AS va, b.vid AS vb,
        |        list_dot_product(CAST(na.qv AS DOUBLE[]), CAST(nb.qv AS DOUBLE[])) AS d,
        |        na.n2 AS na2, nb.n2 AS nb2
        |      FROM ba2 b JOIN corp2 a ON a.cell = b.cell
        |      JOIN nall na ON na.vid = a.vid JOIN n2t nb ON nb.vid = b.vid),
        |mc2 AS (SELECT vb AS vid, MIN(va) AS m FROM prc2
        |      WHERE d > 0 AND d * d >= 0.81 * na2 * nb2 GROUP BY vb),
        |prb2 AS (SELECT a.vid AS va, b.vid AS vb,
        |        list_dot_product(CAST(na.qv AS DOUBLE[]), CAST(nb.qv AS DOUBLE[])) AS d,
        |        na.n2 AS na2, nb.n2 AS nb2
        |      FROM ba2 b JOIN ba2 a ON a.cell = b.cell AND a.vid < b.vid
        |      JOIN n2t na ON na.vid = a.vid JOIN n2t nb ON nb.vid = b.vid),
        |mb2 AS (SELECT vb AS vid, MIN(va) AS m FROM prb2
        |      WHERE d > 0 AND d * d >= 0.81 * na2 * nb2 GROUP BY vb),
        |dups2 AS (SELECT COALESCE(mc2.vid, mb2.vid) AS vid,
        |      COALESCE(LEAST(mc2.m, mb2.m), mc2.m, mb2.m) AS dup_of
        |    FROM mc2 FULL OUTER JOIN mb2 ON mc2.vid = mb2.vid),
        |verd2 AS (SELECT ba2.vid, ba2.cell, dups2.dup_of, dups2.dup_of IS NULL AS kept
        |    FROM ba2 LEFT JOIN dups2 ON ba2.vid = dups2.vid)
        |SELECT vid, cell, dup_of, kept
        |FROM (SELECT * FROM verd1 UNION ALL SELECT * FROM verd2) u
        |ORDER BY vid""".stripMargin,

    // q139's unroll over the two-sided hot fixture (clones of vector 1
    // under +3e5 corpus-side and +4e5 batch-side), plus the per-leg
    // cell-width exclusions: the corpus pair leg drops corpus cells
    // wider than 150 (widths on the corpus assignment a3), the batch
    // pair leg drops batch cells wider than 150 (widths on the batch
    // assignment ba); verdicts still cover every batch vector
    "q144_semantic_dedup_incremental_capped" ->
      """WITH base AS (SELECT CAST(vec_id AS BIGINT) AS vid, CAST(embedding AS DOUBLE[]) AS vd FROM embeddings),
        |hotref AS (SELECT vd FROM base WHERE vid = 1),
        |hotc AS (SELECT b.vid + 300000 AS vid, r.vd AS vd FROM base b CROSS JOIN hotref r WHERE b.vid % 2 = 0),
        |hotb AS (SELECT b.vid + 400000 AS vid, r.vd AS vd FROM base b CROSS JOIN hotref r WHERE b.vid % 3 = 0),
        |corp AS (SELECT * FROM base UNION ALL SELECT * FROM hotc),
        |bat0 AS (
        |  SELECT vid + 100000 AS vid, list_concat([vd[1] * 1.25], vd[2:]) AS vd FROM base WHERE vid % 5 = 0
        |  UNION ALL
        |  SELECT vid + 200000 AS vid, vd FROM base WHERE vid % 7 = 3
        |  UNION ALL
        |  SELECT * FROM hotb),
        |v AS (SELECT vid, list_transform(vd, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv FROM corp),
        |e AS (SELECT vid, dd.range AS dim, qv[CAST(dd.range AS INT) + 1] AS x FROM v CROSS JOIN range(64) dd),
        |c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vid) - 1 AS BIGINT) AS cell, vid
        |       FROM (SELECT vid FROM v ORDER BY vid LIMIT 8)),
        |cent0 AS (SELECT c0.cell, e.dim, e.x AS comp FROM c0 JOIN e ON c0.vid = e.vid),
        |d1 AS (SELECT e.vid, c.cell, SUM((e.x - c.comp) * (e.x - c.comp)) AS dist
        |       FROM e JOIN cent0 c ON e.dim = c.dim GROUP BY e.vid, c.cell),
        |a1 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d1) WHERE rn = 1),
        |s1 AS (SELECT a.cell, e.dim, CAST(SUM(e.x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM a1 a JOIN e ON a.vid = e.vid GROUP BY a.cell, e.dim),
        |cent1 AS (SELECT c.cell, c.dim,
        |        COALESCE(CASE WHEN s1.s >= 0 THEN s1.s // s1.n ELSE -((-s1.s) // s1.n) END, c.comp) AS comp
        |       FROM cent0 c LEFT JOIN s1 ON c.cell = s1.cell AND c.dim = s1.dim),
        |d2 AS (SELECT e.vid, c.cell, SUM((e.x - c.comp) * (e.x - c.comp)) AS dist
        |       FROM e JOIN cent1 c ON e.dim = c.dim GROUP BY e.vid, c.cell),
        |a2 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d2) WHERE rn = 1),
        |s2 AS (SELECT a.cell, e.dim, CAST(SUM(e.x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM a2 a JOIN e ON a.vid = e.vid GROUP BY a.cell, e.dim),
        |cent2 AS (SELECT c.cell, c.dim,
        |        COALESCE(CASE WHEN s2.s >= 0 THEN s2.s // s2.n ELSE -((-s2.s) // s2.n) END, c.comp) AS comp
        |       FROM cent1 c LEFT JOIN s2 ON c.cell = s2.cell AND c.dim = s2.dim),
        |bq AS (SELECT vid, list_transform(vd, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv FROM bat0),
        |be AS (SELECT vid, dd.range AS dim, qv[CAST(dd.range AS INT) + 1] AS x FROM bq CROSS JOIN range(64) dd),
        |d3 AS (SELECT e.vid, c.cell, SUM((e.x - c.comp) * (e.x - c.comp)) AS dist
        |       FROM e JOIN cent2 c ON e.dim = c.dim GROUP BY e.vid, c.cell),
        |a3 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d3) WHERE rn = 1),
        |bd AS (SELECT be.vid, c.cell, SUM((be.x - c.comp) * (be.x - c.comp)) AS dist
        |       FROM be JOIN cent2 c ON be.dim = c.dim GROUP BY be.vid, c.cell),
        |ba AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM bd) WHERE rn = 1),
        |wc AS (SELECT cell, COUNT(*) AS cw FROM a3 GROUP BY cell),
        |wb AS (SELECT cell, COUNT(*) AS cw FROM ba GROUP BY cell),
        |aj AS (SELECT a3.vid, a3.cell FROM a3 JOIN wc USING (cell) WHERE cw <= 150),
        |bj AS (SELECT ba.vid, ba.cell FROM ba JOIN wb USING (cell) WHERE cw <= 150),
        |nc AS (SELECT vid, qv, list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS n2 FROM v),
        |nb AS (SELECT vid, qv, list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS n2 FROM bq),
        |prc AS (SELECT a.vid AS va, b.vid AS vb,
        |        list_dot_product(CAST(na.qv AS DOUBLE[]), CAST(nb.qv AS DOUBLE[])) AS d,
        |        na.n2 AS na2, nb.n2 AS nb2
        |      FROM ba b JOIN aj a ON a.cell = b.cell
        |      JOIN nc na ON na.vid = a.vid JOIN nb ON nb.vid = b.vid),
        |mc AS (SELECT vb AS vid, MIN(va) AS m FROM prc
        |      WHERE d > 0 AND d * d >= 0.81 * na2 * nb2 GROUP BY vb),
        |prb AS (SELECT a.vid AS va, b.vid AS vb,
        |        list_dot_product(CAST(na.qv AS DOUBLE[]), CAST(nb.qv AS DOUBLE[])) AS d,
        |        na.n2 AS na2, nb.n2 AS nb2
        |      FROM ba b JOIN bj a ON a.cell = b.cell AND a.vid < b.vid
        |      JOIN nb na ON na.vid = a.vid JOIN nb ON nb.vid = b.vid),
        |mb AS (SELECT vb AS vid, MIN(va) AS m FROM prb
        |      WHERE d > 0 AND d * d >= 0.81 * na2 * nb2 GROUP BY vb),
        |dups AS (SELECT COALESCE(mc.vid, mb.vid) AS vid,
        |      COALESCE(LEAST(mc.m, mb.m), mc.m, mb.m) AS dup_of
        |    FROM mc FULL OUTER JOIN mb ON mc.vid = mb.vid)
        |SELECT ba.vid, ba.cell, dups.dup_of, dups.dup_of IS NULL AS kept
        |FROM ba LEFT JOIN dups ON ba.vid = dups.vid
        |ORDER BY ba.vid""".stripMargin,

    // q76's kmeans unroll (2 Lloyd iterations, integer-exact) over the
    // q54 planted near-dup corpus, then q54's quantized-cosine pair
    // math restricted to same-cell pairs, min-id-wins
    "q136_semantic_dedup" ->
      """WITH base AS (SELECT CAST(vec_id AS BIGINT) AS vid, CAST(embedding AS DOUBLE[]) AS vd FROM embeddings),
        |pert AS (SELECT vid + 100000 AS vid, list_concat([vd[1] * 1.25], vd[2:]) AS vd
        |         FROM base WHERE vid % 5 = 0),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
        |v AS (SELECT vid, list_transform(vd, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv FROM u),
        |e AS (SELECT vid, dd.range AS dim, qv[CAST(dd.range AS INT) + 1] AS x
        |      FROM v CROSS JOIN range(64) dd),
        |c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vid) - 1 AS BIGINT) AS cell, vid
        |       FROM (SELECT vid FROM v ORDER BY vid LIMIT 8)),
        |cent0 AS (SELECT c0.cell, e.dim, e.x AS comp FROM c0 JOIN e ON c0.vid = e.vid),
        |d1 AS (SELECT e.vid, c.cell, SUM((e.x - c.comp) * (e.x - c.comp)) AS dist
        |       FROM e JOIN cent0 c ON e.dim = c.dim GROUP BY e.vid, c.cell),
        |a1 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d1) WHERE rn = 1),
        |s1 AS (SELECT a.cell, e.dim, CAST(SUM(e.x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM a1 a JOIN e ON a.vid = e.vid GROUP BY a.cell, e.dim),
        |cent1 AS (SELECT c.cell, c.dim,
        |        COALESCE(CASE WHEN s1.s >= 0 THEN s1.s // s1.n ELSE -((-s1.s) // s1.n) END, c.comp) AS comp
        |       FROM cent0 c LEFT JOIN s1 ON c.cell = s1.cell AND c.dim = s1.dim),
        |d2 AS (SELECT e.vid, c.cell, SUM((e.x - c.comp) * (e.x - c.comp)) AS dist
        |       FROM e JOIN cent1 c ON e.dim = c.dim GROUP BY e.vid, c.cell),
        |a2 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d2) WHERE rn = 1),
        |s2 AS (SELECT a.cell, e.dim, CAST(SUM(e.x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM a2 a JOIN e ON a.vid = e.vid GROUP BY a.cell, e.dim),
        |cent2 AS (SELECT c.cell, c.dim,
        |        COALESCE(CASE WHEN s2.s >= 0 THEN s2.s // s2.n ELSE -((-s2.s) // s2.n) END, c.comp) AS comp
        |       FROM cent1 c LEFT JOIN s2 ON c.cell = s2.cell AND c.dim = s2.dim),
        |d3 AS (SELECT e.vid, c.cell, SUM((e.x - c.comp) * (e.x - c.comp)) AS dist
        |       FROM e JOIN cent2 c ON e.dim = c.dim GROUP BY e.vid, c.cell),
        |a3 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d3) WHERE rn = 1),
        |n AS (SELECT vid, qv, list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS n2 FROM v),
        |pr AS (SELECT a.vid AS va, b.vid AS vb,
        |        list_dot_product(CAST(na.qv AS DOUBLE[]), CAST(nb.qv AS DOUBLE[])) AS d,
        |        na.n2 AS na2, nb.n2 AS nb2
        |      FROM a3 a JOIN a3 b ON a.cell = b.cell AND a.vid < b.vid
        |      JOIN n na ON na.vid = a.vid JOIN n nb ON nb.vid = b.vid),
        |dups AS (SELECT vb AS vid, MIN(va) AS dup_of FROM pr
        |      WHERE d > 0 AND d * d >= 0.81 * na2 * nb2 GROUP BY vb)
        |SELECT a3.vid, a3.cell, dups.dup_of, dups.dup_of IS NULL AS kept
        |FROM a3 LEFT JOIN dups ON a3.vid = dups.vid
        |ORDER BY a3.vid""".stripMargin,

    // q136's unroll over the hot-cell corpus (clones of vector 1 under
    // +3e5), then the DETERMINISTIC cell-width exclusion: widths count
    // the final assignment, cells wider than 150 leave the pair CTE
    // (their members still get verdict rows — kept), surviving cells
    // judge by the same quantized-cosine math
    "q143_semantic_dedup_capped" ->
      """WITH base AS (SELECT CAST(vec_id AS BIGINT) AS vid, CAST(embedding AS DOUBLE[]) AS vd FROM embeddings),
        |pert AS (SELECT vid + 100000 AS vid, list_concat([vd[1] * 1.25], vd[2:]) AS vd
        |         FROM base WHERE vid % 5 = 0),
        |hot AS (SELECT b.vid + 300000 AS vid, r.vd AS vd
        |        FROM base b CROSS JOIN (SELECT vd FROM base WHERE vid = 1) r
        |        WHERE b.vid % 2 = 0),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM pert UNION ALL SELECT * FROM hot),
        |v AS (SELECT vid, list_transform(vd, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv FROM u),
        |e AS (SELECT vid, dd.range AS dim, qv[CAST(dd.range AS INT) + 1] AS x
        |      FROM v CROSS JOIN range(64) dd),
        |c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vid) - 1 AS BIGINT) AS cell, vid
        |       FROM (SELECT vid FROM v ORDER BY vid LIMIT 8)),
        |cent0 AS (SELECT c0.cell, e.dim, e.x AS comp FROM c0 JOIN e ON c0.vid = e.vid),
        |d1 AS (SELECT e.vid, c.cell, SUM((e.x - c.comp) * (e.x - c.comp)) AS dist
        |       FROM e JOIN cent0 c ON e.dim = c.dim GROUP BY e.vid, c.cell),
        |a1 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d1) WHERE rn = 1),
        |s1 AS (SELECT a.cell, e.dim, CAST(SUM(e.x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM a1 a JOIN e ON a.vid = e.vid GROUP BY a.cell, e.dim),
        |cent1 AS (SELECT c.cell, c.dim,
        |        COALESCE(CASE WHEN s1.s >= 0 THEN s1.s // s1.n ELSE -((-s1.s) // s1.n) END, c.comp) AS comp
        |       FROM cent0 c LEFT JOIN s1 ON c.cell = s1.cell AND c.dim = s1.dim),
        |d2 AS (SELECT e.vid, c.cell, SUM((e.x - c.comp) * (e.x - c.comp)) AS dist
        |       FROM e JOIN cent1 c ON e.dim = c.dim GROUP BY e.vid, c.cell),
        |a2 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d2) WHERE rn = 1),
        |s2 AS (SELECT a.cell, e.dim, CAST(SUM(e.x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM a2 a JOIN e ON a.vid = e.vid GROUP BY a.cell, e.dim),
        |cent2 AS (SELECT c.cell, c.dim,
        |        COALESCE(CASE WHEN s2.s >= 0 THEN s2.s // s2.n ELSE -((-s2.s) // s2.n) END, c.comp) AS comp
        |       FROM cent1 c LEFT JOIN s2 ON c.cell = s2.cell AND c.dim = s2.dim),
        |d3 AS (SELECT e.vid, c.cell, SUM((e.x - c.comp) * (e.x - c.comp)) AS dist
        |       FROM e JOIN cent2 c ON e.dim = c.dim GROUP BY e.vid, c.cell),
        |a3 AS (SELECT vid, cell FROM (SELECT vid, cell,
        |        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist ASC, cell ASC) AS rn FROM d3) WHERE rn = 1),
        |width AS (SELECT cell, COUNT(*) AS cw FROM a3 GROUP BY cell),
        |aj AS (SELECT a3.vid, a3.cell FROM a3 JOIN width USING (cell) WHERE cw <= 150),
        |n AS (SELECT vid, qv, list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS n2 FROM v),
        |pr AS (SELECT a.vid AS va, b.vid AS vb,
        |        list_dot_product(CAST(na.qv AS DOUBLE[]), CAST(nb.qv AS DOUBLE[])) AS d,
        |        na.n2 AS na2, nb.n2 AS nb2
        |      FROM aj a JOIN aj b ON a.cell = b.cell AND a.vid < b.vid
        |      JOIN n na ON na.vid = a.vid JOIN n nb ON nb.vid = b.vid),
        |dups AS (SELECT vb AS vid, MIN(va) AS dup_of FROM pr
        |      WHERE d > 0 AND d * d >= 0.81 * na2 * nb2 GROUP BY vb)
        |SELECT a3.vid, a3.cell, dups.dup_of, dups.dup_of IS NULL AS kept
        |FROM a3 LEFT JOIN dups ON a3.vid = dups.vid
        |ORDER BY a3.vid""".stripMargin,

    // re-derives the 256-bucket hashed model (sha256-prefix buckets,
    // add-one-smoothed log-ratio micro-nats, one ln per bucket) and the
    // per-doc integer sums over raw docs
    "q137_dsir_scores" ->
      """WITH w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, doc_id % 10 = 0 AS is_target,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws FROM documents),
        |tok AS (SELECT doc_id, is_target, unnest(ws) AS tk FROM w),
        |b AS (SELECT doc_id, is_target,
        |    substring(sha256('graft-dsir:' || tk), 1, 2) AS bucket FROM tok WHERE tk <> ''),
        |cnt AS (SELECT bucket, SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS t_b,
        |        SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS r_b FROM b GROUP BY bucket),
        |tot AS (SELECT SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS tt,
        |        SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS rt FROM b),
        |lam AS (SELECT bucket, CAST(floor(ln(
        |      (CAST(t_b + 1 AS DOUBLE) * CAST(rt + 256 AS DOUBLE))
        |        / (CAST(r_b + 1 AS DOUBLE) * CAST(tt + 256 AS DOUBLE)))
        |      * 1000000.0) AS BIGINT) AS lam_q FROM cnt, tot)
        |SELECT doc_id, CAST(SUM(lam_q) AS BIGINT) AS dsir_score, CAST(COUNT(*) AS BIGINT) AS n_toks
        |FROM b JOIN lam USING (bucket) WHERE NOT is_target
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // re-runs span dedup on the span STRINGS (the Spark side hashes
    // them — q27/q28 convention): occurrence counts, coverage explode,
    // uncovered-position reassembly
    "q75_span_dedup" ->
      """WITH base AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
        |  UNION ALL
        |  SELECT CAST(doc_id AS BIGINT) + 500000, text FROM documents WHERE doc_id % 25 = 0),
        |w AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws FROM base),
        |sp AS (SELECT doc_id,
        |    unnest([{'start': i - 1, 'g': array_to_string(ws[i:i+9], ' ')} for i in range(1, len(ws) - 8)],
        |           recursive := true)
        |  FROM w WHERE len(ws) >= 10),
        |dupg AS (SELECT g FROM sp GROUP BY g HAVING COUNT(*) >= 2),
        |cov AS (SELECT DISTINCT doc_id, pos FROM (
        |    SELECT doc_id, unnest([p for p in range(start, start + 10)]) AS pos
        |    FROM sp WHERE g IN (SELECT g FROM dupg))),
        |cl AS (SELECT doc_id, list(pos ORDER BY pos) AS cl FROM cov GROUP BY doc_id),
        |j AS (SELECT w.doc_id, w.ws, COALESCE(cl.cl, CAST([] AS BIGINT[])) AS cov
        |      FROM w LEFT JOIN cl ON w.doc_id = cl.doc_id)
        |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words, CAST(len(cov) AS BIGINT) AS n_covered,
        |  COALESCE(array_to_string([ws[i] for i in range(1, len(ws) + 1) if NOT list_contains(cov, i - 1)], ' '), '') AS text_clean
        |FROM j ORDER BY doc_id""".stripMargin,

    // re-chunks each doc into 4-word lines, counts distinct-doc line
    // frequency, drops lines in ≥3 docs from every doc, reassembles in
    // order — the whole operator re-run in list SQL
    "q69_line_dedup" ->
      """WITH w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws FROM documents),
        |d AS (SELECT doc_id,
        |    [array_to_string(ws[i:i+3], ' ') for i in range(1, len(ws) + 1, 4)] AS ls FROM w),
        |freq AS (SELECT line FROM (
        |    SELECT line, COUNT(DISTINCT doc_id) AS n
        |    FROM (SELECT doc_id, unnest(ls) AS line FROM d) GROUP BY line) WHERE n >= 3),
        |f AS (SELECT coalesce(list(line), CAST([] AS VARCHAR[])) AS fl FROM freq),
        |k AS (SELECT doc_id, ls, list_filter(ls, x -> NOT list_contains(f.fl, x)) AS kept
        |      FROM d CROSS JOIN f)
        |SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines, CAST(len(kept) AS BIGINT) AS n_kept,
        |  COALESCE(array_to_string(kept, chr(10)), '') AS text_clean
        |FROM k ORDER BY doc_id""".stripMargin,

    // same synthetic PII construction + RE2 patterns; counts on the raw
    // text, sequential replace email -> phone -> ip
    "q70_pii_redact" ->
      """WITH p AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex' || CAST(doc_id % 10 AS VARCHAR) ||
        |  '.org call 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-4567 ip 10.0.' ||
        |  CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\d{3}[- .]\d{3,4}[- .]\d{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(t, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS BIGINT) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\d{3}[- .]\d{3,4}[- .]\d{4}', '<PHONE>', 'g'),
        |    '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g') AS text_clean
        |FROM p ORDER BY doc_id""".stripMargin,

    // integer-arithmetic quality rules; reasons list order is part of
    // the contract
    "q71_quality_gate" ->
      """WITH w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words,
        |    CAST(length(array_to_string(ws, ' ')) - (len(ws) - 1) AS BIGINT) AS n_word_chars,
        |    CAST(len(list_filter(ws, x -> x IN ('the','a','of','and','is'))) AS BIGINT) AS n_stopwords
        |  FROM w),
        |r AS (SELECT *,
        |    list_filter([
        |      CASE WHEN n_words < 15 THEN 'too_short' END,
        |      CASE WHEN n_words > 10000 THEN 'too_long' END,
        |      CASE WHEN n_word_chars < n_words * 3 OR n_word_chars > n_words * 10 THEN 'word_len' END,
        |      CASE WHEN (n_words - n_distinct_words) * 10 > n_words * 7 THEN 'repetitive' END,
        |      CASE WHEN n_stopwords < 2 THEN 'no_stopwords' END], x -> x IS NOT NULL) AS reasons
        |  FROM m)
        |SELECT doc_id, n_words, n_distinct_words, n_word_chars, n_stopwords,
        |  len(reasons) = 0 AS pass, COALESCE(array_to_string(reasons, ','), '') AS fail_reasons
        |FROM r ORDER BY doc_id""".stripMargin,
  )
}
