package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{SearchOps, SimilarityOps, TextOps, VectorIndex}

/** Keyword + hybrid retrieval over the documents/embeddings tables —
  * the lexical half of the corpus-serving surface (the vector half is
  * the q30/q31/q53/q76/q102+/q110+ ANN family).
  *
  * Oracle-parity rules (same conventions as LlmPipeline):
  *  - tokenization is the corpus-wide normText split (lower/trim/\s+);
  *  - BM25 per-term contributions quantize to floor(x·1e6) longs and
  *    sum as integers, so scores never depend on aggregation order; the
  *    one double expression per term mirrors the oracle SQL tree node
  *    for node (only ln() differs per-ulp across libms — a 1-ulp
  *    divergence flips floor(·1e6) only within ~1e-15 of a boundary);
  *  - RRF fuses pure integer ranks with integer division — no floats;
  *  - the brute cosine side follows q30's convention (double cosine,
  *    rank-only output).
  */
object Retrieval {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Query workload: every 50th doc, distinct terms of its first 8 tokens. */
  private def qs(s: SparkSession, dir: String): DataFrame =
    SearchOps.derivedQueries(t(s, dir, "documents"), "text", "doc_id",
      everyNth = 50, prefixTokens = 8)

  /** Composite chunk key doc_id·1e5 + chunk_id, GUARDED: the bound
    * chunk_id < 1e5 (docs up to ~2.4M tokens at window 32 / stride 24)
    * was previously a comment — an oversized doc would have collided
    * keys across documents and quietly corrupted BM25 rankings. Now a
    * violated bound fails the job loudly via raise_error instead
    * (round-17 ADVICE); at larger scales the key becomes a struct and
    * nothing else changes.
    */
  private[queries] def chunkKey(docId: org.apache.spark.sql.Column,
                                chunkId: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    when(chunkId < 100000L, docId.cast("long") * 100000L + chunkId)
      .otherwise(raise_error(concat(
        lit("chunk key overflow: chunk_id "), chunkId.cast("string"),
        lit(" >= 100000 for doc_id "), docId.cast("string"),
        lit(" — composite long key would collide across documents"))))

  /** Vector-leg query ids ride above the chunk-key space (max chunk key
    * ≈ max_doc_id·1e5 ≪ 1e12): VectorIndex.query excludes
    * query_id = neighbor_id and re-ranks both sides from ONE raw-vector
    * relation, so doc 0's query id colliding with chunk key 0 would
    * both drop a legitimate neighbor and fan out the exact-re-rank
    * join. The offset is subtracted before fusion.
    */
  private val QueryVidOffset = 1000000000000L

  /** (chunk_key, chunk_text) over the documents table — q147's chunking
    * with the guarded composite key.
    */
  private def chunked(s: SparkSession, dir: String): DataFrame =
    TextOps.chunkWindows(t(s, dir, "documents"), "text", "doc_id",
        window = 32, overlap = 8)
      .select(chunkKey(col("doc_id"), col("chunk_id")).as("chunk_key"),
        col("chunk_text"))

  /** Stub-embedded chunk vectors with their coarse cell label
    * (chunk_key mod 8 — a deterministic partitioner stand-in, the same
    * role the embeddings table's `label` column plays for q110).
    */
  private def chunkVectors(s: SparkSession, dir: String): DataFrame =
    chunked(s, dir).select(col("chunk_key").as("vid"),
      TextOps.embedStub(col("chunk_text"), dim = 64).as("embedding"),
      pmod(col("chunk_key"), lit(8L)).as("label"))

  /** Vector-leg queries: the SAME workload docs as [[qs]] (every 50th,
    * non-blank) but embedded as text — the first-8-token prefix string
    * through the stub encoder, ids offset by [[QueryVidOffset]]. Built
    * on [[SearchOps.tokenized]] so the tokenization/selection stays ONE
    * source of truth with the BM25 leg's derivedQueries (a tokenizer
    * tweak there must move both legs and the oracle's single qsel CTE
    * together, never desynchronize them).
    */
  private def chunkQueryVectors(s: SparkSession, dir: String): DataFrame =
    SearchOps.tokenized(
        t(s, dir, "documents").filter(col("doc_id") % 50 === 0),
        "text", "doc_id")
      .select((col("doc_id") + QueryVidOffset).as("vid"),
        TextOps.embedStub(array_join(slice(col("ws"), 1, 8), " "), dim = 64)
          .as("embedding"))

  /** Build-once cache of the versioned IVF-PQ index over the STUB-
    * EMBEDDED CHUNKS — q110's persisted path applied at chunk grain
    * (the vector half of the RAG serving stack; q148's BM25 leg is the
    * lexical half). Keyed on the documents fingerprint: chunks and
    * their stub vectors are pure functions of the text.
    *
    * The raw chunk vectors persist NEXT TO the index (`rawvecs/`): the
    * exact re-rank needs them, and at corpus scale re-deriving them
    * per query batch means re-chunking and re-encoding the whole
    * corpus per batch — a linear map, but one a production store pays
    * ONCE at build time instead (a real encoder makes the difference
    * decisive: build-once vs re-embed-per-query). rawvecs/ is
    * PARTITIONED BY the coarse cell (round-18 verdict #3): the exact
    * re-rank fetches |Q|·shortlist rows, and unpartitioned that fetch
    * planned a full corpus-sized scan per query batch — cell
    * partitioning lets the probed-cell set prune the raw read exactly
    * as it prunes the codes scan (VectorIndex.query's neighborVectors
    * path; PlanAuditSpec pins the partition filter on the scan).
    */
  private def ensureChunkVectorIndex(s: SparkSession, dir: String): String = {
    val stamp = Integer.toHexString(dir.hashCode) + "_" + graft.io.Fingerprint
      .ofTree(s"${dir.stripSuffix("/")}/documents.parquet")
    val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_q150_cvindex_" + stamp)
    val present = cachedIndexPresent(root.getPath)(
      VectorIndex.currentVersion(root.getPath).isDefined &&
        graft.io.IndexMeta.exists(s"${root.getPath}/rawvecs/_SUCCESS") &&
        // a pre-round-19 cache holds UNPARTITIONED rawvecs — rebuild
        graft.io.IndexMeta.listChildNames(s"${root.getPath}/rawvecs")
          .exists(_.startsWith("cell=")))
    if (!present) {
      graft.io.IndexMeta.deleteTree(root.getPath) // stale layout or absent
      val cv = chunkVectors(s, dir)
      val (model, codes) = VectorIndex.build(cv,
        "vid", "embedding", "label", dim = 64, m = 4, k = 16)
      VectorIndex.writeVersion(model, codes, root.getPath, 1)
      cv.select(col("vid"), col("embedding"), col("label").cast("long").as("cell"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("cell")
        .parquet(s"${root.getPath}/rawvecs")
      VectorIndex.swapPointer(root.getPath, 1)
    }
    root.getPath
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BM25 top-5 per derived query: broadcast query terms prune the
    // postings before df/scoring; integer score; bounded top-k.
    "q118_bm25_topk" -> ((s, dir) => {
      SearchOps.bm25TopK(t(s, dir, "documents"), "text", "doc_id",
          qs(s, dir), topK = 5)
        .orderBy("query_id", "rank")
    }),

    // Passage retrieval: q118's BM25 served over CHUNKS instead of
    // whole documents — the RAG/serving shape (rank the best 32-token
    // window, not the best document; df/avgdl/n_docs all become
    // chunk-level). Chunk key = doc_id·1e5 + chunk_id via the GUARDED
    // chunkKey helper (violated bound raises, never collides). The
    // oracle re-derives the chunking AND the chunk-level BM25 model.
    "q148_bm25_chunks" -> ((s, dir) => {
      SearchOps.bm25TopK(chunked(s, dir), "chunk_text", "chunk_key",
          qs(s, dir), topK = 5)
        .orderBy("query_id", "rank")
    }),

    // The full chunk-level RAG stack (round-17 verdict #3): q148's
    // lexical leg (BM25 over chunks, fusion depth 10) fused by RRF
    // with a vector leg that serves stub-embedded chunks from the
    // PERSISTED IVF-PQ index (q110's build-once/pointer-swapped path
    // at chunk grain — probes prune whole cell directories, ADC over
    // the shortlist, exact re-rank top-3). Queries embed the same
    // first-8-token prefix the BM25 workload derives from, so both
    // legs answer one workload and rrfFuse only sees (query_id,
    // chunk_key, rank) — the q125 argument at chunk grain. The oracle
    // recomposes chunking (q147), the stub encoder, the IVF-PQ
    // derivation (q109), BM25-over-chunks (q148), and the RRF tail
    // (q125) in pure SQL.
    "q150_hybrid_chunks_indexed" -> ((s, dir) => {
      val kw = SearchOps.bm25TopK(chunked(s, dir), "chunk_text", "chunk_key",
          qs(s, dir), topK = 10)
        .select("query_id", "doc_id", "rank")
      val vRoot = ensureChunkVectorIndex(s, dir)
      val qv = chunkQueryVectors(s, dir)
      // the re-rank reads the PERSISTED chunk vectors (written at index
      // build), not a re-chunk+re-encode of the corpus per query batch;
      // the store is cell-partitioned and the neighborVectors path
      // prunes it to the probed cells (query ids ride above the chunk
      // key space, so qv alone resolves the query side exactly as the
      // old unioned relation did — neighbor ids never matched qv rows)
      val raw = s.read.parquet(s"$vRoot/rawvecs")
      val vr = VectorIndex.query(qv, "vid", "embedding",
          VectorIndex.readCurrentModel(s, vRoot, dim = 64, m = 4, k = 16),
          VectorIndex.readCurrentCodes(s, vRoot), rawVectors = qv,
          neighborVectors = Some(raw),
          nprobe = 2, shortlist = 10, topK = 3)
        .select((col("query_id") - QueryVidOffset).as("query_id"),
          col("neighbor_id").as("doc_id"), col("rank"))
      SearchOps.rrfFuse(Seq(kw, vr), topK = 5)
        .orderBy("query_id", "rank")
    }),

    // Passage-level SemDeDup: q136's trained-cell cosine dedup run at
    // CHUNK grain over the stub-embedded chunks — the curation rung
    // between document dedup and the chunk-level serving stack (near-
    // duplicate passages inside and across documents collapse before
    // indexing/training; the synthetic corpus's near-dup documents
    // yield chunk twins, so both verdicts fire organically). Same
    // integer-quantized cosine convention throughout; k=16 bounds the
    // trained cells at chunk cardinality. The oracle composes the
    // q147 chunk derivation + the stub encoder with q136's full
    // k-means-unroll + same-cell pair SQL.
    "q151_semantic_dedup_chunks" -> ((s, dir) => {
      val cv = chunked(s, dir).select(col("chunk_key").as("vid"),
        TextOps.embedStub(col("chunk_text"), dim = 64).as("vd"))
      // cacheQuantized: the chunk+encode upstream is the expensive part
      // here — quantize once instead of once per training pass (r19)
      SimilarityOps.semanticDedup(cv, "vid", "vd",
          k = 16, maxIter = 2, t2 = 0.81, cacheQuantized = true)
        .orderBy("vid")
    }),

    // q151 at the operator's own documented production stance
    // (round-18 verdict #4): k ≈ √n keeps the expected cell at √n
    // vectors, so the same-cell pair mass is ~n^1.5 instead of n²/16 —
    // at sf0.1 that is ~1.3M dot products vs q151's ~9M. q151 stays
    // as-is (k=16 keeps its Lloyd unroll tractable for hand-audit);
    // THIS query hash-gates the configuration a deployment would run.
    // k derives from the data in both engines identically: the count
    // is exact and ceil(sqrt(·)) is IEEE-correct on both, so the seed
    // set (the k smallest chunk keys) and every downstream verdict are
    // bit-reproducible.
    "q152_semantic_dedup_chunks_sqrtk" -> ((s, dir) => {
      val n = chunked(s, dir).count()
      val k = math.ceil(math.sqrt(n.toDouble)).toInt
      val cv = chunked(s, dir).select(col("chunk_key").as("vid"),
        TextOps.embedStub(col("chunk_text"), dim = 64).as("vd"))
      SimilarityOps.semanticDedup(cv, "vid", "vd",
          k = k, maxIter = 2, t2 = 0.81, cacheQuantized = true)
        .orderBy("vid")
    }),

    // Chunk-grain STREAMING semantic intake (round-18 verdict #6) —
    // the intake half of the RAG stack q150 serves: live documents
    // chunk (q147) + stub-embed INSIDE the streaming pipeline and
    // dedupe at passage grain against the persisted semantic index
    // (q146's exactly-once dance — two real triggers with a
    // foldIngestAndSwap between them, so batch 2 judges through the
    // swapped version and against batch 1's KEPT chunks). The corpus
    // is every organic chunk; batch 1 streams the %5 docs with their
    // token order REVERSED (same tokens, different windows — mostly
    // novel chunks, short docs collapse to their originals), batch 2
    // streams the %7=3 docs VERBATIM (every chunk an exact clone →
    // dup_of the corpus twin). Doc ids offset +1e6/+2e6 so chunk keys
    // ride above the corpus key space. The oracle recomposes the
    // chunk+encoder derivation for all three doc sets and replays the
    // two-batch sequential judge (the q146 SQL pattern at chunk grain).
    "q153_semantic_intake_chunks" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val docs = t(s, dir, "documents")
      val corpus = chunked(s, dir).select(col("chunk_key").as("vid"),
        TextOps.embedStub(col("chunk_text"), dim = 64).as("vd"))
      // token-level reversal over the family's ONE tokenizer, rejoined
      // — chunkWindows re-normalizes the rejoined string (idempotent),
      // so engine and oracle window the identical reversed token list
      val b1 = SearchOps.tokenized(docs.filter(col("doc_id") % 5 === 0),
          "text", "doc_id")
        .select((col("doc_id") + 1000000L).as("doc_id"),
          array_join(reverse(col("ws")), " ").as("text"))
      val b2 = docs.filter(col("doc_id") % 7 === 3)
        .select((col("doc_id").cast("long") + 2000000L).as("doc_id"),
          col("text"))
      def fresh(name: String): java.io.File = {
        val f = new java.io.File(sys.props("java.io.tmpdir"),
          s"${name}_${Integer.toHexString(dir.hashCode)}")
        org.apache.commons.io.FileUtils.deleteQuietly(f); f
      }
      val root = fresh("graft_q153_semidx").getPath
      val target = fresh("graft_q153_sink").getPath
      val ckpt = fresh("graft_q153_ckpt").getPath
      // cacheQuantized: the corpus is a chunk+encode derivation — one
      // quantized materialization feeds all training passes (r19)
      graft.operators.SemanticIndex.buildAndServe(corpus, "vid", "vd",
        k = 8, maxIter = 2, root, cacheQuantized = true)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      // the streaming transform IS the chunk+embed front end: a
      // stateless projection+explode, so the sink's per-trigger cost
      // stays batch-proportional end to end
      val chunkStream = TextOps.chunkWindows(
          input.toDF().toDF("doc_id", "text"), "text", "doc_id",
          window = 32, overlap = 8)
        .select(chunkKey(col("doc_id"), col("chunk_id")).as("vid"),
          TextOps.embedStub(col("chunk_text"), dim = 64).as("vd"))
      val q = graft.streaming.StreamOps.semanticIntakeSink(
          chunkStream, "vid", "vd", root, target, t2 = 0.81)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("0 seconds"))
        .option("checkpointLocation", ckpt)
        .start()
      def feed(df: DataFrame): Unit = {
        input.addData(df.select(col("doc_id"), col("text"))
          .as[(Long, String)].collect().toSeq: _*)
        q.processAllAvailable()
      }
      try {
        feed(b1)
        graft.operators.SemanticIndex.foldIngestAndSwap(s, root)
        feed(b2)
      } finally q.stop()
      s.read.parquet(target)
        .select(col("vid").cast("long").as("vid"),
          col("cell").cast("long").as("cell"),
          col("dup_of").cast("long").as("dup_of"), col("kept"))
        .orderBy("vid")
    }),

    // Hybrid retrieval: BM25 top-10 (self excluded) fused with brute
    // cosine top-10 over the aligned embeddings by reciprocal-rank
    // fusion (k=60) — integer fused scores, top-5 per query. At scale
    // the vector leg swaps to the persisted IVF-PQ index (q110 family)
    // with the fusion unchanged — rrfFuse only sees (query, doc, rank).
    "q119_hybrid_rrf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val kw = SearchOps.bm25TopK(docs, "text", "doc_id", qs(s, dir),
        topK = 10, excludeSelf = true)
      val vq = emb.filter(col("vec_id") % 50 === 0)
      val vr = SearchOps.cosineTopKFor(vq, emb, "vec_id", "embedding", topK = 10)
      SearchOps.rrfFuse(
          Seq(kw.select("query_id", "doc_id", "rank"), vr), topK = 5)
        .orderBy("query_id", "rank")
    }),

    // The PREPARED serving path: postings built ONCE per sf dir as a
    // versioned pointer-swapped index (the q110 treatment applied to
    // lexical retrieval), then q118's exact query answered from the
    // index — q118's oracle verbatim proves build→serve loses nothing.
    // Serving never shuffles the index side (PlanAuditSpec pins it;
    // SearchOpsSpec walks the physical plan).
    "q120_bm25_topk_prepared" -> ((s, dir) => {
      val root = ensurePostingsIndex(s, dir)
      SearchOps.bm25TopKIndexed(s, root, qs(s, dir), topK = 5)
        .orderBy("query_id", "rank")
    }),

    // The append lifecycle (the q111 pattern applied to BM25): build the
    // index on the FIRST HALF of the corpus, append the second half as a
    // tagged batch — only the delta segment and the re-merged
    // vocabulary-sized termstats are written; prior postings carry by
    // reference — then serve. A REPLAYED append (same tag) must no-op,
    // so the query appends twice and still answers q118's oracle
    // verbatim: a double-count would inflate df/n_docs and shift every
    // idf. Fresh work dir per run (append is cumulative across roots).
    "q121_bm25_index_appended" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cutoff = docs.agg(max(col("doc_id").cast("long"))).head().getLong(0) / 2
      val root = java.nio.file.Files.createTempDirectory("graft_q121_bm25_").toFile
      org.apache.commons.io.FileUtils.forceDeleteOnExit(root)
      SearchOps.buildPostingsIndex(docs.filter(col("doc_id") <= cutoff),
        "text", "doc_id", root.getPath)
      val rest = docs.filter(col("doc_id") > cutoff)
      val v2 = SearchOps.appendPostingsIndex(rest, "text", "doc_id",
        root.getPath, batchTag = "q121-b1")
      require(v2.nonEmpty, "first append must apply")
      val replay = SearchOps.appendPostingsIndex(rest, "text", "doc_id",
        root.getPath, batchTag = "q121-b1")
      require(replay.isEmpty, "replayed append must no-op")
      SearchOps.bm25TopKIndexed(s, root.getPath, qs(s, dir), topK = 5)
        .orderBy("query_id", "rank")
    }),

    // Streaming ingest (the q115 pattern applied to BM25): build on the
    // first half, stream the second half through the index sink in
    // three real triggers — each lands as one pointer-swapped version —
    // then serve. Appends commute (segment union + integer stat sums),
    // so the multi-trigger end state answers q118's oracle verbatim.
    "q122_bm25_stream_ingest" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val docs = t(s, dir, "documents")
      val cutoff = docs.agg(max(col("doc_id").cast("long"))).head().getLong(0) / 2
      val root = java.nio.file.Files.createTempDirectory("graft_q122_bm25_").toFile
      org.apache.commons.io.FileUtils.forceDeleteOnExit(root)
      val ckpt = java.nio.file.Files.createTempDirectory("graft_q122_ckpt_").toFile
      org.apache.commons.io.FileUtils.forceDeleteOnExit(ckpt)
      SearchOps.buildPostingsIndex(docs.filter(col("doc_id") <= cutoff),
        "text", "doc_id", root.getPath)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val q = graft.streaming.StreamOps.postingsIngestSink(
          input.toDF().toDF("doc_id", "text"), "text", "doc_id", root.getPath)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("0 seconds"))
        .option("checkpointLocation", ckpt.getPath)
        .start()
      val rest = docs.filter(col("doc_id") > cutoff)
      try (0 until 3).foreach { r =>
        input.addData(rest.filter(col("doc_id") % 3 === r)
          .select(col("doc_id").cast("long"), col("text"))
          .as[(Long, String)].collect().toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      SearchOps.bm25TopKIndexed(s, root.getPath, qs(s, dir), topK = 5)
        .orderBy("query_id", "rank")
    }),

    // Fold compaction: q122's per-trigger segments consolidate into ONE
    // segment in the next version (verbatim row copy, no re-tokenize,
    // stats untouched) and the query serves through the swapped
    // version — still q118's oracle verbatim.
    "q123_bm25_stream_ingest_folded" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cutoff = docs.agg(max(col("doc_id").cast("long"))).head().getLong(0) / 2
      val root = java.nio.file.Files.createTempDirectory("graft_q123_bm25_").toFile
      org.apache.commons.io.FileUtils.forceDeleteOnExit(root)
      SearchOps.buildPostingsIndex(docs.filter(col("doc_id") <= cutoff),
        "text", "doc_id", root.getPath)
      (0 until 3).foreach { r =>
        SearchOps.appendPostingsIndex(
          docs.filter(col("doc_id") > cutoff && col("doc_id") % 3 === r),
          "text", "doc_id", root.getPath, batchTag = s"q123-b$r")
      }
      val folded = SearchOps.foldPostingsIndex(s, root.getPath)
      require(SearchOps.postingsCurrentVersion(root.getPath).contains(folded))
      SearchOps.bm25TopKIndexed(s, root.getPath, qs(s, dir), topK = 5)
        .orderBy("query_id", "rank")
    }),

    // Tombstoned deletes (the q114 convention: ids % 7 == 0 go): the
    // delete adjusts n_docs / total_len / per-term df NOW and serving
    // anti-joins the ledger, so the oracle is BM25 over the surviving
    // corpus exactly — deleted docs neither surface nor distort any
    // surviving doc's idf. A REPLAYED delete must not double-subtract,
    // so the query deletes twice; a fold then drops the rows for real
    // and the answer must not move.
    "q124_bm25_index_deleted" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = java.nio.file.Files.createTempDirectory("graft_q124_bm25_").toFile
      org.apache.commons.io.FileUtils.forceDeleteOnExit(root)
      SearchOps.buildPostingsIndex(docs, "text", "doc_id", root.getPath)
      val dead = docs.filter(col("doc_id") % 7 === 0).select(col("doc_id"))
      SearchOps.deleteFromPostingsIndex(s, root.getPath, dead)
      SearchOps.deleteFromPostingsIndex(s, root.getPath, dead) // replay: no-op
      val preFold = SearchOps.bm25TopKIndexed(s, root.getPath, qs(s, dir), topK = 5)
        .orderBy("query_id", "rank").collect().toSeq
      SearchOps.foldPostingsIndex(s, root.getPath)
      val out = SearchOps.bm25TopKIndexed(s, root.getPath, qs(s, dir), topK = 5)
        .orderBy("query_id", "rank")
      require(out.collect().toSeq == preFold,
        "fold moved the post-delete answer")
      out
    }),

    // Hybrid retrieval over BOTH persisted indexes — the production
    // shape of q119: the lexical leg serves from the pointer-resolved
    // postings index (q120's path) and the vector leg from the
    // pointer-resolved IVF-PQ index (the q110 family, versioned +
    // swapped), fused by the unchanged rrfFuse — fusion only ever sees
    // (query_id, doc_id, rank), which is what lets both legs swap from
    // oracles to indexes with the oracle SQL composed from the SAME two
    // per-leg derivations. The vector queries are filtered BEFORE the
    // probe (per-query independence makes that exact), so the leg costs
    // |Q|·probed-cells, not corpus².
    "q125_hybrid_indexed" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val kwRoot = ensurePostingsIndex(s, dir)
      val kw = SearchOps.bm25TopKIndexed(s, kwRoot, qs(s, dir),
          topK = 10, excludeSelf = true)
        .select("query_id", "doc_id", "rank")
      val vRoot = ensureVectorIndexVersioned(s, dir)
      val vr = VectorIndex.query(emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding",
          VectorIndex.readCurrentModel(s, vRoot, dim = 64, m = 4, k = 16),
          VectorIndex.readCurrentCodes(s, vRoot), rawVectors = emb,
          nprobe = 2, shortlist = 10, topK = 3)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      SearchOps.rrfFuse(Seq(kw, vr), topK = 5)
        .orderBy("query_id", "rank")
    }),

    // The re-add lifecycle closing the delete story: a tombstoned doc
    // may NOT be appended while its old rows still exist in referenced
    // segments (the engine refuses loudly — counting it would inflate
    // n_docs/df while serving anti-joins it out, a phantom skewing
    // every surviving idf); after a fold physically drops the rows and
    // clears the ledger, the re-add is legal and delete → fold → append
    // converges on exactly a fresh full build — q118's oracle verbatim.
    "q126_bm25_index_readded" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = java.nio.file.Files.createTempDirectory("graft_q126_bm25_").toFile
      org.apache.commons.io.FileUtils.forceDeleteOnExit(root)
      SearchOps.buildPostingsIndex(docs, "text", "doc_id", root.getPath)
      val dead = docs.filter(col("doc_id") % 7 === 0)
      SearchOps.deleteFromPostingsIndex(s, root.getPath, dead.select(col("doc_id")))
      val early = scala.util.Try(SearchOps.appendPostingsIndex(
        dead, "text", "doc_id", root.getPath, batchTag = "readd-early"))
      require(early.isFailure, "re-add before a fold must be refused loudly")
      SearchOps.foldPostingsIndex(s, root.getPath)
      require(SearchOps.appendPostingsIndex(dead, "text", "doc_id",
        root.getPath, batchTag = "readd").nonEmpty, "post-fold re-add must apply")
      SearchOps.bm25TopKIndexed(s, root.getPath, qs(s, dir), topK = 5)
        .orderBy("query_id", "rank")
    }),

    // The stop-word skew guard at the oracle tier: q118 with a df cap —
    // query terms matching more than 78% of the corpus are dropped from
    // scoring (their idf is near zero; their candidate mass is
    // corpus-sized — the same planted-skew rationale as q82's bucket
    // cap). 0.78 splits the synthetic corpus's deliberately narrow
    // vocabulary (query-term df runs 0.74-0.83 across SFs), so the cap
    // DROPS some terms and KEEPS some at every SF — a threshold no term
    // crosses would test nothing. The oracle applies the identical
    // df <= n_docs * 0.78 predicate, so the recall trade is
    // hash-pinned, not hand-waved.
    "q127_bm25_topk_capped" -> ((s, dir) => {
      SearchOps.bm25TopK(t(s, dir, "documents"), "text", "doc_id",
          qs(s, dir), topK = 5, maxDfFrac = Some(0.78))
        .orderBy("query_id", "rank")
    }),

    // Retention GC under the hash gate: the q123 lifecycle (build, 3
    // tagged appends, fold) plus prunePostingsVersions — the fold's
    // consolidated version makes every predecessor unreachable, the
    // prune deletes them all, and serving through what remains is
    // STILL q118's oracle verbatim. The pre-fold prune must be a no-op
    // (the served manifest references segments in every older dir),
    // so both halves of the reference-closure contract are pinned.
    "q128_bm25_index_pruned" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cutoff = docs.agg(max(col("doc_id").cast("long"))).head().getLong(0) / 2
      val root = java.nio.file.Files.createTempDirectory("graft_q128_bm25_").toFile
      org.apache.commons.io.FileUtils.forceDeleteOnExit(root)
      SearchOps.buildPostingsIndex(docs.filter(col("doc_id") <= cutoff),
        "text", "doc_id", root.getPath)
      (0 until 3).foreach { r =>
        SearchOps.appendPostingsIndex(
          docs.filter(col("doc_id") > cutoff && col("doc_id") % 3 === r),
          "text", "doc_id", root.getPath, batchTag = s"q128-b$r")
      }
      require(SearchOps.prunePostingsVersions(s, root.getPath).isEmpty,
        "pre-fold prune must keep every referenced segment dir")
      SearchOps.foldPostingsIndex(s, root.getPath)
      val pruned = SearchOps.prunePostingsVersions(s, root.getPath)
      require(pruned == Seq(1, 2, 3, 4), s"prune collected $pruned")
      require(!graft.io.IndexMeta.exists(
        SearchOps.postingsVersionDir(root.getPath, 1)), "pruned dir survived")
      SearchOps.bm25TopKIndexed(s, root.getPath, qs(s, dir), topK = 5)
        .orderBy("query_id", "rank")
    }),

    // q128's END STATE served without re-running the lifecycle: the
    // pruned postings index (half-build + 3 tagged appends + fold +
    // reference-closure prune) is built ONCE per (sf, fingerprint) and
    // cached; every later call only resolves and serves — the round-14
    // verdict's bench-hygiene split. q128 keeps pricing the full
    // lifecycle per rep; THIS entry is the serve-shape drift sentinel,
    // so a flag on it means the serving plan regressed, not that a
    // build/fold/prune got slower. Answer is q118's oracle verbatim
    // (the same convergence argument as q128).
    "q134_bm25_pruned_serve" -> ((s, dir) => {
      SearchOps.bm25TopKIndexed(s, ensurePrunedPostingsIndex(s, dir),
          qs(s, dir), topK = 5)
        .orderBy("query_id", "rank")
    }))

  /** Build the postings index once per (sf dir + data fingerprint);
    * later calls — even from a fresh JVM — only resolve the pointer and
    * read (the ensureQ110Index pattern: the first bench rep pays the
    * build, steady-state reps measure serving). The CACHE root lives
    * under the driver's java.io.tmpdir by design (a per-host build-once
    * cache); the SOURCE fingerprint resolves through the corpus dir's
    * own scheme, so an s3a:// corpus stamps its real listing.
    */
  /** Cache-probe wrapper: a root whose POINTER is corrupt (a torn
    * write IndexMeta refuses — stable pre-terminator values now heal
    * in place before reaching here) is a stale CACHE entry, not an
    * error: discard it and report a miss, so the caller rebuilds
    * instead of failing every query that serves through the cached
    * index.
    */
  private def cachedIndexPresent(root: String)(probe: => Boolean): Boolean =
    try probe
    catch {
      case _: IllegalStateException =>
        graft.io.IndexMeta.deleteTree(root); false
    }

  /** Build-once cache of the PRUNED postings lifecycle end state (the
    * q128 shape) for the q134 serve-only headliner.
    */
  private def ensurePrunedPostingsIndex(s: SparkSession, dir: String): String = {
    val stamp = Integer.toHexString(dir.hashCode) + "_" + graft.io.Fingerprint
      .ofTree(s"${dir.stripSuffix("/")}/documents.parquet")
    val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_q134_bm25p_" + stamp)
    if (!cachedIndexPresent(root.getPath)(SearchOps.postingsIndexExists(root.getPath))) {
      val docs = Tables.load(s, dir, "documents")
      val cutoff = docs.agg(max(col("doc_id").cast("long"))).head().getLong(0) / 2
      SearchOps.buildPostingsIndex(docs.filter(col("doc_id") <= cutoff),
        "text", "doc_id", root.getPath)
      (0 until 3).foreach { r =>
        SearchOps.appendPostingsIndex(
          docs.filter(col("doc_id") > cutoff && col("doc_id") % 3 === r),
          "text", "doc_id", root.getPath, batchTag = s"q134-b$r")
      }
      SearchOps.foldPostingsIndex(s, root.getPath)
      SearchOps.prunePostingsVersions(s, root.getPath)
    }
    root.getPath
  }

  private def ensurePostingsIndex(s: SparkSession, dir: String): String = {
    val stamp = Integer.toHexString(dir.hashCode) + "_" + graft.io.Fingerprint
      .ofTree(s"${dir.stripSuffix("/")}/documents.parquet")
    val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_q120_bm25_" + stamp)
    if (!cachedIndexPresent(root.getPath)(SearchOps.postingsIndexExists(root.getPath)))
      SearchOps.buildPostingsIndex(Tables.load(s, dir, "documents"),
        "text", "doc_id", root.getPath)
    root.getPath
  }

  /** Build-once cache of the VERSIONED (pointer-swapped) ANN index for
    * q125's vector leg — same model params as the q110 family, but
    * through the retrain-ready versions/POINTER layout so the hybrid
    * query's BOTH legs resolve a pointer at plan time.
    */
  private def ensureVectorIndexVersioned(s: SparkSession, dir: String): String = {
    val stamp = Integer.toHexString(dir.hashCode) + "_" + graft.io.Fingerprint
      .ofTree(s"${dir.stripSuffix("/")}/embeddings.parquet")
    val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_q125_vindex_" + stamp)
    if (!cachedIndexPresent(root.getPath)(
        VectorIndex.currentVersion(root.getPath).isDefined)) {
      val (model, codes) = VectorIndex.build(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", "label", dim = 64, m = 4, k = 16)
      VectorIndex.writeVersion(model, codes, root.getPath, 1)
      VectorIndex.swapPointer(root.getPath, 1)
    }
    root.getPath
  }

  // Shared SQL fragments: tokenized docs + postings + derived queries +
  // BM25 contributions — the contribution FLOOR tree mirrors
  // SearchOps.bm25TopK's Column tree exactly (see scaladoc there).
  // Queries always derive from the FULL corpus (dq); the scored corpus
  // (d) takes a filter so the delete lifecycle can model its survivors.
  private def bm25CteWhere(corpusFilter: String, dftCond: String = "TRUE") =
    s"""w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    list_filter(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '), x -> x <> '') AS ws
      |  FROM documents),
      |dq AS (SELECT doc_id, ws FROM w WHERE len(ws) >= 1),
      |d AS (SELECT doc_id, ws, CAST(len(ws) AS DOUBLE) AS dl FROM w
      |  WHERE len(ws) >= 1 AND ($corpusFilter)),
      |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, SUM(dl) AS total_len FROM d),
      |post AS (SELECT term, doc_id, CAST(COUNT(*) AS DOUBLE) AS tf
      |  FROM (SELECT doc_id, unnest(ws) AS term FROM d) GROUP BY term, doc_id),
      |qt AS (SELECT doc_id AS query_id, unnest(list_distinct(ws[1:8])) AS term
      |  FROM dq WHERE doc_id % 50 = 0),
      |dft0 AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM post
      |  WHERE term IN (SELECT term FROM qt) GROUP BY term),
      |dft AS (SELECT term, df FROM dft0 CROSS JOIN stats WHERE $dftCond),
      |contrib AS (SELECT q.query_id, p.doc_id,
      |    CAST(FLOOR((ln((((s.n_docs - f.df) + 0.5) / (f.df + 0.5)) + 1.0)
      |      * ((p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * ((dd.dl * s.n_docs) / s.total_len)))))
      |      * 1000000.0) AS BIGINT) AS c
      |  FROM qt q
      |  JOIN post p ON p.term = q.term
      |  JOIN dft f ON f.term = p.term
      |  JOIN d dd ON dd.doc_id = p.doc_id
      |  CROSS JOIN stats s),
      |sc AS (SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS score
      |  FROM contrib GROUP BY query_id, doc_id)""".stripMargin

  private val bm25Cte = bm25CteWhere("TRUE")

  private val bm25TopSql =
    s"""WITH $bm25Cte,
       |r AS (SELECT query_id, doc_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rnk
       |  FROM sc)
       |SELECT query_id, doc_id, score, CAST(rnk AS BIGINT) AS rank
       |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin

  def oracles: Map[String, String] = Map(

    "q118_bm25_topk" -> bm25TopSql,

    // q118's BM25 math over the q147 chunking: corpus-side CTEs derive
    // chunks (df/avgdl/n_docs become chunk-level), queries stay the
    // whole-document workload; chunk key = doc_id·1e5 + chunk_id
    "q148_bm25_chunks" ->
      """WITH cw AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents WHERE length(trim(text)) > 0),
        |cc AS (SELECT doc_id, ws, len(ws) AS n,
        |    UNNEST(range(GREATEST(CAST(CEIL((len(ws) - 8) / 24.0) AS BIGINT), 1))) AS chunk_id
        |  FROM cw),
        |d AS (SELECT doc_id * 100000 + chunk_id AS doc_id,
        |    ws[CAST(chunk_id * 24 + 1 AS INT):CAST(LEAST(chunk_id * 24 + 32, n) AS INT)] AS ws,
        |    CAST(LEAST(chunk_id * 24 + 32, n) - chunk_id * 24 AS DOUBLE) AS dl
        |  FROM cc),
        |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, SUM(dl) AS total_len FROM d),
        |post AS (SELECT term, doc_id, CAST(COUNT(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, unnest(ws) AS term FROM d) GROUP BY term, doc_id),
        |qw AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), x -> x <> '') AS ws
        |  FROM documents),
        |qt AS (SELECT doc_id AS query_id, unnest(list_distinct(ws[1:8])) AS term
        |  FROM qw WHERE doc_id % 50 = 0 AND len(ws) >= 1),
        |dft AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM post
        |  WHERE term IN (SELECT term FROM qt) GROUP BY term),
        |contrib AS (SELECT q.query_id, p.doc_id,
        |    CAST(FLOOR((ln((((s.n_docs - f.df) + 0.5) / (f.df + 0.5)) + 1.0)
        |      * ((p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * ((dd.dl * s.n_docs) / s.total_len)))))
        |      * 1000000.0) AS BIGINT) AS c
        |  FROM qt q
        |  JOIN post p ON p.term = q.term
        |  JOIN dft f ON f.term = p.term
        |  JOIN d dd ON dd.doc_id = p.doc_id
        |  CROSS JOIN stats s),
        |sc AS (SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS score
        |  FROM contrib GROUP BY query_id, doc_id),
        |r AS (SELECT query_id, doc_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rnk
        |  FROM sc)
        |SELECT query_id, doc_id, score, CAST(rnk AS BIGINT) AS rank
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin,

    "q119_hybrid_rrf" ->
      s"""WITH $bm25Cte,
         |ktop AS (SELECT query_id, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
         |  FROM sc WHERE doc_id <> query_id QUALIFY rank <= 10),
         |v AS (SELECT CAST(vec_id AS BIGINT) AS vid, CAST(embedding AS DOUBLE[]) AS vd FROM embeddings),
         |vtop AS (SELECT query_id, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
         |  FROM (SELECT q.vid AS query_id, c.vid AS doc_id,
         |      list_cosine_similarity(q.vd, c.vd) AS score
         |    FROM v q JOIN v c ON q.vid % 50 = 0 AND q.vid <> c.vid)
         |  QUALIFY rank <= 10),
         |allr AS (SELECT query_id, doc_id, 1000000 // (60 + rank) AS c FROM ktop
         |  UNION ALL SELECT query_id, doc_id, 1000000 // (60 + rank) FROM vtop),
         |f AS (SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS fused
         |  FROM allr GROUP BY query_id, doc_id),
         |fr AS (SELECT query_id, doc_id, fused,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY fused DESC, doc_id ASC) AS rnk
         |  FROM f)
         |SELECT query_id, doc_id, fused, CAST(rnk AS BIGINT) AS rank
         |FROM fr WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin,

    // the prepared path serves q118's exact semantics from the index
    "q120_bm25_topk_prepared" -> bm25TopSql,

    // build-half + append-half + replayed-append converges on the same
    // index a full build produces, so the answer is q118's oracle
    // verbatim (a replay double-count would shift every idf and fail)
    "q121_bm25_index_appended" -> bm25TopSql,

    // appends commute (segment union + integer stat sums), so the
    // 3-trigger streamed end state is q118's oracle verbatim
    "q122_bm25_stream_ingest" -> bm25TopSql,

    // fold copies rows verbatim and never touches stats — q118's
    // oracle verbatim through the swapped version
    "q123_bm25_stream_ingest_folded" -> bm25TopSql,

    // post-delete serving is BM25 over the SURVIVORS exactly: deleted
    // docs neither surface nor distort any surviving doc's idf/avgdl
    // (queries still derive from the full corpus — the workload is
    // external to the index)
    "q124_bm25_index_deleted" ->
      s"""WITH ${bm25CteWhere("doc_id % 7 <> 0")},
         |r AS (SELECT query_id, doc_id, score,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rnk
         |  FROM sc)
         |SELECT query_id, doc_id, score, CAST(rnk AS BIGINT) AS rank
         |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin,

    // both-indexes hybrid: the kw leg is q118's derivation with self
    // excluded (what the postings index serves, q120-verbatim); the
    // vector leg is q109's derivation — the persisted IVF-PQ index
    // serves IT verbatim (q110's pinned equality) — filtered to the
    // %50 query subset (exact: per-query independence), then RRF with
    // integer division, like q119.
    "q125_hybrid_indexed" ->
      s"""WITH $bm25Cte,
         |ktop AS (SELECT query_id, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
         |  FROM sc WHERE doc_id <> query_id QUALIFY rank <= 10),
         |vtop AS (SELECT query_id, neighbor_id AS doc_id, rank
         |  FROM (${graft.queries.LlmPipeline.oracles("q109_ann_topk_ivfpq_refined")})
         |  WHERE query_id % 50 = 0),
         |allr AS (SELECT query_id, doc_id, 1000000 // (60 + rank) AS c FROM ktop
         |  UNION ALL SELECT query_id, doc_id, 1000000 // (60 + rank) FROM vtop),
         |f AS (SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS fused
         |  FROM allr GROUP BY query_id, doc_id),
         |fr AS (SELECT query_id, doc_id, fused,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY fused DESC, doc_id ASC) AS rnk
         |  FROM f)
         |SELECT query_id, doc_id, fused, CAST(rnk AS BIGINT) AS rank
         |FROM fr WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin,

    // delete → fold → re-add converges on exactly a fresh full build:
    // q118's oracle verbatim (any stat drift — a double-subtract, a
    // phantom count, a lost df row — shifts every idf and fails the hash)
    "q126_bm25_index_readded" -> bm25TopSql,

    // the df cap mirrored predicate-for-predicate: terms with
    // df > n_docs * 0.78 leave scoring on both engines
    "q127_bm25_topk_capped" ->
      s"""WITH ${bm25CteWhere("TRUE", "df <= n_docs * 0.78")},
         |r AS (SELECT query_id, doc_id, score,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rnk
         |  FROM sc)
         |SELECT query_id, doc_id, score, CAST(rnk AS BIGINT) AS rank
         |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin,

    // retention GC moves no answer: fold copies rows verbatim and the
    // prune deletes only unreachable dirs — q118's oracle verbatim
    // through the GC'd index
    "q128_bm25_index_pruned" -> bm25TopSql,

    // the cached pruned lifecycle converges on the same index a full
    // build produces (q128's argument), so serve-only is q118 verbatim
    "q134_bm25_pruned_serve" -> bm25TopSql,

    // Chunk-level hybrid RAG: composed from the q147 chunk derivation
    // (cw/cc/chk), q148's chunk-grain BM25 (depth 10), the stub
    // encoder as a list comprehension (character sampling, IEEE-double
    // identical to TextOps.embedStub), q109's IVF-PQ derivation over
    // the chunk vectors (cells = chunk_key % 8, codebook from the 16
    // smallest chunk keys, nprobe 2, shortlist 10, exact re-rank top
    // 3), and q125's RRF tail. Query vector ids ride +1e12 and drop
    // the offset before fusion, mirroring the engine.
    "q150_hybrid_chunks_indexed" ->
      """WITH cw AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents WHERE length(trim(text)) > 0),
        |cc AS (SELECT doc_id, ws, len(ws) AS n,
        |    UNNEST(range(GREATEST(CAST(CEIL((len(ws) - 8) / 24.0) AS BIGINT), 1))) AS chunk_id
        |  FROM cw),
        |chk AS (SELECT doc_id * 100000 + chunk_id AS ck,
        |    ws[CAST(chunk_id * 24 + 1 AS INT):CAST(LEAST(chunk_id * 24 + 32, n) AS INT)] AS cws,
        |    CAST(LEAST(chunk_id * 24 + 32, n) - chunk_id * 24 AS DOUBLE) AS dl
        |  FROM cc),
        |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, SUM(dl) AS total_len FROM chk),
        |post AS (SELECT term, ck, CAST(COUNT(*) AS DOUBLE) AS tf
        |  FROM (SELECT ck, unnest(cws) AS term FROM chk) GROUP BY term, ck),
        |qw AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), x -> x <> '') AS ws
        |  FROM documents),
        |qsel AS (SELECT doc_id, ws FROM qw WHERE doc_id % 50 = 0 AND len(ws) >= 1),
        |qt AS (SELECT doc_id AS query_id, unnest(list_distinct(ws[1:8])) AS term FROM qsel),
        |dft AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM post
        |  WHERE term IN (SELECT term FROM qt) GROUP BY term),
        |contrib AS (SELECT q.query_id, p.ck,
        |    CAST(FLOOR((ln((((s.n_docs - f.df) + 0.5) / (f.df + 0.5)) + 1.0)
        |      * ((p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * ((dd.dl * s.n_docs) / s.total_len)))))
        |      * 1000000.0) AS BIGINT) AS c
        |  FROM qt q
        |  JOIN post p ON p.term = q.term
        |  JOIN dft f ON f.term = p.term
        |  JOIN chk dd ON dd.ck = p.ck
        |  CROSS JOIN stats s),
        |sc AS (SELECT query_id, ck, CAST(SUM(c) AS BIGINT) AS score
        |  FROM contrib GROUP BY query_id, ck),
        |ktop AS (SELECT query_id, ck AS doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, ck ASC) AS rank
        |  FROM sc QUALIFY rank <= 10),
        |cemb AS (SELECT ck AS vid, ck % 8 AS cell,
        |    list_transform(range(64), i -> CAST(FLOOR(((ascii(substr(ct,
        |      CAST((i * 31 + 7) % length(ct) AS INT) + 1, 1)) / 255.0) - 0.5)
        |      * 1000000.0) AS BIGINT)) AS q
        |  FROM (SELECT ck, array_to_string(cws, ' ') AS ct FROM chk)),
        |qemb AS (SELECT vid,
        |    list_transform(range(64), i -> CAST(FLOOR(((ascii(substr(qx,
        |      CAST((i * 31 + 7) % length(qx) AS INT) + 1, 1)) / 255.0) - 0.5)
        |      * 1000000.0) AS BIGINT)) AS q
        |  FROM (SELECT doc_id + 1000000000000 AS vid,
        |      array_to_string(ws[1:8], ' ') AS qx FROM qsel)),
        |ve AS (SELECT c.vid, c.cell, m.range AS mi, d.range AS d,
        |    c.q[CAST(m.range * 16 + d.range AS INT) + 1] AS x
        |  FROM cemb c CROSS JOIN range(4) m CROSS JOIN range(16) d),
        |cent AS (SELECT cell, mi, d,
        |    CASE WHEN SUM(x) >= 0 THEN SUM(x) // COUNT(*)
        |         ELSE -((-SUM(x)) // COUNT(*)) END AS c
        |  FROM ve GROUP BY 1, 2, 3),
        |vr AS (SELECT ve.vid, ve.cell, ve.mi, ve.d, ve.x - cent.c AS x
        |  FROM ve JOIN cent ON ve.cell = cent.cell AND ve.mi = cent.mi AND ve.d = cent.d),
        |sv AS (SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) - 1 AS ci
        |  FROM (SELECT vid FROM cemb ORDER BY vid LIMIT 16)),
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
        |qve AS (SELECT qe.vid, m.range AS mi, d.range AS d,
        |    qe.q[CAST(m.range * 16 + d.range AS INT) + 1] AS x
        |  FROM qemb qe CROSS JOIN range(4) m CROSS JOIN range(16) d),
        |qcd AS (SELECT qve.vid, cent.cell, SUM((qve.x - cent.c) * (qve.x - cent.c)) AS cdist
        |  FROM qve JOIN cent ON qve.mi = cent.mi AND qve.d = cent.d
        |  GROUP BY 1, 2),
        |probes AS (SELECT vid, cell FROM (
        |    SELECT vid, cell,
        |      ROW_NUMBER() OVER (PARTITION BY vid ORDER BY cdist ASC, cell ASC) AS rn
        |    FROM qcd) WHERE rn <= 2),
        |qres AS (SELECT qve.vid, p.cell, qve.mi, qve.d, qve.x - cent.c AS x
        |  FROM qve JOIN probes p ON qve.vid = p.vid
        |  JOIN cent ON cent.cell = p.cell AND cent.mi = qve.mi AND cent.d = qve.d),
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
        |exact AS (SELECT sl.query_id, sl.neighbor_id,
        |    SUM((a.x - b.x) * (a.x - b.x)) AS exact_dist
        |  FROM shortlist sl
        |  JOIN qve a ON a.vid = sl.query_id
        |  JOIN ve b ON b.vid = sl.neighbor_id AND b.mi = a.mi AND b.d = a.d
        |  GROUP BY 1, 2),
        |vtop AS (SELECT query_id - 1000000000000 AS query_id, neighbor_id AS doc_id, rank
        |  FROM (SELECT query_id, neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY exact_dist ASC, neighbor_id ASC) AS rank FROM exact)
        |  WHERE rank <= 3),
        |allr AS (SELECT query_id, doc_id, 1000000 // (60 + rank) AS c FROM ktop
        |  UNION ALL SELECT query_id, doc_id, 1000000 // (60 + rank) FROM vtop),
        |f AS (SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS fused
        |  FROM allr GROUP BY query_id, doc_id),
        |fr AS (SELECT query_id, doc_id, fused,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY fused DESC, doc_id ASC) AS rnk
        |  FROM f)
        |SELECT query_id, doc_id, fused, CAST(rnk AS BIGINT) AS rank
        |FROM fr WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin,

    // Passage-level SemDeDup: the q147 chunk derivation + the stub
    // encoder feeding q136's k-means unroll (2 Lloyd iterations,
    // integer-exact, first-16 seeds) and same-cell quantized-cosine
    // pair math, min-id-wins
    "q151_semantic_dedup_chunks" -> chunkSemDedupSql(
      "(SELECT vid FROM v ORDER BY vid LIMIT 16)"),

    // q151 with the seed count derived from the data: the first
    // ceil(sqrt(n)) chunk keys seed the Lloyd unroll — everything
    // after c0 is q151's SQL verbatim (cells key off c0 rows)
    "q152_semantic_dedup_chunks_sqrtk" -> chunkSemDedupSql(
      """(SELECT vid FROM (SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) AS rn,
        |         COUNT(*) OVER () AS nn FROM v)
        |       WHERE rn <= CAST(CEIL(SQRT(nn)) AS BIGINT))""".stripMargin),

    // Chunk-grain streaming intake: the q147 chunk derivation + stub
    // encoder for the corpus AND both streamed doc sets (b1 = %5 docs
    // token-reversed, ids +1e6; b2 = %7=3 docs verbatim, ids +2e6),
    // feeding q146's sequential two-batch replay — b1 judges against
    // corpus + lower-key b1 mates, b2 against corpus ∪ KEPT-b1 +
    // lower-key b2 mates; dup_of = least match; the mid-stream fold is
    // answer-preserving so the oracle needs no notion of versions.
    // k-means: 2 Lloyd iterations, first-8 corpus chunk keys seed.
    "q153_semantic_intake_chunks" ->
      """WITH cw AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents WHERE length(trim(text)) > 0),
        |cc AS (SELECT doc_id, ws, len(ws) AS n,
        |    UNNEST(range(GREATEST(CAST(CEIL((len(ws) - 8) / 24.0) AS BIGINT), 1))) AS chunk_id
        |  FROM cw),
        |chk AS (SELECT doc_id * 100000 + chunk_id AS ck,
        |    array_to_string(ws[CAST(chunk_id * 24 + 1 AS INT):CAST(LEAST(chunk_id * 24 + 32, n) AS INT)], ' ') AS ct
        |  FROM cc),
        |u AS (SELECT ck AS vid,
        |    list_transform(range(64), i -> (ascii(substr(ct,
        |      CAST((i * 31 + 7) % length(ct) AS INT) + 1, 1)) / 255.0) - 0.5) AS vd
        |  FROM chk),
        |cw1 AS (SELECT doc_id + 1000000 AS doc_id, list_reverse(ws) AS ws FROM cw WHERE doc_id % 5 = 0),
        |cc1 AS (SELECT doc_id, ws, len(ws) AS n,
        |    UNNEST(range(GREATEST(CAST(CEIL((len(ws) - 8) / 24.0) AS BIGINT), 1))) AS chunk_id
        |  FROM cw1),
        |chk1 AS (SELECT doc_id * 100000 + chunk_id AS ck,
        |    array_to_string(ws[CAST(chunk_id * 24 + 1 AS INT):CAST(LEAST(chunk_id * 24 + 32, n) AS INT)], ' ') AS ct
        |  FROM cc1),
        |u1 AS (SELECT ck AS vid,
        |    list_transform(range(64), i -> (ascii(substr(ct,
        |      CAST((i * 31 + 7) % length(ct) AS INT) + 1, 1)) / 255.0) - 0.5) AS vd
        |  FROM chk1),
        |cw2 AS (SELECT doc_id + 2000000 AS doc_id, ws FROM cw WHERE doc_id % 7 = 3),
        |cc2 AS (SELECT doc_id, ws, len(ws) AS n,
        |    UNNEST(range(GREATEST(CAST(CEIL((len(ws) - 8) / 24.0) AS BIGINT), 1))) AS chunk_id
        |  FROM cw2),
        |chk2 AS (SELECT doc_id * 100000 + chunk_id AS ck,
        |    array_to_string(ws[CAST(chunk_id * 24 + 1 AS INT):CAST(LEAST(chunk_id * 24 + 32, n) AS INT)], ' ') AS ct
        |  FROM cc2),
        |u2 AS (SELECT ck AS vid,
        |    list_transform(range(64), i -> (ascii(substr(ct,
        |      CAST((i * 31 + 7) % length(ct) AS INT) + 1, 1)) / 255.0) - 0.5) AS vd
        |  FROM chk2),
        |v AS (SELECT vid, list_transform(vd, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv FROM u),
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
        |q1 AS (SELECT vid, list_transform(vd, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv FROM u1),
        |q2 AS (SELECT vid, list_transform(vd, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv FROM u2),
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
        |ORDER BY vid""".stripMargin)

  /** The passage-level SemDeDup oracle, parameterized ONLY on the seed
    * subquery (rows whose ascending-vid row numbers become the cells):
    * q151 pins the hand-auditable k=16, q152 the production k≈√n.
    * Spliced by token replace, not interpolation — an s-interpolator
    * would re-process the SQL's regex escapes.
    */
  private def chunkSemDedupSql(seedsSql: String): String =
      """WITH cw AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents WHERE length(trim(text)) > 0),
        |cc AS (SELECT doc_id, ws, len(ws) AS n,
        |    UNNEST(range(GREATEST(CAST(CEIL((len(ws) - 8) / 24.0) AS BIGINT), 1))) AS chunk_id
        |  FROM cw),
        |chk AS (SELECT doc_id * 100000 + chunk_id AS ck,
        |    array_to_string(ws[CAST(chunk_id * 24 + 1 AS INT):CAST(LEAST(chunk_id * 24 + 32, n) AS INT)], ' ') AS ct
        |  FROM cc),
        |u AS (SELECT ck AS vid,
        |    list_transform(range(64), i -> (ascii(substr(ct,
        |      CAST((i * 31 + 7) % length(ct) AS INT) + 1, 1)) / 255.0) - 0.5) AS vd
        |  FROM chk),
        |v AS (SELECT vid, list_transform(vd, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv FROM u),
        |e AS (SELECT vid, dd.range AS dim, qv[CAST(dd.range AS INT) + 1] AS x
        |      FROM v CROSS JOIN range(64) dd),
        |c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vid) - 1 AS BIGINT) AS cell, vid
        |       FROM __SEEDS__),
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
        |nn AS (SELECT vid, qv, list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS n2 FROM v),
        |pr AS (SELECT a.vid AS va, b.vid AS vb,
        |        list_dot_product(CAST(na.qv AS DOUBLE[]), CAST(nb.qv AS DOUBLE[])) AS d,
        |        na.n2 AS na2, nb.n2 AS nb2
        |      FROM a3 a JOIN a3 b ON a.cell = b.cell AND a.vid < b.vid
        |      JOIN nn na ON na.vid = a.vid JOIN nn nb ON nb.vid = b.vid),
        |dups AS (SELECT vb AS vid, MIN(va) AS dup_of FROM pr
        |      WHERE d > 0 AND d * d >= 0.81 * na2 * nb2 GROUP BY vb)
        |SELECT a3.vid, a3.cell, dups.dup_of, dups.dup_of IS NULL AS kept
        |FROM a3 LEFT JOIN dups ON a3.vid = dups.vid
        |ORDER BY a3.vid""".stripMargin.replace("__SEEDS__", seedsSql)
}
