package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.SearchOps

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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BM25 top-5 per derived query: broadcast query terms prune the
    // postings before df/scoring; integer score; bounded top-k.
    "q118_bm25_topk" -> ((s, dir) => {
      SearchOps.bm25TopK(t(s, dir, "documents"), "text", "doc_id",
          qs(s, dir), topK = 5)
        .orderBy("query_id", "rank")
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
    }))

  /** Build the postings index once per (sf dir + data fingerprint);
    * later calls — even from a fresh JVM — only resolve the pointer and
    * read (the ensureQ110Index pattern: the first bench rep pays the
    * build, steady-state reps measure serving).
    */
  private def ensurePostingsIndex(s: SparkSession, dir: String): String = {
    val stamp = Integer.toHexString(dir.hashCode) + "_" + graft.io.Fingerprint
      .ofTree(new java.io.File(dir, "documents.parquet").getPath)
    val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_q120_bm25_" + stamp)
    if (!SearchOps.postingsIndexExists(root.getPath))
      SearchOps.buildPostingsIndex(Tables.load(s, dir, "documents"),
        "text", "doc_id", root.getPath)
    root.getPath
  }

  // Shared SQL fragments: tokenized docs + postings + derived queries +
  // BM25 contributions — the contribution FLOOR tree mirrors
  // SearchOps.bm25TopK's Column tree exactly (see scaladoc there).
  private val bm25Cte =
    """w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), x -> x <> '') AS ws
      |  FROM documents),
      |d AS (SELECT doc_id, ws, CAST(len(ws) AS DOUBLE) AS dl FROM w WHERE len(ws) >= 1),
      |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, SUM(dl) AS total_len FROM d),
      |post AS (SELECT term, doc_id, CAST(COUNT(*) AS DOUBLE) AS tf
      |  FROM (SELECT doc_id, unnest(ws) AS term FROM d) GROUP BY term, doc_id),
      |qt AS (SELECT doc_id AS query_id, unnest(list_distinct(ws[1:8])) AS term
      |  FROM d WHERE doc_id % 50 = 0),
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
      |  FROM contrib GROUP BY query_id, doc_id)""".stripMargin

  def oracles: Map[String, String] = Map(

    "q118_bm25_topk" ->
      s"""WITH $bm25Cte,
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
    "q120_bm25_topk_prepared" ->
      s"""WITH $bm25Cte,
         |r AS (SELECT query_id, doc_id, score,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rnk
         |  FROM sc)
         |SELECT query_id, doc_id, score, CAST(rnk AS BIGINT) AS rank
         |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin,

    // build-half + append-half + replayed-append converges on the same
    // index a full build produces, so the answer is q118's oracle
    // verbatim (a replay double-count would shift every idf and fail)
    "q121_bm25_index_appended" ->
      s"""WITH $bm25Cte,
         |r AS (SELECT query_id, doc_id, score,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rnk
         |  FROM sc)
         |SELECT query_id, doc_id, score, CAST(rnk AS BIGINT) AS rank
         |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin)
}
