package graft.queries

/** DuckDB parity SQL for the LLM-pipeline queries: the assembled map
  * plus the shared CTE unrolls and the anchor-splice patcher (split out
  * of LlmPipeline.scala in round 17 — pure move, no behavior change;
  * the long replay SQL lives in [[LlmOraclesTail]]).
  */
private[queries] object LlmOracles {

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

  private[queries] val oracles: Map[String, String] = oraclesMain +
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
    // retention GC on the semantic index moves no answer: versions are
    // self-contained (the fold rewrote labeled and carried the ledger),
    // so the pruned lifecycle's end state is q146's oracle verbatim
    ("q149_semantic_index_pruned" ->
      oraclesMain("q146_semantic_dedup_stream_intake")) +
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
    "q78_incremental_dedup_prepared" -> LlmOraclesTail.incrementalDedupSql,
    // the pruned-lifecycle judgment must equal the fresh-index one
    "q132_dedup_index_pruned" -> LlmOraclesTail.incrementalDedupSql,
    "q73_incremental_dedup" -> LlmOraclesTail.incrementalDedupSql,

    // the cap makes the planted hot family contribute NOTHING, so the
    // capped pairs over base∪family must equal the brute pairs over the
    // base corpus alone — q27's oracle verbatim
    "q82_skew_neardup_capped" -> shingleCte,
    "q83_skew_ingest_capped" -> LlmOraclesTail.skewIngestSql,
    "q84_skew_lifecycle_compacted" -> LlmOraclesTail.skewLifecycleSql,
    "q104_stream_intake_multi_trigger" -> LlmOraclesTail.streamIntakeSql,

    // sliding-window chunking: chunk i covers tokens [i·24+1, min(i·24+32, n)]
    // (1-based), numChunks = max(1, ceil((n-8)/24)) — tails kept, blank
    // docs filtered, token = whitespace word over the family's normText
    "q147_chunk_windows" ->
      """WITH a AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents WHERE length(trim(text)) > 0),
        |b AS (SELECT doc_id, ws, len(ws) AS n FROM a),
        |c AS (SELECT doc_id, ws, n,
        |    UNNEST(range(GREATEST(CAST(CEIL((n - 8) / 24.0) AS BIGINT), 1))) AS chunk_id
        |  FROM b)
        |SELECT doc_id, chunk_id,
        |  CAST(len(ws[CAST(chunk_id * 24 + 1 AS INT):CAST(LEAST(chunk_id * 24 + 32, n) AS INT)]) AS BIGINT) AS n_tokens,
        |  array_to_string(ws[CAST(chunk_id * 24 + 1 AS INT):CAST(LEAST(chunk_id * 24 + 32, n) AS INT)], ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
  ) ++ LlmOraclesTail.oraclesTail
}
