package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** OLAP analytics beyond the reference's surface (it has no grouping
  * sets and no percentiles — SURVEY §2.6): rollup sub-totals and exact
  * interpolated percentiles, both oracle-checked. These exercise the
  * operators the engine's own optimizer rule must coexist with —
  * rollup legitimately plans an Expand (one output row per grouping
  * set, unavoidable and correct), unlike the multi-distinct Expand
  * that RewriteMultiDistinctCounts removes.
  */
object Analytic {
  private val dec2 = DecimalType(18, 2)
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ROLLUP (year, status): per-cell, per-year and grand totals in one
    // pass. Synthetic o_orderdate is never null, so 'ALL' labels are
    // unambiguous rollup markers.
    "q60_status_rollup" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.withColumn("yr", year(col("o_orderdate")).cast("long"))
        .rollup("yr", "o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice").cast(dec2)).cast(dec2).cast("double"), 2).as("total_price"))
        .select(coalesce(col("yr").cast("string"), lit("ALL")).as("order_year"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("order_status"),
          col("n_orders"), col("total_price"))
        .orderBy("order_year", "order_status")
    }),

    // Exact interpolated percentiles (R-7, the convention Spark's
    // `percentile` and DuckDB's `quantile_cont` share): quartiles + p90
    // of lineitem quantity per return flag. Quantities are small
    // integers, so the interpolation arithmetic is exact in doubles on
    // both engines.
    "q61_quantity_percentiles" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy("l_returnflag")
        .agg(
          percentile(col("l_quantity"), lit(0.25)).as("p25"),
          percentile(col("l_quantity"), lit(0.5)).as("p50"),
          percentile(col("l_quantity"), lit(0.75)).as("p75"),
          percentile(col("l_quantity"), lit(0.9)).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // approx_count_distinct at the oracle tier (SURVEY §2.6 — the HLL
    // sketch a 100 TB engine uses where exact distinct would shuffle
    // every key): per return flag, the EXACT distinct counts plus a
    // boolean error contract — each engine's own HLL estimate must land
    // within 15% (3x the requested rsd 0.05) of exact. Estimates are
    // engine-specific (different HLL variants/hashes) so the VALUES
    // can't cross-check; the CONTRACT can, and the spec tier pins
    // Spark's estimator to its rsd bound independently
    // (SpeechBuilderSpec "approx_count_distinct stays within rsd").
    "q106_approx_distinct_contract" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          approx_count_distinct(col("l_partkey"), 0.05).as("apx_p"),
          approx_count_distinct(col("l_orderkey"), 0.05).as("apx_o"))
        .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
          (abs(col("apx_p") - col("exact_parts")) <=
            col("exact_parts") * 0.15).as("parts_within_bounds"),
          (abs(col("apx_o") - col("exact_orders")) <=
            col("exact_orders") * 0.15).as("orders_within_bounds"))
        .orderBy("l_returnflag")
    }),

    // Deterministic ~20% stratified corpus sample: keep a document when
    // the first hex byte of sha256("graft-sample:" + doc_id) < 0x33
    // (51/256 ≈ 19.9%). Hash-gating instead of rand() matters at
    // cluster scale: the sample is identical under task retries,
    // partitioning changes, and re-runs, and any engine (here: DuckDB)
    // reproduces it bit-for-bit. The salt prefix decorrelates this
    // sample from any other hash use of doc_id. Narrow scan-side
    // filter — no shuffle at all until the per-stratum audit counts.
    "q62_stratified_sample" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val sampled = d.filter(
        substring(sha2(concat(lit("graft-sample:"), col("doc_id").cast("string")), 256), 1, 2) < "33")
      sampled.groupBy("lang", "source")
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("n_chars")).as("sampled_chars"),
          min(col("doc_id")).as("first_doc"))
        .orderBy("lang", "source")
    }),

    // Sequence packing for training: greedy-fill documents into
    // 4096-token bins per (lang, shard), in deterministic doc_id order —
    // bin = floor(running token count before this doc / capacity).
    // The shard key bounds the window partition (a per-lang-only
    // partition would sort a whole language in one task at corpus
    // scale); production would shard by hash(doc_id) per ~10⁶ docs.
    "q63_sequence_packing" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang", "shard").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      d.select(col("doc_id"), col("lang"),
          pmod(col("doc_id"), lit(8L)).as("shard"),
          size(split(col("text"), " ")).cast("long").as("tokens"))
        .withColumn("offset", coalesce(sum(col("tokens")).over(w), lit(0L)))
        .withColumn("bin", expr("offset div 4096L"))
        .groupBy("lang", "shard", "bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("bin_tokens"))
        .orderBy("lang", "shard", "bin")
    }),

    // Token-budgeted weighted mixing (operators/MixOps): 10% of the
    // corpus's tokens, split across sources by a weight derived from
    // the source id (srcN → N % 4 + 1, normalized over the sources
    // present) — the pretraining-recipe step. The oracle re-derives
    // EVERYTHING: per-source token mass, weight shares, the float
    // rate tree (mirrored operation for operation), the 16-bit cut,
    // and the per-row hash gate — so a drifted rate, a re-ordered
    // float op, or a salt collision all fail the hash, not just a
    // wrong row count.
    "q130_mix_token_budget" -> ((s, dir) => {
      val kept = graft.operators.MixOps.mixByTokenBudget(
        t(s, dir, "documents"), "source", "text", "doc_id",
        weightExpr = substring(col("source"), 4, 10).cast("int") % 4 + 1,
        budgetFrac = 0.1)
      kept.groupBy("source", "mix_cut")
        .agg(count(lit(1)).as("n_kept"),
          sum(size(split(col("text"), " ")).cast("long")).as("kept_tokens"),
          min(col("doc_id")).as("first_doc"))
        .orderBy("source")
    }),

    // q130 with FRACTIONAL weights — the "0.6 web + 0.3 code" recipe
    // shape, and the exact bug class round 14 fixed (a long cast
    // silently truncated sub-1.0 weights to an EMPTY mix) put under the
    // hash gate, where MixOpsSpec alone had to catch it before. Weights
    // are (N%4+1)/4.0: dyadic rationals (0.25..1.0) are exactly
    // representable, so the driver-side weight SUM is order-independent
    // and bit-identical across engines — a /10.0 recipe would make wsum
    // depend on the engines' summation order at the last ulp. A
    // distinct salt decorrelates this mix's kept set from q130's.
    "q133_mix_fractional_weights" -> ((s, dir) => {
      val kept = graft.operators.MixOps.mixByTokenBudget(
        t(s, dir, "documents"), "source", "text", "doc_id",
        weightExpr =
          (substring(col("source"), 4, 10).cast("int") % 4 + 1).cast("double") / 4.0,
        budgetFrac = 0.1, salt = "graft-mix-frac")
      kept.groupBy("source", "mix_cut")
        .agg(count(lit(1)).as("n_kept"),
          sum(size(split(col("text"), " ")).cast("long")).as("kept_tokens"),
          min(col("doc_id")).as("first_doc"))
        .orderBy("source")
    }),
  )

  val oracles: Map[String, String] = Map(

    // DuckDB's own HLL asserts the same 15% contract against the same
    // exact counts — both estimators must honor the written error bound
    // for the row to hash-match
    "q106_approx_distinct_contract" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |  abs(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
        |    <= COUNT(DISTINCT l_partkey) * 0.15 AS parts_within_bounds,
        |  abs(approx_count_distinct(l_orderkey) - COUNT(DISTINCT l_orderkey))
        |    <= COUNT(DISTINCT l_orderkey) * 0.15 AS orders_within_bounds
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q60_status_rollup" ->
      """WITH o AS (SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
        |    o_orderstatus AS st, CAST(o_totalprice AS DECIMAL(18,2)) AS tp
        |  FROM orders)
        |SELECT COALESCE(CAST(yr AS VARCHAR), 'ALL') AS order_year,
        |  COALESCE(st, 'ALL') AS order_status,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  ROUND(CAST(CAST(SUM(tp) AS DECIMAL(18,2)) AS DOUBLE), 2) AS total_price
        |FROM o GROUP BY ROLLUP(yr, st)
        |ORDER BY order_year, order_status""".stripMargin,

    "q61_quantity_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  quantile_cont(l_quantity, 0.9) AS p90,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // lowercase-hex prefix comparison == numeric comparison of the first
    // byte; DuckDB's sha256 and Spark's sha2 agree on the digest
    "q62_stratified_sample" ->
      """SELECT lang, source,
        |  CAST(COUNT(*) AS BIGINT) AS n_sampled,
        |  CAST(SUM(n_chars) AS BIGINT) AS sampled_chars,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
        |FROM documents
        |WHERE substring(sha256('graft-sample:' || CAST(doc_id AS VARCHAR)), 1, 2) < '33'
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "q63_sequence_packing" ->
      """WITH d AS (
        |  SELECT doc_id, lang, doc_id % 8 AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |  FROM documents),
        |o AS (
        |  SELECT lang, shard, tokens,
        |    COALESCE(SUM(tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM d)
        |SELECT lang, CAST(shard AS BIGINT) AS shard, CAST(off // 4096 AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(tokens) AS BIGINT) AS bin_tokens
        |FROM o GROUP BY lang, shard, bin ORDER BY lang, shard, bin""".stripMargin,

    // the float rate tree mirrors MixOps.mixByTokenBudget op for op:
    // t1 = tot*frac; t2 = w/wsum; t3 = t1*t2; t4 = t3/stoks;
    // rate = least(1, t4); cut = floor(rate*65536) as %05x — lexicographic
    // hex compare of the 5-padded gate is numeric compare (q62 trick,
    // widened one char so a saturated cut 0x10000 keeps everything)
    "q130_mix_token_budget" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |per AS (SELECT source, SUM(toks) AS stoks,
        |    CAST(CAST(substring(source, 4) AS INTEGER) % 4 + 1 AS BIGINT) AS w
        |  FROM d GROUP BY source),
        |tot AS (SELECT CAST(SUM(stoks) AS DOUBLE) AS tot,
        |    CAST(SUM(w) AS DOUBLE) AS wsum FROM per),
        |cuts AS (SELECT source, printf('%05x', CAST(floor(LEAST(1.0,
        |      (tot * 0.1) * (CAST(w AS DOUBLE) / wsum) / CAST(stoks AS DOUBLE))
        |      * 65536.0) AS BIGINT)) AS mix_cut
        |  FROM per, tot),
        |g AS (SELECT d.doc_id, d.source, d.toks, cuts.mix_cut
        |  FROM d JOIN cuts USING (source)
        |  WHERE lpad(substring(sha256('graft-mix:' || CAST(doc_id AS VARCHAR)), 1, 4),
        |    5, '0') < mix_cut)
        |SELECT source, mix_cut,
        |  CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(SUM(toks) AS BIGINT) AS kept_tokens,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
        |FROM g GROUP BY source, mix_cut ORDER BY source""".stripMargin,

    // q130's oracle with the weight tree made fractional: w is a DOUBLE
    // (N%4+1)/4.0 per source — dyadic, so SUM(w) is exact in any order —
    // and the rate tree mirrors MixOps op for op with w already double
    "q133_mix_fractional_weights" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |per AS (SELECT source, SUM(toks) AS stoks,
        |    CAST(CAST(substring(source, 4) AS INTEGER) % 4 + 1 AS DOUBLE) / 4.0 AS w
        |  FROM d GROUP BY source),
        |tot AS (SELECT CAST(SUM(stoks) AS DOUBLE) AS tot,
        |    SUM(w) AS wsum FROM per),
        |cuts AS (SELECT source, printf('%05x', CAST(floor(LEAST(1.0,
        |      (tot * 0.1) * (w / wsum) / CAST(stoks AS DOUBLE))
        |      * 65536.0) AS BIGINT)) AS mix_cut
        |  FROM per, tot),
        |g AS (SELECT d.doc_id, d.source, d.toks, cuts.mix_cut
        |  FROM d JOIN cuts USING (source)
        |  WHERE lpad(substring(sha256('graft-mix-frac:' || CAST(doc_id AS VARCHAR)), 1, 4),
        |    5, '0') < mix_cut)
        |SELECT source, mix_cut,
        |  CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(SUM(toks) AS BIGINT) AS kept_tokens,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
        |FROM g GROUP BY source, mix_cut ORDER BY source""".stripMargin,
  )
}
