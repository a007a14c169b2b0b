package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns

/** Scalar-function surface (SURVEY §2.3 F1-F18) exercised as queries with
  * DuckDB oracles — the hash/date/week-id functions are the identity
  * generators for every surrogate key in the reference, so cross-engine
  * byte parity is load-bearing.
  */
object Scalar {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // F5 stable_hash + F7 rowId24 parity.
    "q17_stable_hash" -> ((s, dir) => {
      t(s, dir, "customer").select(
          col("c_custkey").cast("long").as("custkey"),
          Fns.stableHash(16, col("c_name"), col("c_mktsegment")).as("sid16"),
          Fns.rowId24(col("c_custkey"), col("c_name")).as("rid24"))
        .orderBy("custkey")
    }),

    // P4/P6: coalesce-first-nonblank + truthy-string predicate.
    "q18_coalesce_truthy" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("custkey"),
        when(col("c_custkey") % 3 === 0, lit("")).otherwise(col("c_mktsegment")).as("seg_a"),
        when(col("c_custkey") % 4 === 0, lit("true"))
          .when(col("c_custkey") % 4 === 1, lit("1"))
          .when(col("c_custkey") % 4 === 2, lit("no")).otherwise(lit("")).as("flag_raw"))
      c.select(col("custkey"),
          Fns.coalesceNonBlank(col("seg_a"), lit("UNKNOWN")).as("segment"),
          Fns.truthy(col("flag_raw")).as("is_active"))
        .orderBy("custkey")
    }),

    // F3 lenient date parse round-trip through dd/MM/yyyy strings.
    "q19_date_parse" -> ((s, dir) => {
      t(s, dir, "orders").select(
          col("o_orderkey").cast("long").as("orderkey"),
          Fns.parseIsoDate(date_format(col("o_orderdate"), "dd/MM/yyyy")).as("parsed"))
        .orderBy("orderkey")
    }),

    // F13 non-ISO week-id calendar (first-Monday rule).
    "q20_week_id" -> ((s, dir) => {
      t(s, dir, "orders").select(
          col("o_orderkey").cast("long").as("orderkey"),
          Fns.weekId(to_date(col("o_orderdate"))).as("week_id"))
        .orderBy("orderkey")
    }),

    // F10/F12-ish text metrics over documents.
    "q21_text_metrics" -> ((s, dir) => {
      t(s, dir, "documents").select(
          col("doc_id").cast("long").as("doc_id"),
          Fns.wordCount(col("text")).cast("long").as("n_words"),
          length(col("text")).cast("long").as("n_chars"),
          Fns.tokenCount(col("text")).cast("long").as("n_tokens"))
        .orderBy("doc_id")
    }),

    // A6 sorted-distinct string agg (office-names semantics).
    "q22_string_agg" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation_name"))
        .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), "; ").as("segments"),
          count(lit(1)).as("n_customers"))
        .orderBy("nation_name")
    }),

    // §2.9 key-set intersect/except (compat comparison J8).
    "q23_keyset_compare" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey")).distinct()
      val b = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")).distinct()
      val both = a.intersect(b).count()
      val onlyA = a.except(b).count()
      val onlyB = b.except(a).count()
      val s2 = s
      import s2.implicits._
      Seq((both, onlyA, onlyB)).toDF("in_both", "only_1995", "only_1996")
    }),

    // N-layer JSON extraction from the events payload column.
    "q24_events_json" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(col("k")).cast("long").as("sum_k"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")
    }),

    // F15 percentage with zero-denominator guard: share of open orders.
    "q25_pct_guarded" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.groupBy(col("o_orderpriority").as("priority"))
        .agg(count(when(col("o_orderstatus") === "O", 1)).as("n_open"),
          count(lit(1)).as("n_total"))
        .select(col("priority"),
          col("n_open"), col("n_total"),
          Fns.pct(col("n_open"), col("n_total")).as("open_pct"))
        .orderBy("priority")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q17_stable_hash" ->
      """SELECT CAST(c_custkey AS BIGINT) AS custkey,
        |  substr(sha256(lower(concat_ws('|', c_name, c_mktsegment))), 1, 16) AS sid16,
        |  substr(sha256(concat_ws('||', CAST(CAST(c_custkey AS BIGINT) AS VARCHAR), c_name)), 1, 24) AS rid24
        |FROM customer ORDER BY custkey""".stripMargin,

    "q18_coalesce_truthy" ->
      """WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS custkey,
        |    CASE WHEN c_custkey % 3 = 0 THEN '' ELSE c_mktsegment END AS seg_a,
        |    CASE WHEN c_custkey % 4 = 0 THEN 'true' WHEN c_custkey % 4 = 1 THEN '1'
        |         WHEN c_custkey % 4 = 2 THEN 'no' ELSE '' END AS flag_raw
        |  FROM customer)
        |SELECT custkey,
        |  COALESCE(NULLIF(TRIM(seg_a), ''), 'UNKNOWN') AS segment,
        |  lower(trim(flag_raw)) IN ('true','1','yes','y') AS is_active
        |FROM c ORDER BY custkey""".stripMargin,

    "q19_date_parse" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS orderkey,
        |  CAST(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y') AS DATE) AS parsed
        |FROM orders ORDER BY orderkey""".stripMargin,

    "q20_week_id" ->
      """WITH d AS (SELECT CAST(o_orderkey AS BIGINT) AS orderkey, CAST(o_orderdate AS DATE) AS od FROM orders),
        |c AS (SELECT orderkey, od,
        |    make_date(CAST(year(od) AS INT), 1, 1) AS jan1,
        |    make_date(CAST(year(od) - 1 AS INT), 1, 1) AS pjan1 FROM d),
        |f AS (SELECT orderkey, od,
        |    jan1 + CAST((8 - isodow(jan1)) % 7 AS INTEGER) AS fm,
        |    pjan1 + CAST((8 - isodow(pjan1)) % 7 AS INTEGER) AS pfm FROM c)
        |SELECT orderkey,
        |  CAST(CASE WHEN od < fm
        |    THEN (year(od) - 1) * 100 + FLOOR(date_diff('day', pfm, od) / 7.0) + 1
        |    ELSE year(od) * 100 + FLOOR(date_diff('day', fm, od) / 7.0) + 1 END AS BIGINT) AS week_id
        |FROM f ORDER BY orderkey""".stripMargin,

    "q21_text_metrics" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(CASE WHEN TRIM(text) = '' THEN 0
        |    ELSE len(string_split_regex(TRIM(text), '\s+')) END AS BIGINT) AS n_words,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q22_string_agg" ->
      """SELECT n_name AS nation_name,
        |  string_agg(DISTINCT c_mktsegment, '; ' ORDER BY c_mktsegment) AS segments,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY nation_name""".stripMargin,

    "q23_keyset_compare" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995),
        |b AS (SELECT DISTINCT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996)
        |SELECT
        |  CAST((SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS BIGINT) AS in_both,
        |  CAST((SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS BIGINT) AS only_1995,
        |  CAST((SELECT COUNT(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a)) AS BIGINT) AS only_1996""".stripMargin,

    "q24_events_json" ->
      """SELECT event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q25_pct_guarded" ->
      """SELECT o_orderpriority AS priority,
        |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
        |  CAST(COUNT(*) AS BIGINT) AS n_total,
        |  CASE WHEN COUNT(*) > 0
        |    THEN round(CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) / COUNT(*) * 100.0, 2)
        |    ELSE 0.0 END AS open_pct
        |FROM orders GROUP BY o_orderpriority ORDER BY priority""".stripMargin,
  )
}
