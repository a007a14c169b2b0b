package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.MergeOps

/** Write-semantics operators (SURVEY §2.10 M1-M9, §2.5 J7, §2.7 W3/W6)
  * exercised through [[MergeOps]] on simulated existing/incoming splits of
  * the driver's tables, each with a DuckDB oracle that re-derives the same
  * split in SQL.
  */
object MergeSemantics {
  private val dec2 = DecimalType(18, 2)
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private def ordersBase(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey").cast("long").as("orderkey"),
      col("o_orderstatus").as("status"),
      col("o_totalprice").cast(dec2).as("price"),
      col("o_orderdate").as("odate"),
      col("o_custkey").cast("long").as("custkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // M2 upsert: incoming (every 3rd key) overrides existing (every 2nd key).
    "q09_upsert_pk" -> ((s, dir) => {
      val base = ordersBase(s, dir)
      val existing = base.filter(col("orderkey") % 2 === 0).select("orderkey", "status", "price")
      val incoming = base.filter(col("orderkey") % 3 === 0)
        .select(col("orderkey"), lit("U").as("status"),
          (col("price") + lit(BigDecimal("10.00"))).cast(dec2).as("price"))
      MergeOps.upsert(existing, incoming, Seq("orderkey"))
        // decimal arithmetic stays exact inside the merge; final-select to
        // round(double, 2) so no DECIMAL reaches the output schema (driver
        // hashes decimals differently than the oracle path)
        .select(col("orderkey"), col("status"), round(col("price").cast("double"), 2).as("price"))
        .orderBy("orderkey")
    }),

    // M2 stage 2: business-key dedupe removes legacy duplicate surrogate ids
    // (tests/test_oireachtas_business_key_merge.py semantics).
    "q10_business_key_merge" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("custkey"), col("c_name").as("name"))
      val existing = c.select(concat(lit("old_"), col("custkey")).as("sid"), col("custkey"), col("name"))
      val incoming = c.filter(col("custkey") % 5 === 0)
        .select(concat(lit("new_"), col("custkey")).as("sid"), col("custkey"), col("name"))
      MergeOps.upsert(existing, incoming, Seq("sid"), businessKey = Seq("custkey"))
        .orderBy("custkey")
    }),

    // M5 history dedupe conflict evidence: injected value-conflicting dups.
    "q11_history_dedupe_conflicts" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey").cast("long").as("orderkey"),
        col("l_linenumber").cast("long").as("linenumber"),
        col("l_partkey").cast("long").as("partkey"),
        col("l_quantity").cast(dec2).as("qty"))
      val dups = li.filter(col("partkey") % 10 === 0)
        .withColumn("qty", (col("qty") + lit(BigDecimal("1.00"))).cast(dec2))
      val (_, conflicts) = MergeOps.historyDedupe(
        li.unionByName(dups), Seq("orderkey", "linenumber"), Seq("qty"))
      conflicts.select(col("orderkey"), col("linenumber"),
          col("variant_count").cast("long").as("variant_count"),
          col("row_count").cast("long").as("row_count"))
        .orderBy("orderkey", "linenumber")
    }),

    // M7 temporal integrity counts over synthesized validity ranges.
    "q12_temporal_integrity" -> ((s, dir) => {
      val base = ordersBase(s, dir)
      val ranged = base.select(
        when(col("orderkey") % 97 === 0, date_add(to_date(col("odate")), 60))
          .otherwise(to_date(col("odate"))).as("valid_from"),
        date_add(to_date(col("odate")), 30).as("valid_to"),
        when(col("orderkey") % 5 === 0, lit("true")).otherwise(lit("no")).as("is_current"))
      MergeOps.temporalIntegrity(ranged, "valid_from", "valid_to", "is_current",
        to_date(lit("1996-06-01")))
    }),

    // W6 overlapping validity ranges per customer (order windows of 60 days).
    "q13_overlap_count" -> ((s, dir) => {
      val base = ordersBase(s, dir)
      val ranges = base.select(col("custkey"), col("odate").as("vs"),
        (col("odate") + expr("INTERVAL 60 DAYS")).as("ve"))
      MergeOps.overlapCount(ranges, "custkey", "vs", "ve")
        .select(col("custkey"), col("overlap_count").cast("long").as("overlap_count"))
        .orderBy("custkey")
    }),

    // W3 latest-row-per-group: prefer open orders, then latest date, then key.
    "q14_latest_per_group" -> ((s, dir) => {
      val base = ordersBase(s, dir)
      MergeOps.latestPerGroup(base, Seq("custkey"),
          Seq((col("status") === "O").desc, col("odate").desc, col("orderkey").desc))
        .select(col("custkey"), col("orderkey"), col("status"))
        .orderBy("custkey")
    }),

    // M8 scoped replace: 1997 orders replaced by recoded copies, rest kept.
    "q15_scoped_replace" -> ((s, dir) => {
      val base = ordersBase(s, dir)
        .withColumn("order_year", year(col("odate")).cast("long"))
      val replacement = base.filter(col("order_year") === 1997)
        .withColumn("status", lit("R"))
      MergeOps.scopedReplace(base, replacement, "order_year", Seq(1997L))
        .groupBy("order_year", "status")
        .agg(count(lit(1)).as("n"))
        .orderBy("order_year", "status")
    }),

    // M9 resumable fill-missing delta via anti-join.
    "q16_missing_delta" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("lang"))
      val existing = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), lit("done").as("summary"))
      MergeOps.missingDelta(docs, existing, "doc_id", "summary")
        .select("doc_id", "lang").orderBy("doc_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q09_upsert_pk" ->
      """WITH base AS (SELECT CAST(o_orderkey AS BIGINT) AS orderkey, o_orderstatus AS status,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders),
        |existing AS (SELECT orderkey, status, price, 0 AS pri FROM base WHERE orderkey % 2 = 0),
        |incoming AS (SELECT orderkey, 'U' AS status, CAST(price + 10.00 AS DECIMAL(18,2)) AS price, 1 AS pri
        |  FROM base WHERE orderkey % 3 = 0),
        |u AS (SELECT * FROM existing UNION ALL SELECT * FROM incoming),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY orderkey ORDER BY pri DESC) AS rn FROM u)
        |SELECT orderkey, status, ROUND(CAST(price AS DOUBLE), 2) AS price
        |FROM r WHERE rn = 1 ORDER BY orderkey""".stripMargin,

    "q10_business_key_merge" ->
      """WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS custkey, c_name AS name FROM customer),
        |existing AS (SELECT 'old_' || custkey AS sid, custkey, name, 0 AS pri FROM c),
        |incoming AS (SELECT 'new_' || custkey AS sid, custkey, name, 1 AS pri FROM c WHERE custkey % 5 = 0),
        |u AS (SELECT * FROM existing UNION ALL SELECT * FROM incoming),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY pri DESC) AS rn FROM u)
        |SELECT sid, custkey, name FROM r WHERE rn = 1 ORDER BY custkey""".stripMargin,

    "q11_history_dedupe_conflicts" ->
      """WITH li AS (SELECT CAST(l_orderkey AS BIGINT) AS orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
        |    CAST(l_partkey AS BIGINT) AS partkey, CAST(l_quantity AS DECIMAL(18,2)) AS qty FROM lineitem),
        |dups AS (SELECT orderkey, linenumber, partkey, CAST(qty + 1.00 AS DECIMAL(18,2)) AS qty
        |  FROM li WHERE partkey % 10 = 0),
        |u AS (SELECT * FROM li UNION ALL SELECT * FROM dups)
        |SELECT orderkey, linenumber,
        |  CAST(COUNT(DISTINCT qty) AS BIGINT) AS variant_count,
        |  CAST(COUNT(*) AS BIGINT) AS row_count
        |FROM u GROUP BY orderkey, linenumber
        |HAVING COUNT(DISTINCT qty) > 1
        |ORDER BY orderkey, linenumber""".stripMargin,

    "q12_temporal_integrity" ->
      """WITH base AS (SELECT CAST(o_orderkey AS BIGINT) AS orderkey, CAST(o_orderdate AS DATE) AS od FROM orders),
        |ranged AS (SELECT
        |    CASE WHEN orderkey % 97 = 0 THEN od + 60 ELSE od END AS valid_from,
        |    od + 30 AS valid_to,
        |    CASE WHEN orderkey % 5 = 0 THEN 'true' ELSE 'no' END AS is_current
        |  FROM base)
        |SELECT CAST(COUNT(*) AS BIGINT) AS row_count,
        |  CAST(COUNT(*) FILTER (WHERE valid_from > valid_to) AS BIGINT) AS inverted_range_count,
        |  CAST(COUNT(*) FILTER (WHERE lower(trim(is_current)) IN ('true','1','yes','y')
        |    AND valid_from > DATE '1996-06-01') AS BIGINT) AS future_current_count
        |FROM ranged""".stripMargin,

    "q13_overlap_count" ->
      """WITH ranges AS (SELECT CAST(o_custkey AS BIGINT) AS custkey, o_orderdate AS vs,
        |    o_orderdate + INTERVAL 60 DAY AS ve FROM orders),
        |lagged AS (SELECT custkey, vs,
        |    LAG(ve) OVER (PARTITION BY custkey ORDER BY vs ASC, ve ASC) AS prev_end
        |  FROM ranges)
        |SELECT custkey,
        |  CAST(COUNT(*) FILTER (WHERE prev_end IS NOT NULL AND vs <= prev_end) AS BIGINT) AS overlap_count
        |FROM lagged GROUP BY custkey ORDER BY custkey""".stripMargin,

    "q14_latest_per_group" ->
      """WITH r AS (SELECT CAST(o_custkey AS BIGINT) AS custkey, CAST(o_orderkey AS BIGINT) AS orderkey,
        |    o_orderstatus AS status,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY (o_orderstatus = 'O') DESC, o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |SELECT custkey, orderkey, status FROM r WHERE rn = 1 ORDER BY custkey""".stripMargin,

    "q15_scoped_replace" ->
      """WITH base AS (SELECT CAST(o_orderkey AS BIGINT) AS orderkey, o_orderstatus AS status,
        |    CAST(YEAR(o_orderdate) AS BIGINT) AS order_year FROM orders),
        |kept AS (SELECT * FROM base WHERE order_year <> 1997),
        |repl AS (SELECT orderkey, 'R' AS status, order_year FROM base WHERE order_year = 1997),
        |u AS (SELECT * FROM kept UNION ALL SELECT * FROM repl)
        |SELECT order_year, status, CAST(COUNT(*) AS BIGINT) AS n
        |FROM u GROUP BY order_year, status ORDER BY order_year, status""".stripMargin,

    "q16_missing_delta" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang FROM documents
        |WHERE CAST(doc_id AS BIGINT) % 3 <> 0 ORDER BY doc_id""".stripMargin,
  )
}
