package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.gold.GoldMarts

/** Oracle-checked end-to-end runs of the gold activity marts (SURVEY §2.6
  * A4/A5 + §2.3 F17/J3/J4): the TPC-H tables stand in for the civic
  * inputs — orders as speeches, a keyed slice of orders as votes, and
  * customers as the member roster — so the FULL mart builders
  * (GoldMarts.memberActivityMonthly / constituencyActivityYearly /
  * contentFactPool) execute against a DuckDB-replayable fixture,
  * including their blank-code filters, grid densify, coerce-to-0 string
  * casts, and templated headlines.
  */
object GoldActivity {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private val Snapshot = "2026-06-01"

  /** orders → speeches: member = M<custkey%100> (every 97th speaker code
    * blank, exercising the nonBlank filter), debate_date = orderdate.
    */
  private def speechesFromOrders(o: DataFrame): DataFrame =
    o.select(
      when(col("o_orderkey") % 97 === 0, lit(" "))
        .otherwise(concat(lit("M"), (col("o_custkey") % 100).cast("string")))
        .as("speaker_member_code"),
      col("o_orderdate").cast("string").as("debate_date"),
      col("o_orderkey").cast("string").as("speech_id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A4 member activity at year_month grain: two grouped legs, full
    // outer join on (member, month), coerce-to-0 stringly counts.
    "q79_member_activity_monthly" -> ((s, dir) => {
      val votes = t(s, dir, "lineitem").select(
        concat(lit("M"), (col("l_suppkey") % 100).cast("string")).as("member_code"),
        col("l_shipdate").cast("string").as("division_date"),
        concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("member_vote_id"))
      GoldMarts.memberActivityMonthly(speechesFromOrders(t(s, dir, "orders")), votes, Snapshot)
    }),

    // A5/J3/J4 constituency×year: roster lookup join (broadcast), member
    // counts, year grid densify over the union of both activity legs.
    "q80_constituency_activity_yearly" -> ((s, dir) => {
      val members = t(s, dir, "customer").select(
        concat(lit("M"), col("c_custkey").cast("string")).as("member_code"),
        when(col("c_nationkey") === 13, lit(""))
          .otherwise(concat(lit("CON-"), col("c_nationkey").cast("string")))
          .as("constituency_name"))
      val o = t(s, dir, "orders")
      val speeches = o.select(
        concat(lit("M"), col("o_custkey").cast("string")).as("speaker_member_code"),
        col("o_orderdate").cast("string").as("debate_date"))
      val votes = o.filter(col("o_orderkey") % 3 === 0).select(
        concat(lit("M"), col("o_custkey").cast("string")).as("member_code"),
        col("o_orderdate").cast("string").as("division_date"))
      GoldMarts.constituencyActivityYearly(members, speeches, votes, Snapshot)
    }),

    // F17 content fact pool: three templated fact families over a yearly
    // activity frame; blank display names fall back to the member code,
    // zero metrics are filtered, fact ids are the reference's
    // stable-hash surrogate.
    "q81_content_fact_pool" -> ((s, dir) => {
      val activity = t(s, dir, "orders")
        .select(concat(lit("M"), (col("o_custkey") % 50).cast("string")).as("member_code"),
          year(col("o_orderdate")).cast("string").as("year"),
          (col("o_orderkey") % 5).as("vote_inc"))
        .groupBy("member_code", "year")
        .agg(count(lit(1)).cast("string").as("speech_count"),
          sum(col("vote_inc")).cast("string").as("votes_cast_count"),
          round(count(lit(1)) * 100.0 / (count(lit(1)) + 3), 2)
            .cast("decimal(7,2)").cast("string").as("vote_participation_pct"))
      val members = t(s, dir, "customer")
        .groupBy((col("c_custkey") % 50).as("code"))
        .agg(min(col("c_name")).as("name"))
        .select(concat(lit("M"), col("code").cast("string")).as("member_code"),
          when(col("code") % 10 === 0, lit("")).otherwise(col("name")).as("full_name"))
      GoldMarts.contentFactPool(activity, members, Snapshot)
    }),
  )

  def oracles: Map[String, String] = Map(

    "q79_member_activity_monthly" ->
      """WITH sp AS (
        |  SELECT CASE WHEN o_orderkey % 97 = 0 THEN ' '
        |           ELSE 'M' || CAST(o_custkey % 100 AS VARCHAR) END AS mc,
        |    o_orderdate AS d
        |  FROM orders),
        |sm AS (
        |  SELECT trim(mc) AS member_code, strftime(d, '%Y-%m') AS year_month,
        |    COUNT(*) AS sc, COUNT(DISTINCT d) AS ddc
        |  FROM sp WHERE trim(mc) <> '' GROUP BY 1, 2),
        |vm AS (
        |  SELECT 'M' || CAST(l_suppkey % 100 AS VARCHAR) AS member_code,
        |    strftime(l_shipdate, '%Y-%m') AS year_month, COUNT(*) AS vc
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT member_code, year_month,
        |  CAST(COALESCE(sc, 0) AS VARCHAR) AS speech_count,
        |  CAST(COALESCE(ddc, 0) AS VARCHAR) AS debate_day_count,
        |  CAST(COALESCE(vc, 0) AS VARCHAR) AS votes_cast_count,
        |  '2026-06-01' AS snapshot_date
        |FROM sm FULL OUTER JOIN vm USING (member_code, year_month)
        |ORDER BY member_code, year_month""".stripMargin,

    "q80_constituency_activity_yearly" ->
      """WITH roster AS (
        |  SELECT 'M' || CAST(c_custkey AS VARCHAR) AS member_code,
        |    'CON-' || CAST(c_nationkey AS VARCHAR) AS constituency_name
        |  FROM customer WHERE c_nationkey <> 13),
        |sp AS (
        |  SELECT r.constituency_name, CAST(year(o_orderdate) AS VARCHAR) AS year,
        |    COUNT(*) AS sc
        |  FROM orders o JOIN roster r ON r.member_code = 'M' || CAST(o.o_custkey AS VARCHAR)
        |  GROUP BY 1, 2),
        |mv AS (
        |  SELECT r.constituency_name, CAST(year(o_orderdate) AS VARCHAR) AS year,
        |    COUNT(*) AS vc
        |  FROM orders o JOIN roster r ON r.member_code = 'M' || CAST(o.o_custkey AS VARCHAR)
        |  WHERE o.o_orderkey % 3 = 0 GROUP BY 1, 2),
        |mc AS (
        |  SELECT constituency_name, COUNT(DISTINCT member_code) AS n
        |  FROM roster GROUP BY 1),
        |years AS (
        |  SELECT DISTINCT year FROM (SELECT year FROM sp UNION ALL SELECT year FROM mv)),
        |grid AS (SELECT constituency_name, year FROM mc CROSS JOIN years)
        |SELECT g.constituency_name, g.year,
        |  CAST(COALESCE(mc.n, 0) AS VARCHAR) AS member_count,
        |  CAST(COALESCE(sp.sc, 0) AS VARCHAR) AS speech_count,
        |  CAST(COALESCE(mv.vc, 0) AS VARCHAR) AS votes_cast_count,
        |  '2026-06-01' AS snapshot_date
        |FROM grid g
        |LEFT JOIN mc USING (constituency_name)
        |LEFT JOIN sp USING (constituency_name, year)
        |LEFT JOIN mv USING (constituency_name, year)
        |ORDER BY constituency_name, year""".stripMargin,

    "q81_content_fact_pool" ->
      """WITH activity AS (
        |  SELECT 'M' || CAST(o_custkey % 50 AS VARCHAR) AS member_code,
        |    CAST(year(o_orderdate) AS VARCHAR) AS year,
        |    CAST(COUNT(*) AS VARCHAR) AS speech_count,
        |    CAST(SUM(o_orderkey % 5) AS VARCHAR) AS votes_cast_count,
        |    CAST(CAST(ROUND(COUNT(*) * 100.0 / (COUNT(*) + 3), 2) AS DECIMAL(7,2)) AS VARCHAR)
        |      AS vote_participation_pct
        |  FROM orders GROUP BY 1, 2),
        |names AS (
        |  SELECT 'M' || CAST(code AS VARCHAR) AS member_code,
        |    CASE WHEN code % 10 = 0 THEN '' ELSE name END AS full_name
        |  FROM (SELECT c_custkey % 50 AS code, MIN(c_name) AS name
        |        FROM customer GROUP BY 1)),
        |base AS (
        |  SELECT a.*, CASE WHEN trim(COALESCE(n.full_name, '')) = ''
        |    THEN a.member_code ELSE trim(n.full_name) END AS display_name
        |  FROM activity a LEFT JOIN names n USING (member_code)),
        |facts AS (
        |  SELECT 'member_speech_count_yearly' AS fact_type, member_code, year,
        |    'speech_count' AS metric_name, speech_count AS metric_value,
        |    display_name || ' made ' || speech_count || ' speeches in ' || year || '.' AS headline
        |  FROM base WHERE CAST(speech_count AS DOUBLE) > 0
        |  UNION ALL
        |  SELECT 'member_votes_cast_yearly', member_code, year,
        |    'votes_cast_count', votes_cast_count,
        |    display_name || ' cast ' || votes_cast_count || ' votes in ' || year || '.'
        |  FROM base WHERE CAST(votes_cast_count AS DOUBLE) > 0
        |  UNION ALL
        |  SELECT 'member_vote_participation_yearly', member_code, year,
        |    'vote_participation_pct', vote_participation_pct,
        |    display_name || ' voted in ' || vote_participation_pct || '% of divisions in ' || year || '.'
        |  FROM base WHERE CAST(vote_participation_pct AS DOUBLE) > 0)
        |SELECT
        |  'fact:' || substring(sha256(lower(fact_type || '|' || member_code || '|' || year)), 1, 24) AS fact_id,
        |  fact_type, 'member' AS entity_type, member_code AS entity_id,
        |  year || '-01-01' AS period_start, year || '-12-31' AS period_end,
        |  headline, metric_name, metric_value,
        |  'gold_member_activity_yearly' AS source_table,
        |  member_code || '|' || year AS source_key,
        |  '2026-06-01' AS snapshot_date
        |FROM facts
        |ORDER BY fact_type, entity_id, period_start""".stripMargin,
  )
}
