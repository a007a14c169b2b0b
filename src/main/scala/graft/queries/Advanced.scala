package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.compat.CompatOps
import graft.functions.Fns
import graft.operators.{DqOps, FlattenOps, SentenceOps}
import graft.operators.FlattenOps.{FieldSpec, FlattenSpec}

/** Second wave of oracle-checked queries: the flatten engine round-trip
  * (N1/N2), compat adapters (P2), previous-completed-week calendar (F13),
  * DQ summary (A11), and a rows-only sentence-candidate pipeline (F11/W4).
  */
object Advanced {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private val baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // N1/N2 flatten round-trip: orders nested into per-customer JSON
    // payloads, then FlattenSpec-exploded back out — output must equal
    // the original relation (which is what the oracle asserts directly).
    "q39_flatten_roundtrip" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val payloads = o.groupBy(col("o_custkey"))
        .agg(to_json(struct(struct(
          col("o_custkey").as("code"),
          collect_list(struct(col("o_orderkey").as("okey"), col("o_orderstatus").as("st")))
            .as("orders")).as("customer"))).as("payload"))
      val spec = FlattenSpec(
        wrapperKeys = Seq("customer", "client"),
        explodePath = Some("orders"),
        parentFields = Seq(FieldSpec("custkey", Seq("code"))),
        fields = Seq(FieldSpec("orderkey", Seq("okey")), FieldSpec("status", Seq("st", "state"))))
      FlattenOps.flatten(payloads, "payload", spec)
        .select(col("custkey").cast("long").as("custkey"),
          col("orderkey").cast("long").as("orderkey"), col("status"))
        .orderBy("custkey", "orderkey")
    }),

    // P2 compat adapter over a member-votes-shaped projection of orders.
    "q40_compat_member_votes" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val mv = o.select(
        concat(lit("m"), col("o_custkey")).as("member_code"),
        concat(lit("Member "), col("o_custkey")).as("member_name"),
        when(col("o_orderkey") % 2 === 0, concat(lit("d"), col("o_orderkey")))
          .otherwise(lit("")).as("division_id"),
        concat(lit("v"), col("o_orderkey")).as("vote_id"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("division_date"),
        col("o_orderstatus").as("vote_label"),
        col("o_orderpriority").as("party_name_at_vote"),
        lit("C1").as("constituency_name_at_vote"),
        lit("2026-01-01").as("snapshot_date"))
      CompatOps.memberVotesCompat(mv)
    }),

    // F13 previous-completed-week target + week id.
    "q41_prev_completed_week" -> ((s, dir) => {
      t(s, dir, "orders").select(
          col("o_orderkey").cast("long").as("orderkey"),
          Fns.weekId(Fns.prevCompletedWeekTarget(to_date(col("o_orderdate")))).as("prev_week_id"))
        .orderBy("orderkey")
    }),

    // A11 one-pass DQ summary with injected blank/duplicate pks.
    "q42_dq_summary" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        when(col("o_orderkey") % 100 === 0, lit(""))
          .otherwise((col("o_orderkey") % 5000).cast("string")).as("pk"),
        when(col("o_orderkey") % 7 === 0, lit("")).otherwise(col("o_orderpriority")).as("v"))
      DqOps.summary(o, Seq("pk"), Seq("v"))
    }),

    // F11/W4 sentence candidates over documents. The general split regex
    // needs lookarounds DuckDB's RE2 lacks (edge cases pinned by the golden
    // splitter spec) — but THIS corpus is punctuation- and capital-free
    // word soup, so the only split point is the appended ". C", and the
    // oracle reconstructs both sentences directly.
    "q43_sentence_candidates" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(Fns.weekId(to_date(lit("2026-01-05"))).cast("string").as("week_id"),
          concat(lit("src_"), col("source")).as("speaker"),
          concat(col("text"), lit(". Closing Remark here!")).as("text"))
      SentenceOps.buildCandidates(docs, "week_id", "speaker", "text", minWords = 1, maxWords = 500)
        .groupBy("week_id", "speaker_name")
        .agg(count(lit(1)).as("n_candidates"))
        .orderBy("speaker_name")
    }),
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] = baseQueries ++ extraQueries

  private lazy val extraQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J6 fuzzy name join: normalized-name key, ambiguous keys dropped
    // entirely (pandas keep=False), then inner join
    // (build_member_profile_metrics.py:100-103).
    "q44_fuzzy_name_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      // lookup with messy casing/spacing; nation 0 customers duplicated →
      // their keys become ambiguous and must drop out of the join
      val lookup = c.select(upper(col("c_name")).as("raw_name"),
          col("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("balance"))
        .unionByName(c.filter(col("c_nationkey") === 0)
          .select(concat(lit("  "), col("c_name")).as("raw_name"),
            lit(java.math.BigDecimal.ZERO).cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("balance")))
      val normalized = lookup.withColumn("name_key",
        regexp_replace(lower(trim(col("raw_name"))), "\\s+", " "))
      val unambiguous = normalized.groupBy("name_key")
        .agg(count(lit(1)).as("n"), max(col("balance")).as("balance"))
        .filter(col("n") === 1).drop("n")
      c.withColumn("name_key", regexp_replace(lower(trim(col("c_name"))), "\\s+", " "))
        .join(unambiguous, Seq("name_key"))
        .select(col("c_custkey").cast("long").as("custkey"),
          round(col("balance").cast("double"), 2).as("balance"))
        .orderBy("custkey")
    }),

    // Skew-safe two-stage salted aggregation; decimal sums are associative
    // so the salted result is exactly the plain groupBy (the oracle).
    "q45_salted_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      graft.operators.SkewOps.saltedCountSum(li, Seq("l_returnflag"),
          col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)), buckets = 16)
        .select(col("l_returnflag"), col("n_rows").cast("long").as("n_rows"),
          round(col("total").cast(org.apache.spark.sql.types.DecimalType(18, 2)).cast("double"), 2).as("total"))
        .orderBy("l_returnflag")
    }),

    // Skew-safe salted equi-join: lineitem ⋈ supplier with the hot-key
    // salt + replicate pattern, rolled up per nation. The join result is
    // exactly the plain join (the oracle); salting only changes the
    // per-reducer ceiling.
    "q57_skew_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_quantity"))
      val supp = t(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      graft.operators.SkewOps.saltedJoin(li, supp, Seq("l_suppkey"), buckets = 8)
        .groupBy(col("s_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast(org.apache.spark.sql.types.DecimalType(18, 2)).cast("double"), 2).as("total_qty"))
        .orderBy("nationkey")
    }),

    // Bloom-pruned semi-join: lineitem rows for high-value orders. The
    // sketch prunes the fact scan before the shuffle; the exact semi
    // join removes false positives, so the result is the plain semi
    // join (the oracle).
    "q74_bloom_semijoin" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val hot = t(s, dir, "orders").filter(col("o_totalprice") > 200000.0)
      graft.operators.PruneOps.bloomSemiJoin(li, hot, "l_orderkey", "o_orderkey",
          expectedItems = 200000L, fpp = 0.01)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast(org.apache.spark.sql.types.DecimalType(18, 2)).cast("double"), 2).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // W-family event sequencing: previous event + gap per user (lag).
    "q46_event_lag" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      ev.select(col("user_id").cast("long").as("user_id"),
          col("event_id").cast("long").as("event_id"),
          col("ts"), col("event_type"))
        .withColumn("prev_event_type", lag(col("event_type"), 1).over(w))
        .withColumn("gap_us", (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)))
        .select(col("user_id"), col("event_id"),
          coalesce(col("prev_event_type"), lit("")).as("prev_event_type"),
          coalesce(col("gap_us"), lit(-1L)).as("gap_us"))
        .orderBy("user_id", "event_id")
    }),

    // Funnel: users whose first signup precedes their first purchase.
    "q47_signup_purchase_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val firsts = ev.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "signup", unix_micros(col("ts")))).as("first_signup"),
          min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("first_purchase"))
      firsts.agg(
        count(lit(1)).as("n_users"),
        count(when(col("first_signup").isNotNull, 1)).as("n_signed_up"),
        count(when(col("first_signup").isNotNull && col("first_purchase").isNotNull &&
          col("first_signup") < col("first_purchase"), 1)).as("n_converted"))
    }))

  val oracles: Map[String, String] = Map(
    "q44_fuzzy_name_join" ->
      """WITH lookup AS (
        |  SELECT upper(c_name) AS raw_name, CAST(c_acctbal AS DECIMAL(18,2)) AS balance FROM customer
        |  UNION ALL
        |  SELECT '  ' || c_name, CAST(0 AS DECIMAL(18,2)) FROM customer WHERE c_nationkey = 0),
        |normalized AS (SELECT regexp_replace(lower(trim(raw_name)), '\s+', ' ', 'g') AS name_key, balance FROM lookup),
        |unambiguous AS (
        |  SELECT name_key, MAX(balance) AS balance FROM normalized
        |  GROUP BY name_key HAVING COUNT(*) = 1)
        |SELECT CAST(c_custkey AS BIGINT) AS custkey, ROUND(CAST(u.balance AS DOUBLE), 2) AS balance
        |FROM customer
        |JOIN unambiguous u ON regexp_replace(lower(trim(c_name)), '\s+', ' ', 'g') = u.name_key
        |ORDER BY custkey""".stripMargin,

    "q45_salted_agg" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  ROUND(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE), 2) AS total
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q74_bloom_semijoin" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  ROUND(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 200000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q57_skew_join" ->
      """SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  ROUND(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE), 2) AS total_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY nationkey""".stripMargin,

    "q46_event_lag" ->
      """WITH e AS (SELECT CAST(user_id AS BIGINT) AS user_id, CAST(event_id AS BIGINT) AS event_id,
        |    CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |lagged AS (SELECT user_id, event_id,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_event_type,
        |    epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_us
        |  FROM e)
        |SELECT user_id, event_id, COALESCE(prev_event_type, '') AS prev_event_type,
        |  CAST(COALESCE(gap_us, -1) AS BIGINT) AS gap_us
        |FROM lagged ORDER BY user_id, event_id""".stripMargin,

    "q47_signup_purchase_funnel" ->
      """WITH firsts AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS first_signup,
        |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS first_purchase
        |  FROM events GROUP BY user_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(COUNT(*) FILTER (WHERE first_signup IS NOT NULL) AS BIGINT) AS n_signed_up,
        |  CAST(COUNT(*) FILTER (WHERE first_signup IS NOT NULL AND first_purchase IS NOT NULL
        |    AND first_signup < first_purchase) AS BIGINT) AS n_converted
        |FROM firsts""".stripMargin,

    "q39_flatten_roundtrip" ->
      """SELECT CAST(o_custkey AS BIGINT) AS custkey, CAST(o_orderkey AS BIGINT) AS orderkey,
        |  o_orderstatus AS status
        |FROM orders ORDER BY custkey, orderkey""".stripMargin,

    "q40_compat_member_votes" ->
      """SELECT 'm' || CAST(o_custkey AS VARCHAR) AS memberCode,
        |  'Member ' || CAST(o_custkey AS VARCHAR) AS member_name,
        |  CASE WHEN o_orderkey % 2 = 0 THEN 'd' || CAST(o_orderkey AS VARCHAR)
        |       ELSE 'v' || CAST(o_orderkey AS VARCHAR) END AS unique_vote_id,
        |  strftime(o_orderdate, '%Y-%m-%d') AS "date",
        |  o_orderstatus AS vote,
        |  o_orderpriority AS party,
        |  'C1' AS constituency,
        |  'oireachtas_unified' AS source,
        |  '2026-01-01' AS snapshot_date
        |FROM orders ORDER BY "date", unique_vote_id, memberCode""".stripMargin,

    "q41_prev_completed_week" ->
      """WITH d AS (SELECT CAST(o_orderkey AS BIGINT) AS orderkey, CAST(o_orderdate AS DATE) AS od FROM orders),
        |tgt AS (SELECT orderkey,
        |    CASE WHEN isodow(od) = 7 THEN od ELSE od - CAST(isodow(od) AS INT) END AS td FROM d),
        |c AS (SELECT orderkey, td,
        |    make_date(CAST(year(td) AS INT), 1, 1) AS jan1,
        |    make_date(CAST(year(td) - 1 AS INT), 1, 1) AS pjan1 FROM tgt),
        |f AS (SELECT orderkey, td,
        |    jan1 + CAST((8 - isodow(jan1)) % 7 AS INTEGER) AS fm,
        |    pjan1 + CAST((8 - isodow(pjan1)) % 7 AS INTEGER) AS pfm FROM c)
        |SELECT orderkey,
        |  CAST(CASE WHEN td < fm
        |    THEN (year(td) - 1) * 100 + FLOOR(date_diff('day', pfm, td) / 7.0) + 1
        |    ELSE year(td) * 100 + FLOOR(date_diff('day', fm, td) / 7.0) + 1 END AS BIGINT) AS prev_week_id
        |FROM f ORDER BY orderkey""".stripMargin,

    "q43_sentence_candidates" ->
      """WITH docs AS (
        |  SELECT 'src_' || source AS speaker,
        |    regexp_replace(trim(text), '\s+', ' ', 'g') AS t
        |  FROM documents),
        |sent AS (
        |  SELECT speaker, t || '.' AS sentence, len(string_split(t, ' ')) AS wc FROM docs
        |  UNION ALL
        |  SELECT speaker, 'Closing Remark here!' AS sentence, 3 AS wc FROM docs),
        |meas AS (
        |  SELECT '202601' AS week_id, speaker, sentence,
        |    substring(sha256('202601' || '||' || speaker || '||' || sentence), 1, 24) AS cid,
        |    lower(sentence) AS dk
        |  FROM sent WHERE wc BETWEEN 1 AND 500),
        |kept AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY week_id, speaker, dk ORDER BY cid) AS rn FROM meas)
        |SELECT week_id, speaker AS speaker_name, CAST(COUNT(*) AS BIGINT) AS n_candidates
        |FROM kept WHERE rn = 1 GROUP BY week_id, speaker
        |ORDER BY speaker_name""".stripMargin,

    "q42_dq_summary" ->
      """WITH o AS (SELECT
        |    CASE WHEN o_orderkey % 100 = 0 THEN '' ELSE CAST(o_orderkey % 5000 AS VARCHAR) END AS pk,
        |    CASE WHEN o_orderkey % 7 = 0 THEN '' ELSE o_orderpriority END AS v
        |  FROM orders)
        |SELECT CAST(COUNT(*) AS BIGINT) AS row_count,
        |  CAST(COUNT(*) - COUNT(DISTINCT pk) AS BIGINT) AS pk_duplicate_count,
        |  CAST(COUNT(*) FILTER (WHERE TRIM(pk) = '' OR pk IS NULL) AS BIGINT) AS pk_blank_count,
        |  CAST(COUNT(*) FILTER (WHERE v IS NOT NULL AND TRIM(v) <> '') AS BIGINT) AS populated_v
        |FROM o""".stripMargin,
  )
}
