package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.FlattenOps
import graft.silver.{FlattenSpecs, SourceFileOps}

/** Oracle-checked round-trips for the bill/debate satellite flatten specs
  * (SURVEY §2.4 N7) and the source-file inventory: nested JSON payloads are
  * synthesized from the driver's relational tables, flattened through the
  * declarative specs, and the DuckDB oracle reconstructs the expected rows
  * directly from the base tables — including the generated surrogate-id
  * hashes (sha256 prefixes DuckDB can compute).
  */
object SilverFlatten {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // N7 bill_stages: bill wrapper + stages explode + event item wrapper +
    // dates-array min + generated surrogate ids with posexplode index
    // (table_bill_stages.py:162-199).
    "q48_bill_stages_flatten" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val stage = struct(
        struct(
          concat(lit("Stage "), col("l_linenumber")).as("showAs"),
          array(struct(date_format(col("l_shipdate"), "yyyy-MM-dd").as("date"))).as("dates"),
          col("l_linenumber").cast("string").as("progressStage"),
          col("l_returnflag").as("stageOutcome"),
          struct(
            concat(lit("house/"), col("l_suppkey")).as("uri"),
            concat(lit("House "), col("l_suppkey")).as("showAs")).as("house")
        ).as("event"))
      // the synthetic lineitem has duplicate (orderkey, linenumber) pairs —
      // the sort key must cover every payload-distinguishing field so both
      // sides order ties identically (residual ties = identical elements)
      val payloads = li
        .select(col("l_orderkey"), struct(
          col("l_linenumber").as("_k1"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("_k2"),
          col("l_returnflag").as("_k3"),
          col("l_suppkey").as("_k4"),
          stage.as("s")).as("item"))
        .groupBy("l_orderkey")
        .agg(to_json(struct(struct(
          concat(lit("bill/"), col("l_orderkey")).as("uri"),
          transform(sort_array(collect_list(col("item"))), x => x.getField("s")).as("stages")
        ).as("bill"))).as("payload"))
      FlattenSpecs.billStagesTransform(
          FlattenOps.flatten(payloads, "payload", FlattenSpecs.billStages))
        .select(col("bill_id"), col("stage_name"), col("stage_date"),
          col("house_uri"), col("house_name"), col("stage_outcome"),
          col("order_in_bill"), col("stage_index"), col("bill_stage_id"))
        // shuffle barrier: orderBy's range sampler re-executes everything
        // after the last exchange, which here is the whole flatten; with the
        // barrier the sample job reuses this stage's map output instead
        .repartition(col("bill_id"))
        .orderBy("bill_id", "stage_index")
    }),

    // N7 bill_sponsors: by/as sub-objects, bool text, 1-based order and a
    // fully-generated pk hash (table_bill_sponsors.py:162-196).
    "q49_bill_sponsors_flatten" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val sponsor = struct(
        struct(
          struct(
            concat(lit("member/"), col("o_orderkey")).as("uri"),
            concat(lit("Member "), col("o_orderkey")).as("showAs")).as("by"),
          struct(concat(lit("Role "), col("o_orderstatus")).as("showAs")).as("as"),
          (col("o_orderkey") % 2 === 0).as("isPrimary")
        ).as("sponsor"))
      val payloads = o
        .select(col("o_custkey"), struct(col("o_orderkey").as("_k"), sponsor.as("s")).as("item"))
        .groupBy("o_custkey")
        .agg(to_json(struct(struct(
          concat(lit("bill/cust/"), col("o_custkey")).as("uri"),
          transform(sort_array(collect_list(col("item"))), x => x.getField("s")).as("sponsors")
        ).as("bill"))).as("payload"))
      FlattenSpecs.billSponsorsTransform(
          FlattenOps.flatten(payloads, "payload", FlattenSpecs.billSponsors))
        .select(col("bill_id"), col("sponsor_uri"), col("sponsor_name"),
          col("sponsor_role_name"), col("is_primary"), col("sponsor_order"),
          col("bill_sponsor_id"))
        .orderBy(col("bill_id"), col("sponsor_order").cast("long"))
    }),

    // N7 debate_records: debateRecord wrapper, chamber precedence
    // (houseCode → chamber.showAs → house.showAs), http-uri promotion of
    // source urls, per-format source-file ids, contextDate fallback
    // (table_debate_records.py:160-199).
    "q50_debate_records_flatten" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val payloads = o.select(
        to_json(struct(
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("contextDate"),
          struct(
          concat(lit("debate/"), col("o_orderkey")).as("uri"),
          // every 3rd record has no own date → contextDate fallback
          when(col("o_orderkey") % 3 === 0, lit(null).cast("string"))
            .otherwise(date_format(date_add(col("o_orderdate"), 1), "yyyy-MM-dd")).as("date"),
          struct(
            concat(lit("house/"), col("o_custkey") % 7).as("uri"),
            (col("o_custkey") % 7).cast("string").as("houseNo"),
            // every 2nd record lacks houseCode → chamber.showAs wins
            when(col("o_orderkey") % 2 === 0, lit("dail")).otherwise(lit(null).cast("string"))
              .as("houseCode")).as("house"),
          struct(concat(lit("Chamber "), col("o_custkey") % 7).as("showAs")).as("chamber"),
          when(col("o_orderkey") % 5 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("Debate "), col("o_orderkey"))).as("showAs"),
          struct(
            struct(
              // alternate absolute/relative xml uris to exercise promotion
              when(col("o_orderkey") % 2 === 0,
                concat(lit("https://data.example/x"), col("o_orderkey"), lit(".xml")))
                .otherwise(concat(lit("/x"), col("o_orderkey"), lit(".xml"))).as("uri")).as("xml"),
            struct(concat(lit("/p"), col("o_orderkey"), lit(".pdf")).as("url")).as("pdf")
          ).as("formats")
        ).as("debateRecord"))).as("payload"))
      FlattenSpecs.debateRecordsTransform(
          FlattenOps.flatten(payloads, "payload", FlattenSpecs.debateRecords))
        .select("debate_id", "context_date", "debate_date", "chamber", "house_uri",
          "house_no", "house_code", "show_as", "source_xml_uri", "source_xml_url",
          "source_pdf_uri", "source_pdf_url", "source_file_id_xml", "source_file_id_pdf")
        .orderBy("debate_id")
    }),

    // Renderer-context issue counters (instagram/renderer/context.py:83-118):
    // normalized-speaker join against the member lookup (honorific/casing
    // noise normalizes away), NONE/blank issues dropped, counts rolled up
    // per constituency×issue.
    "q52_renderer_issue_counts" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val o = t(s, dir, "orders")
      val members = c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_name").as("full_name"), col("n_name").as("constituency"),
          col("c_mktsegment").as("party"), col("c_custkey").cast("string").as("member_code"))
      val debate = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(
          // honorific + casing + spacing noise the normalizer must strip
          when(col("o_orderkey") % 2 === 0, concat(lit("Deputy "), upper(col("c_name")), lit(" TD")))
            .otherwise(concat(lit("  "), col("c_name"), lit("  "))).as("speaker_name"),
          when(col("o_orderkey") % 7 === 0, lit("NONE"))
            .when(col("o_orderkey") % 11 === 0, lit(""))
            .otherwise(col("o_orderpriority")).as("issue"))
      val mt = graft.gold.RendererContext.buildMemberTable(members,
        s.emptyDataFrame, s.emptyDataFrame)
      graft.gold.RendererContext.issueRecords(debate, mt)
        .groupBy("constituency_key", "issue")
        .agg(count(lit(1)).as("n"))
        .orderBy("constituency_key", "issue")
    }),

    // Source-file inventory over synthesized format columns: extension
    // inference from URLs, content types, safe-slug S3 keys, per-format
    // fan-out rows (table_source_files.py).
    "q51_source_files_inventory" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(
        concat(lit("https://api.example/doc/"), col("doc_id")).as("entity_id"),
        // pdf url only for 2 of 3 docs; extension comes from the url tail
        when(col("doc_id") % 3 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("https://cdn.example/files/d"), col("doc_id"), lit(".pdf")))
          .as("pdf_url"),
        lit(null).cast("string").as("pdf_uri"),
        concat(lit("/files/d"), col("doc_id"), lit(".xml")).as("xml_uri"),
        lit(null).cast("string").as("xml_url"))
      SourceFileOps.inventoryRows(docs, "document", "entity_id",
          Seq(("pdf", "pdf_uri", "pdf_url"), ("xml", "xml_uri", "xml_url")))
        .select("source_file_id", "source_entity_type", "source_entity_id",
          "format_type", "format_uri", "format_url", "s3_key", "content_type",
          "download_status")
        .orderBy("source_entity_id", "format_type")
    }),
  )

  private def stableHashSql(len: Int, parts: String*): String =
    s"substring(sha256(lower(concat_ws('|', ${parts.map(p => s"COALESCE($p, '')").mkString(", ")}))), 1, $len)"

  val oracles: Map[String, String] = Map(
    "q48_bill_stages_flatten" -> {
      val h = stableHashSql(24, "bill_id", "stage_name", "stage_date",
        "order_in_bill", "house_uri", "CAST(stage_index AS VARCHAR)")
      s"""WITH st AS (
        |  SELECT 'bill/' || CAST(l_orderkey AS VARCHAR) AS bill_id,
        |    'Stage ' || CAST(l_linenumber AS VARCHAR) AS stage_name,
        |    strftime(l_shipdate, '%Y-%m-%d') AS stage_date,
        |    'house/' || CAST(l_suppkey AS VARCHAR) AS house_uri,
        |    'House ' || CAST(l_suppkey AS VARCHAR) AS house_name,
        |    l_returnflag AS stage_outcome,
        |    CAST(l_linenumber AS VARCHAR) AS order_in_bill,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, strftime(l_shipdate, '%Y-%m-%d'), l_returnflag, l_suppkey) - 1 AS BIGINT) AS stage_index
        |  FROM lineitem)
        |SELECT *, 'generated:bill_stage:' || $h AS bill_stage_id
        |FROM st ORDER BY bill_id, stage_index""".stripMargin
    },

    "q49_bill_sponsors_flatten" -> {
      val h = stableHashSql(24, "bill_id", "sponsor_uri", "sponsor_name",
        "sponsor_role_uri", "sponsor_role_name", "is_primary", "sponsor_order")
      s"""WITH sp AS (
        |  SELECT 'bill/cust/' || CAST(o_custkey AS VARCHAR) AS bill_id,
        |    'member/' || CAST(o_orderkey AS VARCHAR) AS sponsor_uri,
        |    'Member ' || CAST(o_orderkey AS VARCHAR) AS sponsor_name,
        |    CAST(NULL AS VARCHAR) AS sponsor_role_uri,
        |    'Role ' || o_orderstatus AS sponsor_role_name,
        |    CASE WHEN o_orderkey % 2 = 0 THEN 'true' ELSE 'false' END AS is_primary,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS VARCHAR) AS sponsor_order
        |  FROM orders)
        |SELECT bill_id, sponsor_uri, sponsor_name, sponsor_role_name, is_primary,
        |  sponsor_order, 'bill_sponsor:' || $h AS bill_sponsor_id
        |FROM sp ORDER BY bill_id, CAST(sponsor_order AS BIGINT)""".stripMargin
    },

    "q50_debate_records_flatten" -> {
      val hXml = stableHashSql(24, "'debate'", "debate_id", "'xml'", "source_xml_uri", "source_xml_url")
      val hPdf = stableHashSql(24, "'debate'", "debate_id", "'pdf'", "source_pdf_uri", "source_pdf_url")
      s"""WITH d AS (
        |  SELECT 'debate/' || CAST(o_orderkey AS VARCHAR) AS debate_id,
        |    strftime(o_orderdate, '%Y-%m-%d') AS context_date,
        |    CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
        |         ELSE strftime(o_orderdate + INTERVAL 1 DAY, '%Y-%m-%d') END AS debate_date,
        |    CASE WHEN o_orderkey % 2 = 0 THEN 'dail'
        |         ELSE 'Chamber ' || CAST(o_custkey % 7 AS VARCHAR) END AS chamber,
        |    'house/' || CAST(o_custkey % 7 AS VARCHAR) AS house_uri,
        |    CAST(o_custkey % 7 AS VARCHAR) AS house_no,
        |    CASE WHEN o_orderkey % 2 = 0 THEN 'dail' END AS house_code,
        |    CASE WHEN o_orderkey % 2 = 0 THEN 'https://data.example/x' || CAST(o_orderkey AS VARCHAR) || '.xml'
        |         ELSE '/x' || CAST(o_orderkey AS VARCHAR) || '.xml' END AS source_xml_uri,
        |    CASE WHEN o_orderkey % 2 = 0 THEN 'https://data.example/x' || CAST(o_orderkey AS VARCHAR) || '.xml' END AS source_xml_url,
        |    '/p' || CAST(o_orderkey AS VARCHAR) || '.pdf' AS source_pdf_uri,
        |    '/p' || CAST(o_orderkey AS VARCHAR) || '.pdf' AS source_pdf_url,
        |    o_orderkey AS ok
        |  FROM orders),
        |d2 AS (
        |  SELECT *, CASE WHEN ok % 5 = 0 THEN chamber || ' — ' || debate_date
        |                 ELSE 'Debate ' || CAST(ok AS VARCHAR) END AS show_as
        |  FROM d)
        |SELECT debate_id, context_date, debate_date, chamber, house_uri, house_no,
        |  house_code, show_as, source_xml_uri, source_xml_url, source_pdf_uri,
        |  source_pdf_url,
        |  'source_file:' || $hXml AS source_file_id_xml,
        |  'source_file:' || $hPdf AS source_file_id_pdf
        |FROM d2 ORDER BY debate_id""".stripMargin
    },

    "q52_renderer_issue_counts" ->
      """WITH norm AS (
        |  SELECT c_custkey,
        |    trim(regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(lower(trim(c_name)), '&', ' and ', 'g'),
        |        '[^a-z0-9]+', ' ', 'g'),
        |      '\b(td|teachta d[aá]la|minister|deputy)\b', ' ', 'g'),
        |    '\s+', ' ', 'g')) AS member_key
        |  FROM customer),
        |members AS (
        |  SELECT norm.member_key,
        |    trim(regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(lower(trim(n_name)), '&', ' and ', 'g'),
        |        '[^a-z0-9]+', ' ', 'g'),
        |      '\b(td|teachta d[aá]la|minister|deputy)\b', ' ', 'g'),
        |    '\s+', ' ', 'g')) AS constituency_key,
        |    ROW_NUMBER() OVER (PARTITION BY norm.member_key ORDER BY CAST(c_custkey AS VARCHAR) DESC) AS rn
        |  FROM customer JOIN norm USING (c_custkey)
        |  JOIN nation ON c_nationkey = n_nationkey),
        |lookup AS (SELECT member_key, constituency_key FROM members WHERE rn = 1),
        |debate AS (
        |  SELECT
        |    CASE WHEN o_orderkey % 2 = 0 THEN 'Deputy ' || upper(c_name) || ' TD'
        |         ELSE '  ' || c_name || '  ' END AS speaker,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'NONE'
        |         WHEN o_orderkey % 11 = 0 THEN ''
        |         ELSE o_orderpriority END AS issue
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |recs AS (
        |  SELECT
        |    trim(regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(lower(trim(speaker)), '&', ' and ', 'g'),
        |        '[^a-z0-9]+', ' ', 'g'),
        |      '\b(td|teachta d[aá]la|minister|deputy)\b', ' ', 'g'),
        |    '\s+', ' ', 'g')) AS member_key,
        |    trim(issue) AS issue
        |  FROM debate
        |  WHERE trim(issue) <> '' AND upper(trim(issue)) <> 'NONE')
        |SELECT l.constituency_key, r.issue, CAST(COUNT(*) AS BIGINT) AS n
        |FROM recs r JOIN lookup l ON r.member_key = l.member_key
        |WHERE r.member_key <> ''
        |GROUP BY l.constituency_key, r.issue
        |ORDER BY l.constituency_key, r.issue""".stripMargin,

    "q51_source_files_inventory" -> {
      // safe_slug: strip scheme, keep [alnum-_.], else '-', trim dashes
      def slugSql(c: String) =
        s"regexp_replace(regexp_replace(regexp_replace(trim($c), 'https://|http://', '', 'g'), '[^A-Za-z0-9\\-_.]', '-', 'g'), '(^-+)|(-+$$)', '', 'g')"
      val hPdf = stableHashSql(24, "'document'", "entity_id", "'pdf'", "pdf_url", "pdf_url")
      val hXml = stableHashSql(24, "'document'", "entity_id", "'xml'", "xml_uri", "CAST(NULL AS VARCHAR)")
      s"""WITH base AS (
        |  SELECT 'https://api.example/doc/' || CAST(doc_id AS VARCHAR) AS entity_id,
        |    CASE WHEN doc_id % 3 = 0 THEN NULL
        |         ELSE 'https://cdn.example/files/d' || CAST(doc_id AS VARCHAR) || '.pdf' END AS pdf_url,
        |    '/files/d' || CAST(doc_id AS VARCHAR) || '.xml' AS xml_uri
        |  FROM documents),
        |pdf AS (
        |  SELECT 'source_file:' || $hPdf AS source_file_id,
        |    'document' AS source_entity_type, entity_id AS source_entity_id,
        |    'pdf' AS format_type, pdf_url AS format_uri, pdf_url AS format_url,
        |    'raw/oireachtas_unified/source_files/document/' || ${slugSql("entity_id")} ||
        |      '/' || ${slugSql("'source_file:' || " + hPdf)} || '.pdf' AS s3_key,
        |    'application/pdf' AS content_type, 'not_downloaded' AS download_status
        |  FROM base WHERE pdf_url IS NOT NULL),
        |xml AS (
        |  SELECT 'source_file:' || $hXml AS source_file_id,
        |    'document' AS source_entity_type, entity_id AS source_entity_id,
        |    'xml' AS format_type, xml_uri AS format_uri,
        |    'https://data.oireachtas.ie' || xml_uri AS format_url,
        |    'raw/oireachtas_unified/source_files/document/' || ${slugSql("entity_id")} ||
        |      '/' || ${slugSql("'source_file:' || " + hXml)} || '.xml' AS s3_key,
        |    'application/xml' AS content_type, 'not_downloaded' AS download_status
        |  FROM base)
        |SELECT * FROM pdf UNION ALL SELECT * FROM xml
        |ORDER BY source_entity_id, format_type""".stripMargin
    },
  )
}
