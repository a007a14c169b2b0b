package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Fns, NormalizeNameExpr, Udfs}
import graft.gold.{GoldMarts, ProfileMetrics}
import graft.operators.{EnrichOps, ExperimentOps, FlattenOps}
import graft.silver.FlattenSpecs
import graft.sources.XmlDebateWalker

/** Driver-oracle rows for operators previously verified only by golden
  * fixtures / ScalaTest ports: the Akoma-Ntoso XML debate walk (N6), the
  * NFKD normalize-name fuzzy-join key (F1/F2 as J6's key), and the
  * fixed-key tally explode (N4). Each query builds its structured input
  * deterministically from the testdata tables so the DuckDB oracle can
  * reconstruct the expected output without an XML/JSON parser: the input
  * fields are sanitized to an alphabet where the walker/flattener's
  * extraction is exactly invertible in SQL.
  */
object Parity {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Sanitized lowercase fragment of `text` at [start, start+len): strips
    * everything outside [a-z0-9 ], collapses whitespace — the same
    * normalization XmlDebateWalker.normText applies, so embedding the
    * fragment in XML round-trips it byte-identically.
    */
  private def frag(prefix: String, start: Int, len: Int) =
    trim(concat(lit(prefix + " "), trim(regexp_replace(
      regexp_replace(substring(col("text"), start, len), "[^a-z0-9 ]", " "),
      "\\s+", " "))))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // N6 end-to-end with a hash oracle: one synthetic Akoma-Ntoso debate
    // per document (reference extract/oireachtas/xml_debates.py:31-225) —
    // a joinable section holding speech 1 (by-ref + <from> + TLCPerson
    // member href) and a nested non-join "division" section holding
    // speech 2 (ref-derived speaker fallback, no person entry). The
    // walker must thread the section stack (division joins to the outer
    // section), the speech-order counter, the root xml:lang, and the
    // reference stable_hash speech ids — all reconstructed by the oracle.
    "q85_xml_debate_walk" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val docs = d.select(
        concat(lit("deb-"), col("doc_id")).as("debate_id"),
        col("lang"),
        concat(lit("pa"), col("doc_id")).as("pid"),
        concat(lit("M"), col("doc_id") % 101).as("mcode"),
        concat(lit("Deputy "), col("source")).as("speaker"),
        col("source"),
        frag("alpha", 1, 120).as("frag1"),
        frag("beta", 121, 120).as("frag2"))
      val xml = concat(
        lit("<akomaNtoso xml:lang=\""), col("lang"), lit("\"><debate><meta><references>"),
        lit("<TLCPerson eId=\""), col("pid"),
        lit("\" href=\"https://example.org/member/id/"), col("mcode"),
        lit("\" showAs=\""), col("speaker"), lit("\"/></references></meta><debateBody>"),
        lit("<debateSection eId=\"dbs1\" name=\"main topic\">"),
        lit("<speech by=\"#"), col("pid"), lit("\"><from>"), col("speaker"),
        lit("</from><p>"), col("frag1"), lit("</p></speech>"),
        lit("<debateSection eId=\"dbs2\" name=\"division\">"),
        lit("<speech by=\"#pb_"), col("source"), lit("\"><p>"), col("frag2"),
        lit("</p></speech></debateSection></debateSection></debateBody></debate></akomaNtoso>"))
      val triples = docs
        .select(col("debate_id"), lit("2024-05-01").as("debate_date"), xml.as("xml"))
        .as[(String, String, String)]
      XmlDebateWalker.walkDataset(triples).toDF()
        .orderBy("debate_id", "speech_order")
    }),

    // F1/F2 as the J6 join key, NFKD exercised for real: roster names are
    // accent-mangled (translate to á/é/ö) and mentions add case + padding
    // noise; only the Catalyst normalize_name expression (NFKD fold +
    // lower + trim + whitespace collapse, reference normalize.py:39-44)
    // recovers the key. Customers at custkey%97==0 get a second roster
    // spelling that normalizes identically → ambiguous → dropped entirely
    // (pandas keep=False semantics), so their mentions must not match.
    "q86_nfkd_name_join" -> ((s, dir) => {
      NormalizeNameExpr.register(s)
      val c = t(s, dir, "customer")
      val roster = c.select(col("c_custkey").cast("long").as("roster_id"),
          col("c_name").as("raw_name"))
        .unionByName(c.filter(col("c_custkey") % 97 === 0)
          .select((col("c_custkey") + 9000000L).as("roster_id"),
            translate(col("c_name"), "aeo", "áéö").as("raw_name")))
      val unambiguous = roster
        .withColumn("name_key", NormalizeNameExpr.normalizeName(col("raw_name")))
        .groupBy("name_key")
        .agg(count(lit(1)).as("n"), min(col("roster_id")).as("roster_id"))
        .filter(col("n") === 1).drop("n")
      c.select(col("c_custkey").cast("long").as("mention_id"),
          concat(lit("  "), translate(upper(col("c_name")), "AEO", "ÁÉÖ"), lit("   "))
            .as("mention"))
        .withColumn("name_key", NormalizeNameExpr.normalizeName(col("mention")))
        .join(unambiguous, Seq("name_key"))
        .select(col("mention_id"), col("roster_id"), col("name_key"))
        .orderBy("mention_id")
    }),

    // N4 with a hash oracle: the fixed-key tally explode
    // (table_division_tallies.py:171-195) over synthetic ta/nil/staon
    // payloads built from orders — ta has a 2-member array and a
    // sometimes-null API tally (coalesce to array length), nil a 1-member
    // array, staon no member array at all (count falls back to 0), so
    // every branch of member_count/tally_mismatch is exercised.
    "q87_tally_explode" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val payloads = o.select(to_json(struct(
        concat(lit("v"), col("o_orderkey")).as("voteId"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("date"),
        struct(lit("Ta").as("showAs"),
          when(col("o_orderkey") % 4 === 0, lit(null).cast("long"))
            .otherwise(col("o_orderkey") % 5).as("tally"),
          array(concat(lit("m"), col("o_custkey")),
            concat(lit("m"), col("o_orderkey") % 50)).as("members")).as("taVotes"),
        struct(lit("Nil").as("showAs"),
          when(col("o_orderkey") % 6 === 0, lit(null).cast("long"))
            .otherwise(col("o_orderkey") % 3).as("tally"),
          array(concat(lit("n"), col("o_custkey"))).as("members")).as("nilVotes"),
        struct(lit("Staon").as("showAs"),
          (col("o_orderkey") % 7).as("tally")).as("staonVotes"))).as("payload"))
      FlattenSpecs.tallyKinds.map { case (kind, key) =>
        FlattenSpecs.tallyTransform(kind)(
          FlattenOps.flatten(payloads, "payload", FlattenSpecs.tallySpec(kind, key)))
          .select(col("vote_id"), col("division_date"), col("vote_code"),
            col("vote_label"), col("member_count"), col("tally_mismatch"),
            col("division_tally_id"))
      }.reduce(_.unionByName(_)).orderBy("vote_id", "vote_code")
    }),

    // F18 vote-label canonicalization, F8 URL absolutization, and the F10
    // BPE-ish token counter, each across every input branch (accented /
    // cased labels, blank / absolute / rooted / relative URLs).
    "q88_scalar_canon" -> ((s, dir) => {
      val labels = array(Seq("Tá", "TA", "yes", "Aye", "Níl", "NIL", "no",
        "STAON", "Abstain", "Maybe").map(lit): _*)
      val k = col("o_orderkey")
      t(s, dir, "orders").select(
          k.cast("long").as("okey"),
          Fns.voteKind(element_at(labels, (k % 10 + 1).cast("int"))).as("vote_kind"),
          Fns.normalizeUrl(
            when(k % 4 === 0, lit(""))
              .when(k % 4 === 1, concat(lit("https://ex.org/p"), k))
              .when(k % 4 === 2, concat(lit("/path/"), k))
              .otherwise(concat(lit("rel/"), k)),
            "https://base.example").as("url"),
          Fns.tokenCount(col("o_orderpriority")).cast("long").as("n_tokens"))
        .orderBy("okey")
    }),

    // L1 row enrich under a driver oracle: the mapPartitions machinery
    // (template render → per-partition client → citation strip →
    // whitespace collapse → word clamp, llm_table_runner.py:118-130) runs
    // for real against a deterministic stub client whose reply the oracle
    // reconstructs in SQL.
    "q89_enrich_clean" -> ((s, dir) => {
      val cfg = EnrichOps.EnrichConfig(idCol = "doc_id",
        varCols = Seq("source", "text"), outputCol = "summary",
        promptTemplate = "summarize {source}: {text}",
        maxWords = 25, stripCitations = true)
      val docs = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("source"), col("text"))
      EnrichOps.enrichRows(docs, cfg,
          () => new EnrichOps.StubModelClient(p => "verdict [1] " + p + "  [22] trailing  padding"))
        .select(col("doc_id"), col("summary"))
        .orderBy("doc_id")
    }),

    // L2 closed-set classification under a driver oracle: enrich with a
    // stub whose reply embeds the document's own words, then canonicalize
    // by ordered substring containment with fallback
    // (speech_issue_classifier.py:52-78,172-181).
    "q90_classify_labels" -> ((s, dir) => {
      val cfg = EnrichOps.EnrichConfig(idCol = "doc_id",
        varCols = Seq("text"), outputCol = "label", promptTemplate = "{text}")
      val docs = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      EnrichOps.classifyRows(docs, cfg, labels = Seq("agg", "join", "scan"),
          fallback = "other",
          () => new EnrichOps.StubModelClient(p =>
            "the reply: " + p.substring(0, math.min(p.length, 60))))
        .select(col("doc_id"), col("label"))
        .orderBy("doc_id")
    }),

    // F6/S9 record hashing under a driver oracle: the canonical-JSON
    // re-serialization (sorted keys at every depth, compact separators,
    // normalize.py:68-81) feeding sha256 — input built with keys
    // deliberately OUT of order so only a true canonical sort matches.
    "q91_record_hash" -> ((s, dir) => {
      val payload = to_json(struct(
        struct(col("source").as("s"), substring(col("text"), 1, 30).as("a")).as("z"),
        col("lang").as("a")))
      t(s, dir, "documents").select(
          col("doc_id").cast("long").as("doc_id"),
          Udfs.canonicalRecordHash(payload, lit(24)).as("canon_hash"),
          Udfs.stableRecordHash(array(lit("kb"), lit("ka")),
            array(col("source"), col("lang"))).as("rec_hash"))
        .orderBy("doc_id")
    }),

    // L3 batch scoring under a driver oracle: per-group JSON batches with
    // echo-back validation, retry, and BISECTION
    // (ridiculous_sentences_weekly.py:296-403) run for real — the stub
    // scores each candidate as a pure function of its sentence but omits
    // "poisoned" ids (doc_id % 250 == 0) from every reply, so their
    // batches fail echo-back, bisect down to singletons, and surface as
    // null scores while every batchmate still gets its deterministic
    // score. Ragged batches via batchSize=7 over 25-doc groups.
    "q92_score_batches" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(
        col("source").as("grp"),
        col("doc_id").cast("string").as("cand_id"),
        col("text").as("sentence"))
      val stub = () => new EnrichOps.StubModelClient({ prompt =>
        val payload = prompt.substring(prompt.indexOf("Candidates:\n") + "Candidates:\n".length)
        val cands = graft.io.StableJson.parse(payload)
          .asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[String, Any]])
        val good = cands.filterNot(c =>
          String.valueOf(c("candidate_id")).toLong % 250 == 0)
        graft.io.StableJson.write(good.map(c => Map(
          "candidate_id" -> String.valueOf(c("candidate_id")),
          "score" -> (String.valueOf(c("sentence")).length % 100 + 1))))
      })
      EnrichOps.scoreBatches(docs, "grp", "cand_id", "sentence",
          batchSize = 7, maxRetries = 2, clientFactory = stub)
        .orderBy("grp", "cand_id")
    }),

    // L4/A10 under a driver oracle: the full experiment pipeline —
    // sentence fan-out × prompt variants, deterministic scoring, per-
    // (variant, week) top-k, and the summary mart
    // (ridiculous_sentences_weekly.py:576-700). The corpus is
    // punctuation-free word soup (the q43 device), so the only split
    // point is the appended closing sentence and the oracle reconstructs
    // the candidate set, ranks, and aggregates exactly.
    "q93_experiment_summary" -> ((s, dir) => {
      val speeches = t(s, dir, "documents").select(
        (lit(202601) + col("doc_id") % 2).cast("string").as("week_id"),
        concat(lit("sp_"), col("source")).as("speaker_name"),
        concat(col("text"), lit(". Closing Remark here!")).as("speech_text"))
      val variants = Seq(
        ExperimentOps.PromptVariant("v1", "famA", "direct"),
        ExperimentOps.PromptVariant("v2", "famB", "witty"))
      val scorer = (df: DataFrame) =>
        df.withColumn("score", (length(col("quote")) % 97 + 1).cast("int"))
      val (_, _, summary) = ExperimentOps.runExperiments(speeches, variants, scorer, topN = 3)
      summary
    }),

    // J5/W2/A7/A8/F15 as one mart under a driver oracle: the full member
    // profile build (build_member_profile_metrics.py:76-160) — speech
    // counts with the GLOBAL dense rank (W2: safe only because input is
    // one row per member), top-issue-per-member, distinct-vote
    // participation with int-rounded pct, photo/zero-fill fallbacks —
    // over synthetic rosters carved from customer/orders. Blank member
    // codes, blank vote ids, NONE/blank issues exercise every filter.
    "q95_profile_metrics" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val members = c.select(
        concat(lit("M"), col("c_custkey")).as("member_code"),
        col("c_name").as("full_name"),
        concat(lit("CON"), col("c_custkey") % 9).as("constituency"),
        concat(lit("P"), col("c_custkey") % 5).as("party"))
      val photos = c.filter(col("c_custkey") % 3 === 0).select(
        concat(lit("M"), col("c_custkey")).as("member_code"),
        concat(lit("https://img.example/p"), col("c_custkey")).as("photo_url"))
      val issues = array(Seq("Health", "Housing", "NONE", "", "Transport",
        "Justice").map(lit): _*)
      val debates = o.select(
        concat(lit("M"), col("o_custkey")).as("member_code"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("speech_date"),
        element_at(issues, (col("o_orderkey") % 6 + 1).cast("int")).as("issue"))
      val votes = o.select(
        when(col("o_orderkey") % 17 === 0, lit(""))
          .otherwise(concat(lit("M"), col("o_custkey"))).as("member_code"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("date"),
        when(col("o_orderkey") % 13 === 0, lit(""))
          .otherwise(concat(lit("v"), col("o_orderkey") % 400)).as("unique_vote_id"))
      ProfileMetrics.build(members, votes, photos, debates, targetYear = 1995)
        .orderBy("member_code")
    }),

    // J2 end-to-end under a driver oracle: gold_current_members
    // (table_gold_current_members.py:80-150) — current-or-latest row
    // selection per bridge table (truthy flag desc, open-end-as-9999
    // desc, start desc), non-blank coalesce fallbacks to the roster's
    // latest_* columns, office blank-filtering, and the any-current
    // member mask. Bridge rows are built so every ordering clause
    // decides some member's winner and no two rows tie.
    "q96_current_members" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val k = col("c_custkey")
      def mc = concat(lit("M"), k).as("member_code")
      val members = c.select(mc, col("c_name").as("full_name"),
        concat(lit("LP"), k % 5).as("latest_party_name"),
        when(k % 7 === 0, lit("")).otherwise(concat(lit("LC"), k % 9))
          .as("latest_constituency_name"),
        lit("31").as("latest_house_no"),
        element_at(array(lit("true"), lit("yes"), lit("0"), lit("")),
          (k % 4 + 1).cast("int")).as("is_current_member"))
      val memberships = c.select(mc, lit("33").as("house_no"),
          when(k % 3 === 0, lit("true")).otherwise(lit("0")).as("is_current"),
          lit("2020-02-08").as("membership_start"),
          when(k % 5 === 1, lit("2015-06-30")).otherwise(lit(""))
            .as("membership_end"))
        .unionByName(c.select(mc, lit("32").as("house_no"),
          lit("0").as("is_current"), lit("2016-02-26").as("membership_start"),
          lit("2020-01-31").as("membership_end")))
      val parties = c.filter(k % 11 =!= 0).select(mc,
          when(k % 13 === 0, lit("")).otherwise(concat(lit("P"), k % 5))
            .as("party_name"),
          lit("1").as("is_current"), lit("2020-02-08").as("party_start"),
          lit("").as("party_end"))
        .unionByName(c.filter(k % 11 =!= 0).select(mc,
          concat(lit("OLD"), k % 5).as("party_name"), lit("0").as("is_current"),
          lit("2016-02-26").as("party_start"), lit("2020-01-31").as("party_end")))
      val constituencies = c.filter(k % 2 === 0).select(mc,
        concat(lit("CC"), k % 9).as("constituency_name"), lit("y").as("is_current"),
        lit("2020-02-08").as("represent_start"), lit("").as("represent_end"))
      val offices = c.filter(k % 2 === 0).select(mc,
          when(k % 6 === 0, lit("")).otherwise(lit("Whip")).as("office_name"),
          lit("1").as("is_current"), lit("2021-01-01").as("office_start"),
          lit("").as("office_end"))
        .unionByName(c.filter(k % 2 === 0).select(mc,
          lit("Minister of State").as("office_name"), lit("0").as("is_current"),
          lit("2018-01-01").as("office_start"), lit("2020-12-31").as("office_end")))
      GoldMarts.currentMembers(members, memberships, parties, constituencies,
          offices, snapshotDate = "2026-08-14")
        .orderBy("member_code")
    }),

    // F16 key-path discovery over payloads with data-dependent optional
    // branches (absent API tally → absent JSON key, the same shape the
    // reference's spec-design helper walks). Sampling is set past the
    // table size so the discovered counts are exact and the oracle
    // computes them from the branch conditions.
    "q94_key_paths" -> ((s, dir) => {
      import s.implicits._
      val k = col("o_orderkey")
      val payloads = t(s, dir, "orders").select(to_json(struct(
        k.as("id"),
        struct(col("o_orderstatus").as("st"),
          when(k % 3 === 0, col("o_orderpriority")).as("pri")).as("meta"),
        when(k % 2 === 0, array(col("o_custkey"), col("o_custkey") + 1)).as("refs")))
        .as("payload"))
      FlattenOps.discoverKeyPaths(payloads, "payload", sample = Int.MaxValue)
        .toDF("path", "n").orderBy("path")
    }),
  )

  def oracles: Map[String, String] = Map(

    "q85_xml_debate_walk" ->
      """WITH base AS (
        |  SELECT 'deb-' || CAST(doc_id AS VARCHAR) AS debate_id, lang, source,
        |    'pa' || CAST(doc_id AS VARCHAR) AS pid,
        |    'M' || CAST(doc_id % 101 AS VARCHAR) AS mcode,
        |    'Deputy ' || source AS speaker,
        |    trim('alpha ' || trim(regexp_replace(regexp_replace(substr(text, 1, 120), '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g'))) AS frag1,
        |    trim('beta ' || trim(regexp_replace(regexp_replace(substr(text, 121, 120), '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g'))) AS frag2
        |  FROM documents),
        |s1 AS (
        |  SELECT 'speech:' || substr(sha256(lower(debate_id || '|' || debate_id || '/dbs1' || '|1|#' || pid || '|' || frag1)), 1, 24) AS speech_id,
        |    debate_id, debate_id || '/dbs1' AS debate_section_id, 'dbs1' AS section_eid,
        |    '2024-05-01' AS debate_date, CAST(1 AS INTEGER) AS speech_order,
        |    '#' || pid AS speaker_ref, speaker AS speaker_name, mcode AS speaker_member_code,
        |    frag1 AS speech_text, lang AS language
        |  FROM base),
        |s2 AS (
        |  SELECT 'speech:' || substr(sha256(lower(debate_id || '|' || debate_id || '/dbs1' || '|2|#pb_' || source || '|' || frag2)), 1, 24) AS speech_id,
        |    debate_id, debate_id || '/dbs1' AS debate_section_id, 'dbs1' AS section_eid,
        |    '2024-05-01' AS debate_date, CAST(2 AS INTEGER) AS speech_order,
        |    '#pb_' || source AS speaker_ref, 'pb ' || source AS speaker_name,
        |    CAST(NULL AS VARCHAR) AS speaker_member_code,
        |    frag2 AS speech_text, lang AS language
        |  FROM base)
        |SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |ORDER BY debate_id, speech_order""".stripMargin,

    "q86_nfkd_name_join" ->
      """WITH roster AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS roster_id, c_name AS raw_name FROM customer
        |  UNION ALL
        |  SELECT CAST(c_custkey + 9000000 AS BIGINT), translate(c_name, 'aeo', 'áéö')
        |  FROM customer WHERE c_custkey % 97 = 0),
        |keyed AS (
        |  SELECT roster_id,
        |    regexp_replace(trim(lower(strip_accents(raw_name))), '\s+', ' ', 'g') AS name_key
        |  FROM roster),
        |unambiguous AS (
        |  SELECT name_key, MIN(roster_id) AS roster_id FROM keyed
        |  GROUP BY name_key HAVING COUNT(*) = 1),
        |mentions AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS mention_id,
        |    regexp_replace(trim(lower(strip_accents('  ' || translate(upper(c_name), 'AEO', 'ÁÉÖ') || '   '))), '\s+', ' ', 'g') AS name_key
        |  FROM customer)
        |SELECT m.mention_id, u.roster_id, m.name_key
        |FROM mentions m JOIN unambiguous u USING (name_key)
        |ORDER BY m.mention_id""".stripMargin,

    "q87_tally_explode" ->
      """WITH base AS (
        |  SELECT 'v' || CAST(o_orderkey AS VARCHAR) AS vote_id,
        |    strftime(o_orderdate, '%Y-%m-%d') AS division_date, o_orderkey
        |  FROM orders),
        |u AS (
        |  SELECT vote_id, division_date, 'ta' AS vote_code, 'Ta' AS vote_label,
        |    CASE WHEN o_orderkey % 4 = 0 THEN NULL ELSE o_orderkey % 5 END AS api, 2 AS msize
        |  FROM base
        |  UNION ALL
        |  SELECT vote_id, division_date, 'nil', 'Nil',
        |    CASE WHEN o_orderkey % 6 = 0 THEN NULL ELSE o_orderkey % 3 END, 1
        |  FROM base
        |  UNION ALL
        |  SELECT vote_id, division_date, 'staon', 'Staon', o_orderkey % 7, 0
        |  FROM base)
        |SELECT vote_id, division_date, vote_code, vote_label,
        |  CAST(coalesce(api, msize) AS VARCHAR) AS member_count,
        |  CAST((api IS NOT NULL AND msize > 0 AND api <> msize) AS VARCHAR) AS tally_mismatch,
        |  substr(sha256(lower(vote_id || '|' || division_date || '|' || vote_code)), 1, 16) AS division_tally_id
        |FROM u ORDER BY vote_id, vote_code""".stripMargin,

    "q88_scalar_canon" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS okey,
        |  CASE lower(trim((['Tá','TA','yes','Aye','Níl','NIL','no','STAON','Abstain','Maybe'])[CAST(o_orderkey % 10 AS INTEGER) + 1]))
        |    WHEN 'tá' THEN 'ta' WHEN 'ta' THEN 'ta' WHEN 'yes' THEN 'ta' WHEN 'aye' THEN 'ta'
        |    WHEN 'níl' THEN 'nil' WHEN 'nil' THEN 'nil' WHEN 'no' THEN 'nil'
        |    WHEN 'staon' THEN 'staon' WHEN 'abstain' THEN 'staon'
        |    ELSE 'other' END AS vote_kind,
        |  CASE WHEN o_orderkey % 4 = 0 THEN NULL
        |       WHEN o_orderkey % 4 = 1 THEN 'https://ex.org/p' || CAST(o_orderkey AS VARCHAR)
        |       WHEN o_orderkey % 4 = 2 THEN 'https://base.example/path/' || CAST(o_orderkey AS VARCHAR)
        |       ELSE 'https://base.example/rel/' || CAST(o_orderkey AS VARCHAR) END AS url,
        |  CAST(len(regexp_extract_all(o_orderpriority, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
        |FROM orders ORDER BY okey""".stripMargin,

    "q89_enrich_clean" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    'verdict [1] summarize ' || source || ': ' || text || '  [22] trailing  padding' AS r
        |  FROM documents),
        |clean AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(r, '\[\d+\]', '', 'g'), '\s+', ' ', 'g')) AS c
        |  FROM raw)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  array_to_string((string_split(c, ' '))[1:25], ' ') AS summary
        |FROM clean ORDER BY doc_id""".stripMargin,

    "q90_classify_labels" ->
      """WITH o AS (
        |  SELECT doc_id,
        |    trim(regexp_replace('the reply: ' || substr(text, 1, 60), '\s+', ' ', 'g')) AS r
        |  FROM documents)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CASE WHEN contains(lower(r), 'agg') THEN 'agg'
        |       WHEN contains(lower(r), 'join') THEN 'join'
        |       WHEN contains(lower(r), 'scan') THEN 'scan'
        |       ELSE 'other' END AS label
        |FROM o ORDER BY doc_id""".stripMargin,

    "q91_record_hash" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  substr(sha256('{"a":"' || lang || '","z":{"a":"' || substr(text, 1, 30) || '","s":"' || source || '"}}'), 1, 24) AS canon_hash,
        |  sha256('{"ka":"' || lang || '","kb":"' || source || '"}') AS rec_hash
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q92_score_batches" ->
      """SELECT source AS grp, CAST(doc_id AS VARCHAR) AS cand_id,
        |  CASE WHEN doc_id % 250 = 0 THEN NULL
        |       ELSE CAST(length(text) % 100 + 1 AS BIGINT) END AS score
        |FROM documents ORDER BY grp, cand_id""".stripMargin,

    "q93_experiment_summary" ->
      """WITH docs AS (
        |  SELECT CAST(202601 + doc_id % 2 AS VARCHAR) AS week_id,
        |    'sp_' || source AS speaker_name,
        |    regexp_replace(trim(text), '\s+', ' ', 'g') AS t
        |  FROM documents),
        |sent AS (
        |  SELECT week_id, speaker_name, t || '.' AS quote, len(string_split(t, ' ')) AS wc FROM docs
        |  UNION ALL
        |  SELECT week_id, speaker_name, 'Closing Remark here!' AS quote, 3 AS wc FROM docs),
        |cand AS (
        |  SELECT DISTINCT week_id, speaker_name, quote FROM sent WHERE wc BETWEEN 1 AND 60),
        |fan AS (
        |  SELECT v.variant_id, v.prompt_family, v.approach, c.week_id, c.speaker_name, c.quote,
        |    CAST(length(c.quote) % 97 + 1 AS INTEGER) AS score
        |  FROM cand c
        |  CROSS JOIN (VALUES ('v1','famA','direct'), ('v2','famB','witty')) AS v(variant_id, prompt_family, approach)),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY variant_id, week_id
        |    ORDER BY score DESC, speaker_name ASC, quote ASC) AS rk FROM fan),
        |scored_agg AS (
        |  SELECT variant_id, prompt_family, approach, week_id,
        |    CAST(COUNT(*) AS BIGINT) AS scored_candidates,
        |    CAST(MAX(score) AS BIGINT) AS max_score
        |  FROM fan GROUP BY variant_id, prompt_family, approach, week_id),
        |top_agg AS (
        |  SELECT variant_id, week_id, CAST(COUNT(*) AS BIGINT) AS top_rows,
        |    AVG(score) AS avg_top_score
        |  FROM ranked WHERE rk <= 3 GROUP BY variant_id, week_id)
        |SELECT s.variant_id, s.prompt_family, s.approach, s.week_id, s.scored_candidates,
        |  COALESCE(t.top_rows, 0) AS top_rows, s.max_score, t.avg_top_score
        |FROM scored_agg s LEFT JOIN top_agg t USING (variant_id, week_id)
        |ORDER BY variant_id, week_id""".stripMargin,

    "q95_profile_metrics" ->
      """WITH members AS (
        |  SELECT 'M' || CAST(c_custkey AS VARCHAR) AS member_code, c_name AS full_name,
        |    'CON' || CAST(c_custkey % 9 AS VARCHAR) AS constituency,
        |    'P' || CAST(c_custkey % 5 AS VARCHAR) AS party
        |  FROM customer),
        |photos AS (
        |  SELECT 'M' || CAST(c_custkey AS VARCHAR) AS member_code,
        |    'https://img.example/p' || CAST(c_custkey AS VARCHAR) AS photo_url
        |  FROM customer WHERE c_custkey % 3 = 0),
        |spk AS (
        |  SELECT 'M' || CAST(o_custkey AS VARCHAR) AS member_code,
        |    (['Health','Housing','NONE','','Transport','Justice'])[CAST(o_orderkey % 6 AS INTEGER) + 1] AS issue
        |  FROM orders WHERE year(o_orderdate) = 1995),
        |spkf AS (SELECT * FROM spk WHERE issue <> '' AND upper(issue) <> 'NONE'),
        |ranked AS (
        |  SELECT member_code, speech_count,
        |    CAST(DENSE_RANK() OVER (ORDER BY speech_count DESC) AS BIGINT) AS speech_rank
        |  FROM (SELECT member_code, CAST(COUNT(*) AS BIGINT) AS speech_count
        |        FROM spkf GROUP BY member_code)),
        |topi AS (
        |  SELECT member_code, issue AS top_issue, cnt AS top_issue_count FROM (
        |    SELECT member_code, issue, CAST(COUNT(*) AS BIGINT) AS cnt,
        |      ROW_NUMBER() OVER (PARTITION BY member_code
        |        ORDER BY COUNT(*) DESC, issue ASC) AS rn
        |    FROM spkf GROUP BY member_code, issue) WHERE rn = 1),
        |vy AS (
        |  SELECT DISTINCT member_code, unique_vote_id FROM (
        |    SELECT CASE WHEN o_orderkey % 17 = 0 THEN '' ELSE 'M' || CAST(o_custkey AS VARCHAR) END AS member_code,
        |      CASE WHEN o_orderkey % 13 = 0 THEN '' ELSE 'v' || CAST(o_orderkey % 400 AS VARCHAR) END AS unique_vote_id
        |    FROM orders WHERE year(o_orderdate) = 1995)
        |  WHERE trim(member_code) <> '' AND trim(unique_vote_id) <> ''),
        |tot AS (SELECT CAST(COUNT(DISTINCT unique_vote_id) AS BIGINT) AS total FROM vy),
        |vm AS (
        |  SELECT member_code, CAST(COUNT(*) AS BIGINT) AS distinct_votes_participated,
        |    CAST(round(COUNT(*) * 100.0 / (SELECT total FROM tot)) AS BIGINT) AS vote_participation_pct
        |  FROM vy GROUP BY member_code)
        |SELECT m.member_code, m.full_name, m.constituency, m.party,
        |  COALESCE(p.photo_url, '') AS photo_url,
        |  COALESCE(t.top_issue, '') AS top_issue,
        |  COALESCE(t.top_issue_count, 0) AS top_issue_count,
        |  COALESCE(v.vote_participation_pct, 0) AS vote_participation_pct,
        |  COALESCE(v.distinct_votes_participated, 0) AS distinct_votes_participated,
        |  (SELECT total FROM tot) AS all_distinct_vote_ids,
        |  COALESCE(r.speech_count, 0) AS speech_count,
        |  COALESCE(r.speech_rank, 0) AS speech_rank
        |FROM members m
        |LEFT JOIN photos p USING (member_code)
        |LEFT JOIN ranked r USING (member_code)
        |LEFT JOIN topi t USING (member_code)
        |LEFT JOIN vm v USING (member_code)
        |ORDER BY m.member_code""".stripMargin,

    "q96_current_members" ->
      """WITH base AS (
        |  SELECT 'M' || CAST(c_custkey AS VARCHAR) AS member_code, c_name AS full_name,
        |    'LP' || CAST(c_custkey % 5 AS VARCHAR) AS latest_party,
        |    CASE WHEN c_custkey % 7 = 0 THEN '' ELSE 'LC' || CAST(c_custkey % 9 AS VARCHAR) END AS latest_con,
        |    (['true','yes','0',''])[CAST(c_custkey % 4 AS INTEGER) + 1] AS cur_flag,
        |    c_custkey AS k
        |  FROM customer),
        |mem_rows AS (
        |  SELECT member_code, '33' AS house_no,
        |    CASE WHEN k % 3 = 0 THEN 'true' ELSE '0' END AS is_current,
        |    '2020-02-08' AS d_start,
        |    CASE WHEN k % 5 = 1 THEN '2015-06-30' ELSE '' END AS d_end
        |  FROM base
        |  UNION ALL
        |  SELECT member_code, '32', '0', '2016-02-26', '2020-01-31' FROM base),
        |mem AS (
        |  SELECT member_code, house_no FROM (
        |    SELECT member_code, house_no, ROW_NUMBER() OVER (PARTITION BY member_code
        |      ORDER BY (CASE WHEN lower(trim(is_current)) IN ('true','1','yes','y') THEN 1 ELSE 0 END) DESC,
        |        COALESCE(TRY_CAST(NULLIF(d_end, '') AS DATE), DATE '9999-12-31') DESC,
        |        TRY_CAST(d_start AS DATE) DESC) AS rn
        |    FROM mem_rows) WHERE rn = 1),
        |party_rows AS (
        |  SELECT member_code,
        |    CASE WHEN k % 13 = 0 THEN '' ELSE 'P' || CAST(k % 5 AS VARCHAR) END AS party_name,
        |    '1' AS is_current, '2020-02-08' AS d_start, '' AS d_end
        |  FROM base WHERE k % 11 <> 0
        |  UNION ALL
        |  SELECT member_code, 'OLD' || CAST(k % 5 AS VARCHAR), '0', '2016-02-26', '2020-01-31'
        |  FROM base WHERE k % 11 <> 0),
        |party AS (
        |  SELECT member_code, party_name FROM (
        |    SELECT member_code, party_name, ROW_NUMBER() OVER (PARTITION BY member_code
        |      ORDER BY (CASE WHEN lower(trim(is_current)) IN ('true','1','yes','y') THEN 1 ELSE 0 END) DESC,
        |        COALESCE(TRY_CAST(NULLIF(d_end, '') AS DATE), DATE '9999-12-31') DESC,
        |        TRY_CAST(d_start AS DATE) DESC) AS rn
        |    FROM party_rows) WHERE rn = 1),
        |con AS (
        |  SELECT member_code, 'CC' || CAST(k % 9 AS VARCHAR) AS con_name
        |  FROM base WHERE k % 2 = 0),
        |office_rows AS (
        |  SELECT member_code,
        |    CASE WHEN k % 6 = 0 THEN '' ELSE 'Whip' END AS office_name,
        |    '1' AS is_current, '2021-01-01' AS d_start, '' AS d_end
        |  FROM base WHERE k % 2 = 0
        |  UNION ALL
        |  SELECT member_code, 'Minister of State', '0', '2018-01-01', '2020-12-31'
        |  FROM base WHERE k % 2 = 0),
        |office AS (
        |  SELECT member_code, office_name FROM (
        |    SELECT member_code, office_name, ROW_NUMBER() OVER (PARTITION BY member_code
        |      ORDER BY (CASE WHEN lower(trim(is_current)) IN ('true','1','yes','y') THEN 1 ELSE 0 END) DESC,
        |        COALESCE(TRY_CAST(NULLIF(d_end, '') AS DATE), DATE '9999-12-31') DESC,
        |        TRY_CAST(d_start AS DATE) DESC) AS rn
        |    FROM office_rows) sub WHERE rn = 1 AND trim(office_name) <> '')
        |SELECT b.member_code, b.full_name,
        |  COALESCE(NULLIF(trim(p.party_name), ''), NULLIF(trim(b.latest_party), '')) AS party_name,
        |  COALESCE(NULLIF(trim(c.con_name), ''), NULLIF(trim(b.latest_con), '')) AS constituency_name,
        |  COALESCE(NULLIF(trim(m.house_no), ''), '31') AS house_no,
        |  COALESCE(o.office_name, '') AS office_name,
        |  '2026-08-14' AS snapshot_date
        |FROM base b
        |LEFT JOIN mem m USING (member_code)
        |LEFT JOIN party p USING (member_code)
        |LEFT JOIN con c USING (member_code)
        |LEFT JOIN office o USING (member_code)
        |WHERE lower(trim(b.cur_flag)) IN ('true','1','yes','y')
        |ORDER BY b.member_code""".stripMargin,

    "q94_key_paths" ->
      """WITH n AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS total,
        |    CAST(SUM(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS pri_n,
        |    CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS refs_n
        |  FROM orders)
        |SELECT path, n FROM (
        |  SELECT 'id' AS path, total AS n FROM n
        |  UNION ALL SELECT 'meta', total FROM n
        |  UNION ALL SELECT 'meta.st', total FROM n
        |  UNION ALL SELECT 'meta.pri', pri_n FROM n
        |  UNION ALL SELECT 'refs', refs_n FROM n
        |  UNION ALL SELECT 'refs[]', refs_n FROM n)
        |ORDER BY path""".stripMargin,
  )
}
