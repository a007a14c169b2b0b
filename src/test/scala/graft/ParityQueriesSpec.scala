package graft

import org.apache.spark.sql.functions._

/** Sanity guards for the Parity oracle queries (q85-q87): the full
  * value-level check is the driver's DuckDB compare; these pin the
  * structural invariants that would silently shift the oracle contract
  * (row multiplicity, speaker fallback shape, ambiguous-drop count,
  * member-count branches) at sf0.001.
  */
class ParityQueriesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q85: two ordered speeches per document, walker fields round-trip") {
    val docs = Tables.load(spark, dir, "documents").count()
    val out = graft.queries.Parity.queries("q85_xml_debate_walk")(spark, dir).cache()
    try {
      assert(out.count() === 2 * docs)
      // speech 1 resolves the TLCPerson member code; speech 2 must not
      val byOrder = out.groupBy("speech_order")
        .agg(count(lit(1)).as("n"),
          count(col("speaker_member_code")).as("n_code"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(byOrder(1) === (docs, docs))
      assert(byOrder(2) === (docs, 0L))
      // division section joins to the enclosing joinable section
      assert(out.filter(col("section_eid") =!= "dbs1").count() === 0)
      // ids carry the reference stable-hash prefix and are unique
      assert(out.filter(!col("speech_id").startsWith("speech:")).count() === 0)
      assert(out.select("speech_id").distinct().count() === 2 * docs)
    } finally out.unpersist()
  }

  test("q86: ambiguous accent-variant roster keys drop their mentions") {
    val c = Tables.load(spark, dir, "customer")
    val total = c.count()
    val ambiguous = c.filter(col("c_custkey") % 97 === 0).count()
    val out = graft.queries.Parity.queries("q86_nfkd_name_join")(spark, dir).cache()
    try {
      assert(out.count() === total - ambiguous)
      // every surviving mention matched its own roster row (NFKD key
      // recovered despite accents + case + padding)
      assert(out.filter(col("mention_id") =!= col("roster_id")).count() === 0)
    } finally out.unpersist()
  }

  test("q87: three tally rows per order, member-count branches populated") {
    val orders = Tables.load(spark, dir, "orders").count()
    val out = graft.queries.Parity.queries("q87_tally_explode")(spark, dir).cache()
    try {
      assert(out.count() === 3 * orders)
      // staon has no member array: api tally always wins; ta coalesces to
      // the 2-member array length when the api tally is absent (key%4==0)
      assert(out.filter(col("vote_code") === "staon" && col("member_count") === "0")
        .count() > 0)
      assert(out.filter(col("vote_code") === "ta" && col("tally_mismatch") === "true")
        .count() > 0)
      val taNullApi = out.filter(col("vote_code") === "ta" && col("member_count") === "2")
      assert(taNullApi.count() >= (orders / 4 - 1))
    } finally out.unpersist()
  }

  test("q88: every vote-kind and URL branch is populated") {
    val out = graft.queries.Parity.queries("q88_scalar_canon")(spark, dir).cache()
    try {
      val kinds = out.select("vote_kind").distinct().collect().map(_.getString(0)).toSet
      assert(kinds === Set("ta", "nil", "staon", "other"))
      assert(out.filter(col("url").isNull).count() > 0)           // blank → null
      assert(out.filter(col("url").startsWith("https://ex.org/")).count() > 0)
      assert(out.filter(col("url").startsWith("https://base.example/path/")).count() > 0)
      assert(out.filter(col("url").startsWith("https://base.example/rel/")).count() > 0)
      // '5-LOW' style priorities: digit + '-' + word = 3 tokens
      assert(out.filter(col("n_tokens") === 3).count() > 0)
    } finally out.unpersist()
  }

  test("q89/q90: stub-client enrich cleans and classifies deterministically") {
    val docs = Tables.load(spark, dir, "documents").count()
    val cleaned = graft.queries.Parity.queries("q89_enrich_clean")(spark, dir).cache()
    try {
      assert(cleaned.count() === docs)
      // citation markers stripped, 25-word clamp applied
      assert(cleaned.filter(col("summary").contains("[1]")).count() === 0)
      assert(cleaned.filter(size(split(col("summary"), " ")) > 25).count() === 0)
      assert(cleaned.filter(col("summary").startsWith("verdict summarize ")).count() === docs)
    } finally cleaned.unpersist()
    val labeled = graft.queries.Parity.queries("q90_classify_labels")(spark, dir)
    val byLabel = labeled.groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet.subsetOf(Set("agg", "join", "scan", "other")))
    assert(byLabel.values.sum === docs)
  }

  test("q91: canonical record hash is stable across key order") {
    val out = graft.queries.Parity.queries("q91_record_hash")(spark, dir)
    val row = out.limit(1).collect()(0)
    assert(row.getString(out.columns.indexOf("canon_hash")).length === 24)
    assert(row.getString(out.columns.indexOf("rec_hash")).length === 64)
  }

  test("q92: poisoned ids bisect to null scores, batchmates keep theirs") {
    val docs = Tables.load(spark, dir, "documents").count()
    val out = graft.queries.Parity.queries("q92_score_batches")(spark, dir).cache()
    try {
      assert(out.count() === docs)
      val poisoned = out.filter(col("score").isNull)
        .select("cand_id").collect().map(_.getString(0)).toSet
      val expected = Tables.load(spark, dir, "documents")
        .filter(col("doc_id") % 250 === 0)
        .select(col("doc_id").cast("string")).collect().map(_.getString(0)).toSet
      assert(poisoned === expected)
      assert(out.filter(col("score").between(1, 100)).count() === docs - expected.size)
    } finally out.unpersist()
  }

  test("q93: summary covers every (variant, week) with sane aggregates") {
    val out = graft.queries.Parity.queries("q93_experiment_summary")(spark, dir).cache()
    try {
      assert(out.count() === 4) // 2 variants x 2 weeks
      assert(out.filter(col("top_rows") === 3).count() === 4)
      assert(out.filter(col("max_score") < col("avg_top_score")).count() === 0)
      assert(out.filter(col("scored_candidates") <= 3).count() === 0)
    } finally out.unpersist()
  }

  test("q95: profile mart zero-fills, ranks densely, and bounds the pct") {
    val members = Tables.load(spark, dir, "customer").count()
    val out = graft.queries.Parity.queries("q95_profile_metrics")(spark, dir).cache()
    try {
      assert(out.count() === members) // left joins keep the full roster
      // dense rank: best rank is 1 and ranks are gapless over speakers
      val ranks = out.filter(col("speech_rank") > 0)
        .select("speech_rank").distinct()
        .collect().map(_.getLong(0)).sorted
      assert(ranks.headOption.contains(1L), s"best rank ${ranks.headOption}")
      assert(ranks.toSeq === (1L to ranks.length).toSeq, "dense ranks have gaps")
      // non-speakers zero-filled, pct within bounds, photo fallback blank
      assert(out.filter(col("speech_count") === 0 && col("speech_rank") =!= 0).count() === 0)
      assert(out.filter(col("vote_participation_pct") > 100).count() === 0)
      assert(out.filter(col("photo_url") === "").count() > 0)
      assert(out.filter(col("top_issue") === "NONE").count() === 0)
    } finally out.unpersist()
  }

  test("q96: only current members survive; every fallback branch populated") {
    val c = Tables.load(spark, dir, "customer")
    val current = c.filter(col("c_custkey") % 4 < 2).count()
    val out = graft.queries.Parity.queries("q96_current_members")(spark, dir).cache()
    try {
      assert(out.count() === current) // the any-current mask filters
      // bridge-over-roster precedence and the latest_* fallbacks both occur
      assert(out.filter(col("party_name").startsWith("P")).count() > 0)
      assert(out.filter(col("party_name").startsWith("LP")).count() > 0)
      assert(out.filter(col("house_no") === "32").count() > 0)   // end-date ordering
      assert(out.filter(col("house_no") === "33").count() > 0)
      assert(out.filter(col("office_name") === "Whip").count() > 0)
      assert(out.filter(col("office_name") === "").count() > 0)  // blank-filtered
      assert(out.filter(col("office_name") === "Minister of State").count() === 0)
    } finally out.unpersist()
  }

  test("q94: optional JSON branches surface as partial-count paths") {
    val orders = Tables.load(spark, dir, "orders").count()
    val out = graft.queries.Parity.queries("q94_key_paths")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("id") === orders)
    assert(out("meta.st") === orders)
    assert(out("meta.pri") < orders && out("meta.pri") > 0)
    assert(out("refs") === out("refs[]"))
  }
}
