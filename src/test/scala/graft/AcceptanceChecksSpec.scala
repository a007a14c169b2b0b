package graft

import org.apache.spark.sql.functions._

import graft.operators.AcceptanceChecks

/** Port of the validation-fix acceptance runner's gates, each pinned on
  * a fixture that fails it one way: duplicated business keys, a changed
  * current value, a missing official key, a missing business row, and a
  * manifest whose stored counts/hash drifted.
  */
class AcceptanceChecksSpec extends SparkSpec {
  import spark.implicits._

  test("business duplicates keep every row of a duplicated group") {
    val parties = Seq(
      ("m1", "p://a", "2020-01-01", "", "Party A", "true"),
      ("m1", "p://a", "2020-01-01", "", "Party A renamed", "true"), // dup business key
      ("m2", "p://b", "2021-01-01", "", "Party B", "true")
    ).toDF("member_code", "party_uri", "party_start", "party_end", "party_name", "is_current")
    val dups = AcceptanceChecks.businessDuplicates(parties,
      Seq("member_code", "party_uri", "party_start", "party_end"))
    assert(dups.count() == 2) // keep=False: both rows of the group
    assert(dups.select("member_code").distinct().collect().map(_.getString(0)).toSeq == Seq("m1"))
  }

  test("current-value comparison flags changed sets per member, ignores non-current rows") {
    val candidate = Seq(
      ("m1", "p://a", "Party A", "true"),
      ("m1", "p://old", "Old Party", "false"), // non-current: ignored
      ("m2", "p://b", "Party B", "1"),
      ("m3", "p://c", "Party C", "yes")
    ).toDF("member_code", "party_uri", "party_name", "is_current")
    val production = Seq(
      ("m1", "p://a", "Party A", "true"),
      ("m2", "p://b", "Party B RENAMED", "true"), // changed value
      ("m4", "p://d", "Party D", "true")          // only in production
    ).toDF("member_code", "party_uri", "party_name", "is_current")
    val out = AcceptanceChecks.currentValueDifferences(candidate, production,
      Seq("party_uri", "party_name")).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("m2", "m3", "m4"))
    val m2 = out.find(_.getString(0) == "m2").get
    assert(m2.getSeq[String](1) == Seq("p://b|Party B"))
    assert(m2.getSeq[String](2) == Seq("p://b|Party B RENAMED"))
  }

  test("key completeness counts official keys the candidate lacks, blank keys excluded") {
    val candidate = Seq("s1", "s2").toDF("debate_section_id")
    val official = Seq("s1", "s2", "s3", "s4", "").toDF("debate_section_id")
    val k = AcceptanceChecks.keyCompleteness(candidate, official, "debate_section_id")
    assert(k == AcceptanceChecks.KeyCompleteness(5, 2, 2, Seq("s3", "s4")))
  }

  test("bill-debate business completeness scopes official rows to candidate bills") {
    val cols = Seq("bill_id", "debate_id", "debate_section_id",
      "debate_show_as", "debate_date", "chamber_uri")
    val candidate = Seq(
      ("b1", "d1", "s1", "Second Stage", "2026-07-15", "c://dail")
    ).toDF(cols: _*)
    val official = Seq(
      ("b1", "d1", "s1", "Second Stage", "2026-07-15", "c://dail"), // present
      ("b1", "d2", "s9", "Committee", "2026-07-16", "c://dail"),    // missing, in-scope
      ("b9", "d3", "s5", "First Stage", "2026-07-10", "c://dail")   // out of scope bill
    ).toDF(cols: _*)
    val bills = Seq("b1").toDF("bill_id")
    val b = AcceptanceChecks.billDebateBusinessCompleteness(candidate, official, bills)
    assert(b.officialRowsForCandidateBills == 2 && b.candidateRows == 1)
    assert(b.missingBusinessRows == 1)
    assert(b.missingSamples == Seq("b1|d2|s9|Committee|2026-07-16|c://dail"))
  }

  test("control manifest validation checks counts, column counts, and schema hash") {
    val table = "gold_member_activity_monthly" // 6 columns, pk (member_code, year_month)
    val goodHash = AcceptanceChecks.expectedSchemaHash(table).get
    val allTables = graft.core.TableRegistry.specs.keys.toSeq.sorted
    // manifest covering every registry table so missing_tables is empty;
    // our target row carries a stale hash + wrong row count
    val rows = allTables.map { t =>
      if (t == table) (t, "10", "6", "deadbeef")
      else (t, "5", graft.core.TableRegistry.specs(t).columns.length.toString,
        AcceptanceChecks.expectedSchemaHash(t).get)
    }
    val manifests = rows.toDF("table_name", "row_count", "column_count", "schema_hash")
    val counts: String => (Long, Long) = t => if (t == table) (10L, 9L) else (5L, 5L)
    val out = AcceptanceChecks.validateControlManifests(manifests, counts)
    assert(out.missingTables.isEmpty)
    assert(out.failureCount == 1)
    val f = out.failureSamples.head
    assert(f.table == table)
    assert(f.differences.exists(_.startsWith("row_count:")))
    assert(f.differences.exists(_.startsWith("schema_hash:")))
    assert(!f.differences.exists(_.startsWith("column_count:")))
    assert(goodHash.length == 24)

    // dropping one table from the manifest surfaces it as missing
    val partial = rows.filterNot(_._1 == table)
      .toDF("table_name", "row_count", "column_count", "schema_hash")
    assert(AcceptanceChecks.validateControlManifests(partial, counts)
      .missingTables == Seq(table))
  }

  test("acceptance payload aggregates pass/fail and renders the markdown table") {
    val a = AcceptanceChecks.acceptance("batch-42", Seq(
      AcceptanceChecks.check("gate_one", passed = true, "ok"),
      AcceptanceChecks.check("gate_two", passed = false, "bad | piped")))
    assert(a.status == "fail")
    val md = AcceptanceChecks.acceptanceMarkdown(a)
    assert(md.contains("- Batch: `batch-42`"))
    assert(md.contains("- Overall: **fail**"))
    assert(md.contains("| gate_two | **fail** | bad \\| piped |"))

    val all = AcceptanceChecks.acceptance("batch-42",
      Seq(AcceptanceChecks.check("gate_one", passed = true, "ok")))
    assert(all.status == "pass")
  }

  test("runAcceptance wires the ten gates end-to-end") {
    val parties = Seq(("m1", "p://a", "2020-01-01", "", "Party A", "true"))
      .toDF("member_code", "party_uri", "party_start", "party_end", "party_name", "is_current")
    val cons = Seq(("m1", "c://x", "2020-01-01", "", "Dublin West", "true"))
      .toDF("member_code", "constituency_uri", "represent_start", "represent_end",
        "constituency_name", "is_current")
    val sections = Seq("s1").toDF("debate_section_id")
    val questions = Seq("q1").toDF("question_id")
    val versions = Seq(("b1", "v1")).toDF("bill_id", "bill_version_id")
    val billDebates = Seq(("b1", "d1", "s1", "Second Stage", "2026-07-15", "c://dail"))
      .toDF("bill_id", "debate_id", "debate_section_id",
        "debate_show_as", "debate_date", "chamber_uri")
    val bills = Seq("b1").toDF("bill_id")
    val allTables = graft.core.TableRegistry.specs.keys.toSeq.sorted
    val manifests = allTables.map(t => (t, "5",
        graft.core.TableRegistry.specs(t).columns.length.toString,
        AcceptanceChecks.expectedSchemaHash(t).get))
      .toDF("table_name", "row_count", "column_count", "schema_hash")

    val a = AcceptanceChecks.runAcceptance("batch-42",
      batchManifestStatus = "validated", batchManifestTableCount = 31,
      batchManifestValidationIssues = Nil,
      candidateParties = parties, productionParties = parties,
      candidateConstituencies = cons, productionConstituencies = cons,
      candidateSections = sections, officialSections = sections,
      candidateQuestions = questions, officialQuestions = questions,
      candidateVersions = versions, officialVersions = versions,
      candidateBillDebates = billDebates, officialBillDebates = billDebates,
      candidateBills = bills, candidateManifests = manifests,
      actualCounts = _ => (5L, 5L))
    assert(a.status == "pass", a.checks.filter(_.status == "fail").toString)
    assert(a.checks.map(_.check) == Seq(
      "batch_manifest_validated",
      "member_party_business_keys_unique",
      "member_constituency_business_keys_unique",
      "current_party_values_unchanged",
      "current_constituency_values_unchanged",
      "recent_official_debate_sections_present",
      "recent_official_questions_present",
      "official_bill_versions_present",
      "official_bill_debate_business_rows_present",
      "control_manifest_counts_and_schemas_match_candidate"))

    // one drifted current value flips the whole run to fail
    val changed = Seq(("m1", "p://a", "2020-01-01", "Party A RENAMED", "true"))
      .toDF("member_code", "party_uri", "party_start", "party_name", "is_current")
      .withColumn("party_end", lit(""))
    val b = AcceptanceChecks.runAcceptance("batch-42",
      "validated", 31, Nil,
      parties, changed.select("member_code", "party_uri", "party_start",
        "party_end", "party_name", "is_current"),
      cons, cons, sections, sections, questions, questions,
      versions, versions, billDebates, billDebates, bills, manifests, _ => (5L, 5L))
    assert(b.status == "fail")
    assert(b.checks.find(_.check == "current_party_values_unchanged").get.status == "fail")
  }
}
