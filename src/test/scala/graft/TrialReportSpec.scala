package graft

import graft.compat.TrialReport

/** Golden-parity tests for the member-profile-metrics trial report:
  * expected rows, DQ verdict, and the FULL markdown string captured by
  * executing the reference's own _summary_rows/_dq/_markdown_report
  * (member_profile_trial_report.py) on identical fixtures.
  */
class TrialReportSpec extends SparkSpec {
  import spark.implicits._

  private val legacyKey = "processed/members/member_profile_metrics_2025.csv"
  private val trialKey =
    "processed/oireachtas_unified/compat/members/member_profile_metrics_2025_trial.csv"
  private val trialParquetKey =
    "processed/oireachtas_unified/compat/members/parquets/member_profile_metrics_2025_trial.parquet"

  private def legacy = Seq(
    ("A", "10", "x"), ("B", "5", "y"), ("B", "5", "z"), ("", "1", "w"))
    .toDF("member_code", "speech_count", "extra_legacy")
  private def trial = Seq(
    ("B", "5", "u1"), ("C", "7", "u2"), ("D", "2", "u3"))
    .toDF("member_code", "speech_count", "photo_url")

  test("summary rows golden: reference _summary_rows on the same fixture") {
    val rows = TrialReport.summaryRows(legacy, trial, legacyKey, trialKey)
    val expected = Seq(
      ("legacy_rows", "info", "4", "", legacyKey),
      ("trial_rows", "pass", "", "3", trialKey),
      ("legacy_member_count", "info", "2", "", "distinct legacy member_code"),
      ("trial_member_count", "pass", "", "3", "distinct trial member_code"),
      ("matched_member_count", "pass", "2", "1", "legacy/trial member_code overlap"),
      ("trial_only_member_count", "info", "", "2", "member_code only in trial"),
      ("legacy_only_member_count", "info", "1", "", "member_code only in legacy"),
      ("common_column_count", "pass", "3", "2", "member_code,speech_count"))
    assert(rows.map(r => (r("check_name"), r("status"), r("legacy_value"),
      r("trial_value"), r("message"))) == expected)

    val dq = TrialReport.dq(rows)
    assert(dq("dq_status") == "pass" && dq("row_count") == 8L)
    assert(dq("primary_key_unique") == true)
    val checks = dq("checks").asInstanceOf[Seq[Map[String, Any]]]
    assert(checks.map(c => (c("check_name"), c("status"))) == Seq(
      ("row_count_gt_zero", "pass"), ("primary_key_unique", "pass"),
      ("no_failed_checks", "pass")))
  }

  test("markdown report golden: byte-identical to the reference's _markdown_report") {
    val (rows, dq, manifest, report) = TrialReport.build(legacy, trial,
      legacyKey, trialKey, trialParquetKey, () => "2026-08-15T12:00:00Z")
    assert(manifest("run_id") == "member_profile_metrics_trial_20260815T120000Z")
    assert(manifest("status") == "success" && manifest("mode") == "trial")
    assert(manifest("snapshot_date") == "2026-08-15")
    assert(manifest("output_rows") == 8L && dq("dq_status") == "pass")
    assert(manifest("s3_keys").asInstanceOf[Map[String, Any]]("review_report") ==
      s"processed/oireachtas_unified/review/${TrialReport.TableName}/latest/report.md")
    assert(rows.size == 8)
    // captured verbatim from the reference run (fixture above)
    val expected =
      "# Member profile metrics side-by-side trial\n\n" +
      "Run ID: `member_profile_metrics_trial_20260815T120000Z`\n" +
      s"Legacy key: `$legacyKey`\n" +
      s"Trial key: `$trialKey`\n" +
      s"Trial parquet key: `$trialParquetKey`\n\n" +
      "The trial output is non-destructive and does not replace legacy member profile metrics.\n\n" +
      "| check_name | status | legacy_value | trial_value | message |\n" +
      "| --- | --- | --- | --- | --- |\n" +
      s"| legacy_rows | info | 4 |  | $legacyKey |\n" +
      s"| trial_rows | pass |  | 3 | $trialKey |\n" +
      "| legacy_member_count | info | 2 |  | distinct legacy member_code |\n" +
      "| trial_member_count | pass |  | 3 | distinct trial member_code |\n" +
      "| matched_member_count | pass | 2 | 1 | legacy/trial member_code overlap |\n" +
      "| trial_only_member_count | info |  | 2 | member_code only in trial |\n" +
      "| legacy_only_member_count | info | 1 |  | member_code only in legacy |\n" +
      "| common_column_count | pass | 3 | 2 | member_code,speech_count |\n"
    assert(report == expected)
  }

  test("fail path: an empty trial output fails trial_rows, the DQ, and the manifest status") {
    val (rows, dq, manifest, _) = TrialReport.build(legacy, trial.limit(0),
      legacyKey, trialKey, trialParquetKey, () => "2026-08-15T12:00:00Z")
    val byName = rows.map(r => r("check_name") -> r("status")).toMap
    assert(byName("trial_rows") == "fail" && byName("trial_member_count") == "fail")
    assert(byName("matched_member_count") == "warn")
    assert(dq("dq_status") == "fail")
    assert(manifest("status") == "failed")
    val failing = dq("checks").asInstanceOf[Seq[Map[String, Any]]]
      .find(_("check_name") == "no_failed_checks").get("failing_checks")
    assert(failing == Seq("trial_rows", "trial_member_count"))
  }

  test("wires over ProfileMetrics.build: the trial side is the q95 mart, not a re-read") {
    val members = Seq(("m1", "Alice Smith", "Dublin", "FF"),
      ("m2", "Bob Jones", "Cork", "FG"))
      .toDF("member_code", "full_name", "constituency", "party")
    val photos = Seq(("m1", "http://p/1.jpg")).toDF("member_code", "photo_url")
    val debates = Seq(("Alice Smith", "2025-02-01", "Health"))
      .toDF("speaker_name", "speech_date", "issue")
    val votes = Seq(("m1", "v1", "2025-03-01"), ("m2", "v1", "2025-03-01"))
      .toDF("member_code", "unique_vote_id", "date")
    val mart = graft.gold.ProfileMetrics.build(members, votes, photos, debates, 2025)
    val legacySide = Seq(("m1", "3"), ("mX", "9")).toDF("member_code", "speech_count")
    val rows = TrialReport.summaryRows(legacySide, mart, legacyKey, trialKey)
    val byName = rows.map(r => r("check_name") -> r).toMap
    assert(byName("trial_member_count")("trial_value") == "2")
    assert(byName("matched_member_count")("trial_value") == "1") // m1 overlaps
    assert(byName("trial_only_member_count")("trial_value") == "1") // m2
    assert(byName("common_column_count")("message").split(",").contains("member_code"))
    assert(TrialReport.dq(rows)("dq_status") == "pass")
  }
}
