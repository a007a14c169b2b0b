package graft

import graft.compat.ReviewOps

/** Golden-parity tests for the cutover review tooling: expected values
  * captured by running the reference's _compare_pair and
  * _member_lookup/_detail_rows (cutover_comparison.py,
  * mismatch_review.py) on the same inputs.
  */
class ReviewOpsSpec extends SparkSpec {
  import spark.implicits._

  test("compare_pair golden: counts, coverage strings, status, hash id") {
    val legacy = Seq(("A", "Alice"), ("B", "Bob"), ("", "Blank")).toDF("member_code", "name")
    val unified = Seq(("B", "Bob", "1"), ("C", "Cara", "2")).toDF("member_code", "name", "x")
    val row = ReviewOps.comparePair("roster", "lk", "uk",
      Some(legacy), Some(unified), "member_code", "member_code")
    assert(row("status") == "pass")
    assert(row("legacy_rows") == "3" && row("unified_rows") == "2")
    assert(row("legacy_columns") == "2" && row("unified_columns") == "3")
    assert(row("legacy_join_coverage_pct") == "66.67")
    assert(row("unified_join_coverage_pct") == "100.00")
    assert(row("matched_key_count") == "1")
    assert(row("legacy_only_key_count") == "1")
    assert(row("unified_only_key_count") == "1")
    assert(row("comparison_id") == "cmp:8bd9464a7f253f7b730fe59e") // reference value

    val warnRow = ReviewOps.comparePair("missing_legacy", "nope", "uk",
      None, Some(unified), "member_code", "member_code")
    assert(warnRow("status") == "warn")
    assert(warnRow("legacy_exists") == "false")
    assert(warnRow("matched_key_count") == "" && warnRow("legacy_join_coverage_pct") == "")
    assert(warnRow("comparison_id") == "cmp:d298fba5ab8a3c2a00b69932")

    val failRow = ReviewOps.comparePair("empty_unified", "lk", "uk2",
      Some(legacy), Some(unified.limit(0)), "member_code", "member_code")
    assert(failRow("status") == "fail")
  }

  test("mismatch detail golden: fallback fields, sides, review ids") {
    val legacy = Seq(("A", "Alice A", "P1", "C1", "legacy"), ("B", "Bob B", "P2", "C2", "legacy"))
      .toDF("member_code", "full_name", "party", "constituency", "source")
    val unified = Seq(("B", "Bobby B", "P2x", "C2x", "2026-01-01"), ("C", "Cara C", "P3", "C3", "2026-01-01"))
      .toDF("member_code", "member_name", "party_name", "constituency_name", "snapshot_date")
    val rows = ReviewOps.mismatchDetail(legacy, unified, "roster").collect()
    assert(rows.length == 2)
    val l = rows(0)
    assert(l.getAs[String]("review_id") == "roster:compat_only:C" ||
      l.getAs[String]("review_id") == "roster:legacy_only:A")
    val byId = rows.map(r => r.getAs[String]("review_id") -> r).toMap
    val a = byId("roster:legacy_only:A")
    assert(a.getAs[String]("full_name") == "Alice A")
    assert(a.getAs[String]("source_hint") == "legacy")
    assert(a.getAs[String]("legacy_key") == "present" && a.getAs[String]("unified_key") == "missing")
    assert(!a.getAs[Boolean]("other_side_present"))
    val c = byId("roster:compat_only:C")
    assert(c.getAs[String]("full_name") == "Cara C")      // member_name fallback
    assert(c.getAs[String]("party") == "P3")              // party_name fallback
    assert(c.getAs[String]("source_hint") == "2026-01-01") // snapshot_date fallback
    assert(c.getAs[String]("unified_key") == "present" && c.getAs[String]("legacy_key") == "missing")

    val summary = ReviewOps.mismatchSummary(legacy, unified, "roster")
    assert(summary("matched_member_count") == 1L)
    assert(summary("legacy_only_count") == 1L && summary("unified_only_count") == 1L)
    val dq = ReviewOps.mismatchDq(ReviewOps.mismatchDetail(legacy, unified, "roster"), Seq(summary))
    assert(dq("dq_status") == "pass")
  }

  test("cutover dq: warn on missing unified outputs, pass when complete") {
    val ok = Seq(
      Map("comparison_name" -> "a", "status" -> "pass", "legacy_key" -> "l", "unified_key" -> "u",
        "unified_exists" -> "true", "unified_rows" -> "5"),
      Map("comparison_name" -> "b", "status" -> "pass", "legacy_key" -> "l2", "unified_key" -> "u2",
        "unified_exists" -> "true", "unified_rows" -> "7"))
    assert(ReviewOps.cutoverDq(ok)("dq_status") == "pass")
    val missing = ok.map(_ + ("unified_exists" -> "false"))
    assert(ReviewOps.cutoverDq(missing)("dq_status") == "warn")
    assert(ReviewOps.cutoverDq(Nil)("dq_status") == "warn")
    val dup = ok :+ ok.head
    assert(ReviewOps.cutoverDq(dup)("primary_key_unique") == false)
  }

  test("markdown table: escaping, truncation, empty") {
    assert(ReviewOps.markdownTable(Seq("a"), Nil) == "No rows.")
    val t = ReviewOps.markdownTable(Seq("a", "b"),
      Seq(Map("a" -> "x|y", "b" -> ("z" * 400))))
    assert(t.startsWith("| a | b |\n| --- | --- |\n"))
    assert(t.contains("x\\|y"))
    assert(t.length < 400 + 50)
  }
}
