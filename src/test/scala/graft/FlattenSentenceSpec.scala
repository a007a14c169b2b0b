package graft

import org.apache.spark.sql.functions._

import graft.operators.{FlattenOps, SentenceOps}
import graft.operators.FlattenOps.{FieldSpec, FlattenSpec}

/** Flatten-engine and sentence-splitter tests; splitter expectations are
  * golden output from the reference implementation on the same fixture.
  */
class FlattenSentenceSpec extends SparkSpec {
  import spark.implicits._

  test("flatten: wrapper unwrap + membership explode + fallback fields (N1/N2)") {
    val payload =
      """{"member":{"code":"m1","fullName":"Alice A",
        |"memberships":[
        |  {"house":{"houseNo":"33"},"start":"2020-01-01","end":"2023-12-31"},
        |  {"house":{"houseNo":"34"},"start":"2024-01-01"}
        |]}}""".stripMargin.replaceAll("\n", "")
    val df = Seq(payload).toDF("json")

    val memberSpec = FlattenSpec(
      wrapperKeys = Seq("member", "person", "memberDetails"),
      fields = Seq(
        FieldSpec("member_code", Seq("code", "memberCode")),
        FieldSpec("full_name", Seq("fullName", "showAs"), default = "unknown")))
    val member = FlattenOps.flatten(df, "json", memberSpec).collect().head
    assert(member.getString(0) == "m1" && member.getString(1) == "Alice A")

    val membershipSpec = FlattenSpec(
      wrapperKeys = Seq("member"),
      explodePath = Some("memberships"),
      fields = Seq(
        FieldSpec("house_no", Seq("house.houseNo")),
        FieldSpec("membership_start", Seq("start")),
        FieldSpec("membership_end", Seq("end"), default = "")))
    val ms = FlattenOps.flatten(df, "json", membershipSpec)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(ms == Seq(("33", "2020-01-01", "2023-12-31"), ("34", "2024-01-01", "")))
  }

  test("flatten: wrapper fallback order and missing-path defaults") {
    val df = Seq("""{"person":{"memberCode":"m9"}}""").toDF("json")
    val spec = FlattenSpec(
      wrapperKeys = Seq("member", "person"),
      fields = Seq(
        FieldSpec("member_code", Seq("code", "memberCode")),
        FieldSpec("gender", Seq("gender"), default = "")))
    val r = FlattenOps.flatten(df, "json", spec).collect().head
    assert(r.getString(0) == "m9" && r.getString(1) == "")
  }

  test("key-path discovery walks sampled payloads to bounded depth (F16)") {
    val df = Seq(
      """{"member":{"code":"m1","memberships":[{"house":{"houseNo":"33"}}]}}""",
      """{"member":{"code":"m2"}}""").toDF("json")
    val paths = FlattenOps.discoverKeyPaths(df, "json").toMap
    assert(paths("member") == 2L)
    assert(paths("member.code") == 2L)
    assert(paths("member.memberships[]") == 1L)
    assert(paths("member.memberships[].house.houseNo") == 1L)
  }

  test("splitSentences matches the reference splitter on the golden fixture") {
    val text = "The deputy spoke. \"Quite right!\" said the Chair. but lowercase stays attached. Then 2 points. " +
      ("word " * 48) + "alpha; beta part two here. Last one?"
    val got = SentenceOps.splitSentences(text)
    assert(got == Seq(
      "The deputy spoke.",
      "\"Quite right!\" said the Chair. but lowercase stays attached.",
      "Then 2 points. " + ("word " * 47) + "word alpha",
      "beta part two here.",
      "Last one?"))
    assert(SentenceOps.countWords("don't re-elect 3 times") == 4)
    assert(SentenceOps.splitSentences("") == Nil)
  }

  test("candidate build dedupes per week and ranks top-N (W4)") {
    val speeches = Seq(
      ("202401", "Alice", "This is the first point today. This is the first point today."),
      ("202401", "Bob", "A different remark entirely, is it not?"),
      ("202402", "Alice", "This is the first point today."))
      .toDF("week_id", "speaker", "text")
    val cands = SentenceOps.buildCandidates(speeches, "week_id", "speaker", "text", minWords = 3)
    // duplicate sentence within week 202401 deduped; same sentence in
    // another week kept
    assert(cands.filter($"week_id" === "202401").count() == 2)
    assert(cands.filter($"week_id" === "202402").count() == 1)

    val scored = cands.withColumn("score",
      when(col("speaker_name") === "Alice", 90).otherwise(50))
    val top = SentenceOps.weeklyTopN(scored, 1)
      .select("week_id", "speaker_name").as[(String, String)].collect().toSet
    assert(top == Set(("202401", "Alice"), ("202402", "Alice")))
  }
}
