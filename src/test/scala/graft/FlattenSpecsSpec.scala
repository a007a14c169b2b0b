package graft

import org.apache.spark.sql.functions._

import graft.operators.FlattenOps
import graft.silver.FlattenSpecs

/** Per-table flatten specs against reference-shaped payloads. */
class FlattenSpecsSpec extends SparkSpec {
  import spark.implicits._

  test("members spec: fallbacks, code-from-hash, member_key (M6 stability)") {
    val payloads = Seq(
      """{"member":{"memberCode":"m1","fullName":"Alice A","uri":"/m/1","gender":"f"}}""",
      // no code → surrogate from uri+names; display falls back to fullName
      """{"person":{"fullName":"Bob B","firstName":"Bob","lastName":"B","uri":"/m/2"}}""")
      .toDF("json")
    val out = FlattenSpecs.membersTransform(
      FlattenOps.flatten(payloads, "json", FlattenSpecs.members))
    val rows = out.orderBy("full_name").collect()
    assert(rows(0).getAs[String]("member_code") == "m1")
    assert(rows(0).getAs[String]("member_key").length == 16)
    val bobCode = rows(1).getAs[String]("member_code")
    assert(bobCode.length == 16 && bobCode.matches("[0-9a-f]+"))
  }

  test("memberships spec: explode with parent member_code, id excludes end date") {
    val payload =
      """{"member":{"memberCode":"m1","memberships":[
        |{"membership":{"house":{"uri":"/h/34","houseNo":"34"},"dateRange":{"start":"2024-01-01"}}},
        |{"membership":{"house":{"uri":"/h/33","houseNo":"33"},"dateRange":{"start":"2020-01-01","end":"2023-12-31"}}}
        |]}}""".stripMargin.replaceAll("\n", "")
    val out = FlattenSpecs.membershipsTransform(
      FlattenOps.flatten(Seq(payload).toDF("json"), "json", FlattenSpecs.memberMemberships))
    val rows = out.orderBy(col("membership_start").desc).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("member_code") == "m1"))
    assert(rows(0).getAs[String]("house_no") == "34")
    // id hashes member/house/start only — closing the open membership
    // must not change its id
    val closed =
      """{"member":{"memberCode":"m1","memberships":[
        |{"membership":{"house":{"uri":"/h/34","houseNo":"34"},"dateRange":{"start":"2024-01-01","end":"2026-01-01"}}}
        |]}}""".stripMargin.replaceAll("\n", "")
    val closedOut = FlattenSpecs.membershipsTransform(
      FlattenOps.flatten(Seq(closed).toDF("json"), "json", FlattenSpecs.memberMemberships))
    assert(closedOut.collect().head.getAs[String]("membership_id") ==
      rows(0).getAs[String]("membership_id"))
  }

  test("tally specs: member_count from API tally else member-array length") {
    val payload =
      """{"voteId":"v1","date":"2024-02-05",
        |"taVotes":{"showAs":"Tá","tally":"3","members":[{"m":"a"},{"m":"b"}]},
        |"nilVotes":{"showAs":"Níl","members":[{"m":"c"},{"m":"d"}]}}"""
        .stripMargin.replaceAll("\n", "")
    val df = Seq(payload).toDF("json")
    val frames = FlattenSpecs.tallyKinds.map { case (kind, key) =>
      FlattenSpecs.tallyTransform(kind)(
        FlattenOps.flatten(df, "json", FlattenSpecs.tallySpec(kind, key)))
    }
    val all = frames.reduce(_ unionByName _).filter(col("vote_label").isNotNull)
      .collect().map(r => r.getAs[String]("vote_code") ->
        (r.getAs[String]("member_count"), r.getAs[String]("tally_mismatch"))).toMap
    assert(all("ta") == (("3", "true")))   // API tally 3 wins, mismatch vs 2 members flagged
    assert(all("nil") == (("2", "false"))) // no tally → member-array length
  }

  test("member-parties spec walks memberships into party bridges") {
    val payload =
      """{"member":{"memberCode":"m1","memberships":[
        |{"membership":{"uri":"/ms/1","parties":[{"party":{"uri":"/p/ff","showAs":"Fianna Fáil",
        |  "dateRange":{"start":"2020-02-08","end":null}}}]}}
        |]}}""".stripMargin.replaceAll("\n", "")
    val out = FlattenSpecs.memberPartiesTransform(
      FlattenOps.flatten(Seq(payload).toDF("json"), "json", FlattenSpecs.memberParties))
      .collect().head
    assert(out.getAs[String]("member_code") == "m1")
    assert(out.getAs[String]("party_name") == "Fianna Fáil")
    assert(out.getAs[String]("party_uri") == "/p/ff")
    assert(out.getAs[String]("party_start") == "2020-02-08")
    assert(out.getAs[String]("member_party_id").length == 16)
    assert(out.getAs[String]("is_current") == "true")
  }

  test("catalog specs extract houses/parties/constituencies") {
    val house = """{"house":{"uri":"/h/34","houseNo":"34","houseCode":"dail","showAs":"34th Dáil"}}"""
    val h = FlattenOps.flatten(Seq(house).toDF("json"), "json", FlattenSpecs.houses).collect().head
    assert(h.getAs[String]("house_no") == "34" && h.getAs[String]("show_as") == "34th Dáil")

    val con = """{"constituency":{"showAs":"Dublin Bay North","representCode":"DBN",
      |"uri":"/c/dbn","house":{"uri":"/h/34","houseNo":"34","houseCode":"dail"}}}"""
      .stripMargin.replaceAll("\n", "")
    val c = FlattenOps.flatten(Seq(con).toDF("json"), "json", FlattenSpecs.constituencies).collect().head
    assert(c.getAs[String]("constituency_code") == "DBN")
    assert(c.getAs[String]("chamber") == "dail")
  }

  test("divisions spec resolves nested house/debate paths") {
    val payload =
      """{"voteId":"vote_42","date":"2024-02-05","uri":"/div/42",
        |"house":{"uri":"/h/34","houseNo":"34","houseCode":"dail"},
        |"subject":{"showAs":"That the Bill be read"},
        |"outcome":"Carried",
        |"debateSection":{"debateSectionId":"dbsect_3","showAs":"Committee Stage"}}"""
        .stripMargin.replaceAll("\n", "")
    val out = FlattenSpecs.divisionsTransform(
      FlattenOps.flatten(Seq(payload).toDF("json"), "json", FlattenSpecs.divisions))
      .collect().head
    assert(out.getAs[String]("chamber") == "dail")
    assert(out.getAs[String]("subject") == "That the Bill be read")
    assert(out.getAs[String]("division_id") == "division:vote_42:2024-02-05")
    assert(out.getAs[String]("debate_show_as") == "Committee Stage")
  }
}
