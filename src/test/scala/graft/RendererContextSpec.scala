package graft

import graft.gold.RendererContext

/** Fixture-parity test for the renderer context: the expected values below
  * were produced by running the reference build_post_context
  * (instagram/renderer/context.py) on tests/fixtures/instagram — same
  * member/photo/summary/issue rows, same spec (Wicklow-Wexford, no
  * requested member, issue_limit 8).
  */
class RendererContextSpec extends SparkSpec {
  import spark.implicits._

  private def members = Seq(
    ("Aoife Byrne", "Wicklow-Wexford", "Example Party", "TD001"),
    ("Brendan Walsh", "Wicklow-Wexford", "Example Party", "TD002"),
    ("Ciara Doyle", "Dublin Bay South", "Another Party", "TD003"))
    .toDF("full_name", "constituency", "party", "member_code")

  private def photos = Seq(
    ("TD001", "Aoife Byrne", null: String),
    ("TD002", "Brendan Walsh", null: String),
    ("TD003", "Ciara Doyle", null: String))
    .toDF("member_code", "full_name", "photo_url")

  private def summaries = Seq(
    ("TD001", "Aoife Byrne", "Aoife Byrne worked in local community development before entering national politics and has focused on housing and coastal infrastructure."),
    ("TD002", "Brendan Walsh", "Brendan Walsh previously worked as a teacher and councillor and often speaks about transport and regional services."),
    ("TD003", "Ciara Doyle", "Ciara Doyle has a legal background and is active on health and justice issues."))
    .toDF("member_code", "full_name", "background")

  private def debateIssues = Seq(
    ("Aoife Byrne", "Housing"), ("Aoife Byrne", "Housing"), ("Aoife Byrne", "Transport"),
    ("Brendan Walsh", "Transport"), ("Brendan Walsh", "Transport"), ("Brendan Walsh", "Education"),
    ("Ciara Doyle", "Health"), ("Ciara Doyle", "Justice"))
    .toDF("Speaker Name", "issue")

  private def images = Seq(
    ("wicklow-wexford.png", "processed/constituencies/images/wicklow-wexford.png", null: String),
    ("dublin-bay-south.png", "processed/constituencies/images/dublin-bay-south.png", null: String))
    .toDF("filename", "s3_key", "url")

  test("fixture post context matches the reference renderer") {
    val ctx = RendererContext.buildPostContext(
      members, photos, summaries, debateIssues, images,
      constituencyName = "Wicklow-Wexford", requestedMember = None, issueLimit = 8)

    assert(ctx.constituency.name == "Wicklow-Wexford")
    assert(ctx.constituency.memberCount == 2)
    assert(ctx.constituency.partyCount == 1)
    assert(ctx.constituency.speechCount == 6)
    assert(ctx.constituency.imageUrl.isEmpty) // url and s3_url blank in fixture
    assert(ctx.constituency.topIssueLabel == "Transport") // 3 vs Housing 2

    assert(ctx.member.fullName == "Aoife Byrne") // highest speech count (3)
    assert(ctx.member.party == "Example Party")
    assert(ctx.member.constituency == "Wicklow-Wexford")
    assert(ctx.member.photoUrl.isEmpty)
    assert(ctx.member.background.startsWith("Aoife Byrne worked in local community development"))
    assert(ctx.member.speechCount == 3)
    assert(ctx.member.topIssueLabel == "Housing")
    assert(ctx.member.memberKey == "aoife byrne")

    assert(ctx.issues.map(i => (i.label, i.count)) ==
      Seq(("Transport", 3L), ("Education", 1L), ("Housing", 2L)).sortBy(i => (-i._2, i._1)))
    assert(ctx.memberIssues.map(i => (i.label, i.count)) == Seq(("Housing", 2L), ("Transport", 1L)))
  }

  test("requested member overrides speech-count selection; NONE issues drop") {
    val issuesWithNone = debateIssues.union(Seq(
      ("Brendan Walsh", "NONE"), ("Brendan Walsh", "")).toDF("Speaker Name", "issue"))
    val ctx = RendererContext.buildPostContext(
      members, photos, summaries, issuesWithNone, images,
      constituencyName = "Wicklow-Wexford", requestedMember = Some("Deputy Brendan  WALSH TD"))
    assert(ctx.member.fullName == "Brendan Walsh") // honorifics/casing normalize away
    assert(ctx.member.speechCount == 3)            // NONE/blank rows did not count
    assert(ctx.constituency.speechCount == 6)
  }

  test("unknown constituency raises with a sample of available ones") {
    val e = intercept[RuntimeException] {
      RendererContext.buildPostContext(members, photos, summaries, debateIssues, images,
        constituencyName = "Atlantis")
    }
    assert(e.getMessage.contains("No members matched constituency 'Atlantis'"))
    assert(e.getMessage.contains("Dublin Bay South"))
  }

  test("constituency image: normalized exact/substring match, url else s3_url") {
    val imgs = Seq(
      ("wicklow-wexford.png", "s3/ww.png", "https://cdn/ww.png"),
      ("dublin-bay-south.png", "s3/dbs.png", null: String))
      .toDF("filename", "s3_key", "url")
    assert(RendererContext.pickConstituencyImage(imgs, "Wicklow-Wexford")
      .contains("https://cdn/ww.png"))
    // reference coalesces (url, s3_url) — the s3_KEY column does not count,
    // and a blank first match returns None rather than scanning on
    assert(RendererContext.pickConstituencyImage(imgs, "Dublin Bay South").isEmpty)
    assert(RendererContext.pickConstituencyImage(imgs, "Atlantis").isEmpty)
    val withS3Url = Seq(("kerry.png", null: String, "https://cdn/k.png"))
      .toDF("filename", "url", "s3_url")
    assert(RendererContext.pickConstituencyImage(withS3Url, "Kerry").contains("https://cdn/k.png"))
  }

  test("ordinal and percent formatting") {
    assert(RendererContext.ordinalRank(1) == "1st")
    assert(RendererContext.ordinalRank(2) == "2nd")
    assert(RendererContext.ordinalRank(3) == "3rd")
    assert(RendererContext.ordinalRank(4) == "4th")
    assert(RendererContext.ordinalRank(11) == "11th")
    assert(RendererContext.ordinalRank(21) == "21st")
    assert(RendererContext.ordinalRank(0) == "N/A")
    assert(RendererContext.percentString(None) == "N/A")
    assert(RendererContext.percentString(Some("82%")) == "82%")
    assert(RendererContext.percentString(Some("82")) == "82%")
    assert(RendererContext.percentString(Some("82.46")) == "82.5%")
    assert(RendererContext.percentString(Some("n/a-ish")) == "n/a-ish")
  }
}
