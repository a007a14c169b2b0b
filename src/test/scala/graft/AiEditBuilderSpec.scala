package graft

import graft.operators.AiEditBuilder
import graft.operators.AiEditBuilder.{ImageEditClient, ValidationClient, ValidationReport}

/** Fixture-pinned port of render_member_profile_ai_edit.py: selection
  * order, visible-value coercions, the three prompt builders, and the
  * always-two-pass orchestration through stub model clients.
  */
class AiEditBuilderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val metrics = Seq(
    ("m1", "Aine Walsh", "Cork North", "Party A", "https://p.test/aine.jpg", "Housing", 12, 87.4, 40, 46, 120, 2),
    ("m2", "Brendan Kelly", "Dublin West", "Party B", "https://p.test/brendan.jpg", "Health", 9, 91.0, 44, 48, 150, 1),
    ("m3", "Ciara Nolan", "Galway East", "Party C", "", "Transport", 4, 55.0, 20, 36, 180, 3), // no photo
    ("m4", "Brendan Kelly", "Dublin South", "Party D", "https://p.test/bk2.jpg", "Justice", 2, 44.0, 11, 25, 150, 4)
  ).toDF("member_code", "full_name", "constituency", "party", "photo_url",
    "top_issue_2025", "top_issue_count_2025", "vote_participation_pct_2025",
    "distinct_votes_participated_2025", "all_distinct_vote_ids_2025",
    "speech_count_2025", "speech_rank_2025")

  test("selection: photo required, activity desc, name asc, exclusions honored") {
    // m3 has the top speech count but no photo; both Brendan Kelly rows
    // tie at 150 → name asc keeps the tie, row order by next key is the
    // frame's sort stability — select picks one of the two 150s; the
    // reference sorts (count desc, name asc) and both share the name, so
    // pin via exclusion instead
    val top = AiEditBuilder.selectMember(metrics)
    assert(top.getAs[String]("full_name") == "Brendan Kelly")
    assert(top.getAs[Int]("speech_count_2025") == 150)

    val excluded = AiEditBuilder.selectMember(metrics, excludeNames = Set(" Brendan KELLY "))
    assert(excluded.getAs[String]("full_name") == "Aine Walsh")

    intercept[RuntimeException] {
      AiEditBuilder.selectMember(metrics.filter($"photo_url" === ""))
    }
  }

  test("visible values coerce pct/rank int-or-0") {
    val m = AiEditBuilder.selectMember(metrics, excludeNames = Set("Brendan Kelly"))
    assert(AiEditBuilder.exactVisibleValues(m) == Map(
      "full_name" -> "Aine Walsh", "constituency" -> "Cork North",
      "party" -> "Party A", "top_issue" -> "Housing",
      "vote_participation_pct" -> "87%", "speech_rank" -> "2"))
  }

  test("prompt v1 matches the reference template") {
    val m = AiEditBuilder.selectMember(metrics, excludeNames = Set("Brendan Kelly"))
    val p = AiEditBuilder.buildPromptV1(m, voice = Some((true, true, false)))
    assert(p.startsWith(
      "Use the first image as the master template. Preserve its overall layout"))
    assert(p.contains("- Full name: Aine Walsh"))
    assert(p.contains("- Vote Participation %: 87%"))
    assert(p.contains("- Speech Rank: 2"))
    assert(p.endsWith("Visual tone: clean=True, restrained=True, premium=False."))
    // no voice block when unconfigured
    assert(AiEditBuilder.buildPromptV1(m).endsWith("Do not add made-up values."))
  }

  test("prompt v2 folds in the validation report, stock correction when blank") {
    val m = AiEditBuilder.selectMember(metrics, excludeNames = Set("Brendan Kelly"))
    val report = ValidationReport(6, 4, Seq("metrics row misaligned"),
      Seq("C0rk North"), needsSecondPass = true,
      correctionInstructions = "Re-align the bottom metrics row.")
    val p = AiEditBuilder.buildPromptV2(m, report)
    assert(p.contains("Correction priorities: Re-align the bottom metrics row."))
    assert(p.contains("Formatting issues to fix:\n- metrics row misaligned"))
    assert(p.contains("Suspect text to correct if visible:\n- C0rk North"))
    assert(p.endsWith("- Do not invent or alter values."))

    val blank = AiEditBuilder.buildPromptV2(m, report.copy(
      correctionInstructions = " ", formattingIssues = Nil, suspectText = Nil))
    assert(blank.contains("Correction priorities: Move the output closer to the template"))
    assert(!blank.contains("Formatting issues to fix:"))
  }

  test("slugify and suffix inference match the reference helpers") {
    assert(AiEditBuilder.slugify("  Aine  Walsh/Junior_TD ") == "aine-walsh-junior-td")
    assert(AiEditBuilder.inferSuffix("https://x.test/a.JPEG") == ".jpg")
    assert(AiEditBuilder.inferSuffix("https://x.test/a?b=c", Some("image/webp; charset=x")) == ".webp")
    assert(AiEditBuilder.inferSuffix("https://x.test/photo") == ".png")
  }

  test("two-pass run: v1 edit, validation, always-run v2 with draft attached") {
    val calls = scala.collection.mutable.ArrayBuffer[(String, Int, String)]()
    val edit = new ImageEditClient {
      def editImage(model: String, images: Seq[(String, Array[Byte], String)],
                    prompt: String, size: String): Array[Byte] = {
        calls += ((model, images.size, prompt.linesIterator.next()))
        s"image-after-${images.size}-inputs".getBytes("UTF-8")
      }
    }
    val validator = new ValidationClient {
      def validate(model: String, prompt: String,
                   templateImage: Array[Byte], draftImage: Array[Byte]): ValidationReport = {
        assert(prompt.contains("Source truth:"))
        assert(new String(draftImage, "UTF-8") == "image-after-2-inputs")
        ValidationReport(7, 6, Seq("left margin drift"), Nil, true, "Tighten margins.")
      }
    }
    val run = AiEditBuilder.runAiEdit(metrics, "TEMPLATE".getBytes, "PHOTO".getBytes,
      edit, validator, excludeNames = Set("Brendan Kelly"),
      utcNowIso = () => "2026-08-13T10:00:00Z")
    assert(run.memberName == "Aine Walsh")
    assert(run.runSlug == "aine-walsh__20260813T100000Z")
    assert(calls.toSeq == Seq(
      ("image-edit-model", 2, "Use the first image as the master template. Preserve its overall layout, border, decorative corner ornaments, color palette, spacing, typography style, framing, and composition as closely as possible."),
      ("image-edit-model", 3, "Use the first image as the master template.")))
    assert(run.promptV2.contains("Correction priorities: Tighten margins."))
    assert(new String(run.imageV2, "UTF-8") == "image-after-3-inputs")
  }
}
