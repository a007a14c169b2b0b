package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** AI-edit member-profile image builder (reference
  * process/render_member_profile_ai_edit.py) — the last L5-family
  * enrichment builder: select the most active member with a photo,
  * build the template-edit prompt, run a first-pass image edit, validate
  * the draft against source truth with a structured-output model, then
  * always run a corrected second pass driven by the validation report.
  *
  * The image-edit and validation models are environment-forced stubs
  * behind [[ImageEditClient]] / [[ValidationClient]] (same pattern as
  * EnrichOps' scorer and MultimodalOps' codecs); member selection is a
  * real DataFrame computation and every prompt/coercion rule is ported
  * exactly (fixture-pinned in AiEditBuilderSpec).
  */
object AiEditBuilder {

  /** slugify (:93-94): lowered, '/'/'_' to spaces, whitespace runs to
    * single '-'.
    */
  def slugify(value: String): String =
    Option(value).getOrElse("").trim.toLowerCase
      .replace('/', ' ').replace('_', ' ')
      .split("\\s+").filter(_.nonEmpty).mkString("-")

  private val ContentTypeToSuffix = Map(
    "image/jpeg" -> ".jpg", "image/png" -> ".png", "image/webp" -> ".webp")

  /** infer_suffix_from_url_or_content_type (:101-117): content type
    * (parameters stripped) wins, then a recognised URL-path suffix
    * (.jpeg → .jpg), then .png.
    */
  def inferSuffix(source: String, contentType: Option[String] = None): String = {
    val fromType = contentType
      .map(_.split(";")(0).trim.toLowerCase)
      .flatMap(ContentTypeToSuffix.get)
    fromType.getOrElse {
      val path = try new java.net.URI(Option(source).getOrElse("")).getPath
        catch { case _: Exception => null }
      val p = Option(path).getOrElse(Option(source).getOrElse(""))
      val dot = p.lastIndexOf('.')
      val urlSuffix = if (dot >= 0) p.substring(dot).toLowerCase else ""
      urlSuffix match {
        case ".jpeg" => ".jpg"
        case s @ (".jpg" | ".png" | ".webp") => s
        // the reference's mimetypes.guess_type fallback
        // (render_member_profile_ai_edit.py:110-112) resolves the common
        // jpeg aliases to image/jpeg → .jpg
        case ".jpe" | ".jif" | ".jfif" | ".pjpeg" | ".pjp" => ".jpg"
        case _ => ".png"
      }
    }
  }

  /** select_member (:162-177): candidates must have a non-blank
    * photo_url and a full_name outside the exclusion set (lowercased);
    * sorted by the spec's order_by/ascending (default activity desc,
    * name asc), first row wins. Distributed sort + limit(1) — the frame
    * is a per-member metrics mart, but nothing here collects more than
    * one row.
    */
  def selectMember(metrics: DataFrame,
                   excludeNames: Set[String] = Set.empty,
                   orderBy: Seq[String] = Seq("speech_count_2025", "full_name"),
                   ascending: Seq[Boolean] = Seq(false, true)): Row = {
    val lowered = excludeNames.map(_.trim.toLowerCase)
    val candidates = metrics
      .filter(trim(coalesce(col("photo_url").cast("string"), lit(""))) =!= "")
      .filter(if (lowered.isEmpty) lit(true)
        else !lower(coalesce(col("full_name"), lit(""))).isin(lowered.toSeq: _*))
    val sortCols = orderBy.zip(ascending).map { case (c, asc) =>
      if (asc) col(c).asc else col(c).desc }
    val first = candidates.orderBy(sortCols: _*).limit(1).collect()
    if (first.isEmpty)
      throw new RuntimeException("No member candidates with photo_url found after exclusions.")
    first.head
  }

  private def str(r: Row, name: String): String =
    if (!r.schema.fieldNames.contains(name)) ""
    else Option(r.getAs[Any](name)).map(String.valueOf).getOrElse("")

  private def int(r: Row, name: String): Long = {
    val s = str(r, name).trim
    if (s.isEmpty) 0L
    else try s.toDouble.toLong catch { case _: Exception => 0L }
  }

  /** exact_visible_values (:180-188): the six strings the slide must
    * show verbatim; pct and rank coerce int-or-0.
    */
  def exactVisibleValues(member: Row): Map[String, String] = Map(
    "full_name" -> str(member, "full_name"),
    "constituency" -> str(member, "constituency"),
    "party" -> str(member, "party"),
    "top_issue" -> str(member, "top_issue_2025"),
    "vote_participation_pct" -> s"${int(member, "vote_participation_pct_2025")}%",
    "speech_rank" -> String.valueOf(int(member, "speech_rank_2025")))

  private def exactLines(exact: Map[String, String]): Seq[String] = Seq(
    s"- Full name: ${exact("full_name")}",
    s"- Constituency: ${exact("constituency")}",
    s"- Party: ${exact("party")}",
    s"- Top Issue: ${exact("top_issue")}",
    s"- Vote Participation %: ${exact("vote_participation_pct")}",
    s"- Speech Rank: ${exact("speech_rank")}")

  /** build_prompt_v1 (:191-218). voice: (clean, restrained, premium)
    * flags when a visual-tone block is configured.
    */
  def buildPromptV1(member: Row,
                    voice: Option[(Boolean, Boolean, Boolean)] = None): String = {
    val lines = Seq(
      "Use the first image as the master template. Preserve its overall layout, border, decorative corner ornaments, color palette, spacing, typography style, framing, and composition as closely as possible.",
      "Use the second image only as the replacement portrait for the framed photo area.",
      "Do not redesign the slide.",
      "Replace the old portrait and old text with the following exact visible values:") ++
      exactLines(exactVisibleValues(member)) ++ Seq(
      "Keep the slide in portrait format and retain the same approximate text placements and hierarchy.",
      "Do not add extra badges, logos, labels, charts, or new decorative concepts.",
      "Do not change the border ornament style.",
      "Do not add made-up values.") ++
      voice.map { case (clean, restrained, premium) =>
        s"Visual tone: clean=${if (clean) "True" else "False"}, restrained=${if (restrained) "True" else "False"}, premium=${if (premium) "True" else "False"}."
      }.toSeq
    lines.mkString("\n")
  }

  /** build_validation_prompt (:221-246) over the source-truth values. */
  def buildValidationPrompt(member: Row): String = {
    val exact = exactVisibleValues(member)
    (Seq(
      "You are validating an experimental template-based infographic edit.",
      "Image A is the original template.",
      "Image B is the first-pass edited output.",
      "Check whether Image B correctly preserves the template layout and styling while replacing the content with the provided source truth.",
      "Return JSON only matching the requested schema.",
      "Source truth:") ++
      exactLines(exact) ++ Seq(
      "Focus on layout drift from template, alignment issues, spacing issues, multiline wrapping, and text that looks wrong, truncated, malformed, or suspicious."))
      .mkString("\n")
  }

  /** The validation model's structured verdict (VALIDATION_SCHEMA
    * :41-70): two 0-10 scores, issue lists, second-pass flag +
    * correction text.
    */
  final case class ValidationReport(templateFidelityScore: Int,
                                    textLegibilityScore: Int,
                                    formattingIssues: Seq[String],
                                    suspectText: Seq[String],
                                    needsSecondPass: Boolean,
                                    correctionInstructions: String)

  /** build_prompt_v2 (:249-292): correction pass driven by the
    * validation report; blank correction text falls back to the stock
    * instruction.
    */
  def buildPromptV2(member: Row, report: ValidationReport): String = {
    val exact = exactVisibleValues(member)
    val correction = Option(report.correctionInstructions).map(_.trim).filter(_.nonEmpty)
      .getOrElse("Move the output closer to the template, improve alignment, spacing, and multiline formatting, and preserve exact values.")
    val lines = Seq(
      "Use the first image as the master template.",
      "Use the second image only as the replacement portrait for the framed photo area.",
      "Use the third image as the first-pass draft that needs correction.",
      "Create a corrected second-pass version of the member profile slide.",
      "Preserve the original template layout, border ornaments, spacing, hierarchy, and styling as closely as possible.",
      "Do not redesign the slide.",
      "Use these exact visible values:") ++
      exactLines(exact) ++ Seq(
      s"Correction priorities: $correction") ++
      (if (report.formattingIssues.nonEmpty)
        "Formatting issues to fix:" +: report.formattingIssues.map(i => s"- $i")
      else Nil) ++
      (if (report.suspectText.nonEmpty)
        "Suspect text to correct if visible:" +: report.suspectText.map(i => s"- $i")
      else Nil) ++ Seq(
      "Important:",
      "- Keep the portrait frame structure.",
      "- Keep the bottom metrics layout.",
      "- Improve alignment and spacing.",
      "- Fix multiline wrapping if needed.",
      "- Do not invent or alter values.")
    lines.mkString("\n")
  }

  /** source_values.json payload (:355-375): audited truth for review. */
  def sourceValues(member: Row): Map[String, Any] = Map(
    "member_code" -> str(member, "member_code"),
    "full_name" -> str(member, "full_name"),
    "constituency" -> str(member, "constituency"),
    "party" -> str(member, "party"),
    "photo_url" -> str(member, "photo_url"),
    "top_issue_2025" -> str(member, "top_issue_2025"),
    "top_issue_count_2025" -> int(member, "top_issue_count_2025"),
    "vote_participation_pct_2025" -> int(member, "vote_participation_pct_2025"),
    "distinct_votes_participated_2025" -> int(member, "distinct_votes_participated_2025"),
    "all_distinct_vote_ids_2025" -> int(member, "all_distinct_vote_ids_2025"),
    "speech_count_2025" -> int(member, "speech_count_2025"),
    "speech_rank_2025" -> int(member, "speech_rank_2025"))

  /** The image-edit model boundary: images are (name, bytes, mime)
    * tuples like the reference's file tuples; returns the edited image
    * bytes. An HTTP client at deploy time, a deterministic stub in tests
    * — the container has no image model.
    */
  trait ImageEditClient {
    def editImage(model: String, images: Seq[(String, Array[Byte], String)],
                  prompt: String, size: String): Array[Byte]
  }

  /** The validation model boundary: structured-output verdict over the
    * template and the draft.
    */
  trait ValidationClient {
    def validate(model: String, prompt: String,
                 templateImage: Array[Byte], draftImage: Array[Byte]): ValidationReport
  }

  final case class AiEditRun(memberName: String, runSlug: String,
                             promptV1: String, promptV2: String,
                             validationReport: ValidationReport,
                             imageV1: Array[Byte], imageV2: Array[Byte])

  /** main's two-pass flow (:336-447): select → prompt v1 → first edit →
    * validate v1 → prompt v2 (always run, second_pass_policy
    * "always_run") → second edit. The run slug is
    * slug(name)__<utc stamp> with an injectable clock (F4 convention).
    */
  def runAiEdit(metrics: DataFrame,
                templateImage: Array[Byte], memberPhoto: Array[Byte],
                editClient: ImageEditClient, validationClient: ValidationClient,
                excludeNames: Set[String] = Set.empty,
                voice: Option[(Boolean, Boolean, Boolean)] = None,
                model: String = "image-edit-model", size: String = "1024x1536",
                validationModel: String = "validation-model",
                utcNowIso: () => String = () => java.time.Instant.now().toString): AiEditRun = {
    val member = selectMember(metrics, excludeNames)
    val stamp = utcNowIso().replaceAll("[-:]", "").take(15) + "Z"
    val runSlug = s"${slugify(str(member, "full_name"))}__$stamp"

    val promptV1 = buildPromptV1(member, voice)
    val template = ("template_image.png", templateImage, "image/png")
    val photo = ("member_photo.png", memberPhoto, "image/png")
    val v1 = editClient.editImage(model, Seq(template, photo), promptV1, size)
    if (v1 == null || v1.isEmpty)
      throw new RuntimeException("No image payload returned by first-pass image edit request.")

    val report = validationClient.validate(validationModel,
      buildValidationPrompt(member), templateImage, v1)

    val promptV2 = buildPromptV2(member, report)
    val v2 = editClient.editImage(model,
      Seq(template, photo, ("member_profile_ai_edit_v1.png", v1, "image/png")),
      promptV2, size)
    if (v2 == null || v2.isEmpty)
      throw new RuntimeException("No image payload returned by second-pass image edit request.")

    AiEditRun(str(member, "full_name"), runSlug, promptV1, promptV2, report, v1, v2)
  }
}
