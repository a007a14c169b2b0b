package graft.gold

/** Template-driven post rendering: context→placeholder field mapping and
  * provider orchestration with local fallback (reference
  * process/instagram_template_pipeline.py). This is driver-side
  * orchestration over the ALREADY-distributed context build
  * ([[RendererContext.buildPostContext]]); the only dataflow here is the
  * tiny per-slide payload, so plain Scala over an injectable provider
  * client is the faithful shape — the HTTP clients
  * (Bannerbear/Placid, :215-330) are environment-forced stubs behind
  * [[RenderProvider]], while every mapping/transform/fallback rule is
  * ported and fixture-tested.
  */
object TemplatePipeline {

  class TemplatePipelineError(msg: String) extends RuntimeException(msg)
  final class ProviderConfigError(msg: String) extends TemplatePipelineError(msg)
  final class ProviderRenderError(msg: String) extends TemplatePipelineError(msg)

  /** coalesce_text (:87-94): first value whose trimmed string form is
    * non-empty and not "nan" (pandas NaN leaking through str()).
    */
  def coalesceText(values: Any*): Option[String] =
    values.iterator
      .filter(_ != null)
      .map(v => String.valueOf(v).trim)
      .find(t => t.nonEmpty && t.toLowerCase != "nan")

  /** get_path (:97-104): dot-path into nested string-keyed maps; any
    * non-map midway (or missing key) yields the default.
    */
  def getPath(payload: Map[String, Any], path: String, default: Any = null): Any =
    path.split("\\.").foldLeft(payload: Any) {
      case (m: Map[_, _], part) =>
        m.asInstanceOf[Map[String, Any]].getOrElse(part, default)
      case _ => default
    }

  /** make_issue_rows' label—count listing as the text block the
    * templates consume (format_issue_summary :107-115): top `limit`
    * counts, "1. label — count" per line, or the no-data sentence.
    * Ordering ties break by label asc (the repo-wide mostCommon
    * convention — Counter insertion order is not reproducible).
    */
  def formatIssueSummary(counts: Seq[RendererContext.IssueCount], limit: Int = 8): String = {
    val top = counts.sortBy(c => (-c.count, c.label)).take(limit)
    if (top.isEmpty) "No classified issue counts available yet."
    else top.zipWithIndex
      .map { case (c, i) => s"${i + 1}. ${c.label} — ${c.count}" }
      .mkString("\n")
  }

  /** The typed [[RendererContext.PostContext]] as the nested payload the
    * mapping paths address (post_context.json shape, :279+ keys).
    */
  def contextPayload(ctx: RendererContext.PostContext,
                     datasetsUsed: Seq[String] = Nil): Map[String, Any] = Map(
    "constituency" -> Map(
      "name" -> ctx.constituency.name,
      "member_count" -> ctx.constituency.memberCount,
      "party_count" -> ctx.constituency.partyCount,
      "speech_count" -> ctx.constituency.speechCount,
      "image_url" -> ctx.constituency.imageUrl.orNull,
      "top_issue_label" -> ctx.constituency.topIssueLabel),
    "member" -> Map(
      "full_name" -> ctx.member.fullName,
      "party" -> ctx.member.party,
      "constituency" -> ctx.member.constituency,
      "photo_url" -> ctx.member.photoUrl.orNull,
      "background" -> ctx.member.background,
      "speech_count" -> ctx.member.speechCount,
      "top_issue_label" -> ctx.member.topIssueLabel),
    "constituency_issue_counts" -> ctx.issues.map(c => c.label -> c.count).toMap,
    "member_issue_counts" -> ctx.memberIssues.map(c => c.label -> c.count).toMap,
    "datasets_used" -> datasetsUsed)

  /** enrich_context (:118-132): the computed block templates reference
    * as computed.* — issue summaries, datasets text, short background.
    */
  def enrichContext(payload: Map[String, Any], issueLimit: Int = 8): Map[String, Any] = {
    def counts(key: String): Seq[RendererContext.IssueCount] = payload.get(key) match {
      // match any boxed numeric — a hand-built or JSON-parsed payload
      // carries Ints/Integers where the builder emits Longs (the
      // reference's Dict[str, int] accepts both)
      case Some(m: Map[_, _]) => m.toSeq.collect {
        case (l, n: Number) => RendererContext.IssueCount(String.valueOf(l), n.longValue)
      }
      case _ => Nil
    }
    val datasets = payload.get("datasets_used") match {
      case Some(s: Seq[_]) => s.map(String.valueOf)
      case _ => Nil
    }
    payload + ("computed" -> Map(
      "constituency_issue_summary" ->
        formatIssueSummary(counts("constituency_issue_counts"), issueLimit),
      "member_issue_summary" ->
        formatIssueSummary(counts("member_issue_counts"), issueLimit),
      "datasets_used_text" -> datasets.mkString("\n"),
      "member_background_short" -> coalesceText(
        getPath(payload, "member.background"), "Background not available yet.").get))
  }

  /** resolve_reference (:154-163): literal template ids pass through;
    * "env:NAME" resolves through the injected environment (sys.env at
    * deploy time, a fixture map in tests). Blank anywhere → config error.
    */
  def resolveReference(raw: String, env: String => Option[String]): String = {
    val value = Option(raw).getOrElse("").trim
    if (value.startsWith("env:")) {
      val name = value.split(":", 2)(1).trim
      env(name).map(_.trim).filter(_.nonEmpty)
        .getOrElse(throw new ProviderConfigError(
          s"Missing required environment variable: $name"))
    } else if (value.isEmpty)
      throw new ProviderConfigError("Template reference is empty.")
    else value
  }

  /** apply_transform (:166-180). */
  def applyTransform(value: Any, transform: Option[String]): Any = transform match {
    case None | Some("") | Some("identity") => value
    case Some("string") | Some("multiline") =>
      if (value == null) "" else String.valueOf(value)
    case Some("int_string") =>
      // Python str(int(value)): numerics truncate toward zero, strings
      // must be integral ("42.5" raises → "0"), None/garbage → "0"
      try String.valueOf(value match {
        case i: Int => i.toLong
        case l: Long => l
        case d: Double if !d.isInfinite => d.toLong // int(inf) raises in Python
        case f: Float if !f.isInfinite => f.toLong
        case b: Boolean => if (b) 1L else 0L
        case s: String => s.trim.toLong
        case _ => throw new NumberFormatException
      })
      catch { case _: Exception => "0" }
    case Some("default_image_url") =>
      coalesceText(value, "https://placehold.co/1080x1350/png?text=Image+pending").get
    case Some(other) => throw new TemplatePipelineError(s"Unsupported transform: $other")
  }

  /** One mapping entry (a modifications/layers YAML item): placeholder
    * name, dot-path into the payload, target field/property (default
    * "text"), optional default + transform, skip-if-blank.
    */
  final case class MappingItem(name: String, path: String, field: String = "text",
                               default: Any = null, transform: Option[String] = None,
                               skipIfBlank: Boolean = false)

  /** Per-slide mapping: the provider template reference + items. */
  final case class SlideMapping(templateRef: String, items: Seq[MappingItem])

  /** build_bannerbear_modifications (:183-193): list of
    * {name, <field>: value} entries, blank-skipped where marked.
    */
  def buildBannerbearModifications(payload: Map[String, Any],
                                   items: Seq[MappingItem]): Seq[Map[String, Any]] =
    items.flatMap { item =>
      val value = applyTransform(getPath(payload, item.path, item.default), item.transform)
      if (item.skipIfBlank && coalesceText(value).isEmpty) None
      else Some(Map("name" -> item.name, item.field -> value))
    }

  /** build_placid_layers (:196-206): layer name → {property: value}. */
  def buildPlacidLayers(payload: Map[String, Any],
                        items: Seq[MappingItem]): Map[String, Map[String, Any]] =
    items.flatMap { item =>
      val value = applyTransform(getPath(payload, item.path, item.default), item.transform)
      if (item.skipIfBlank && coalesceText(value).isEmpty) None
      else Some(item.name -> Map(item.field -> value))
    }.toMap

  /** One slide of the post spec: key + enabled flag + free-form slide
    * fields the mapping can address as slide.*.
    */
  final case class SlideSpec(key: String, enabled: Boolean = true,
                             fields: Map[String, Any] = Map.empty)

  /** The external-render client boundary: Bannerbear/Placid HTTP at
    * deploy time, a deterministic stub in tests, the local HTML
    * renderer for the fallback. render returns the provider response
    * payload (must carry "image_url") or throws a
    * [[TemplatePipelineError]].
    */
  trait RenderProvider {
    def name: String
    def render(slideKey: String, templateRef: String,
               request: Map[String, Any]): Map[String, Any]
  }

  final case class RenderedSlide(slideKey: String, templateRef: String,
                                 request: Map[String, Any],
                                 response: Map[String, Any])

  /** render_with_bannerbear / render_with_placid shared slide loop
    * (:355-395, :430-480): enabled slides only, per-slide payload =
    * context + slide fields, unmapped slide key is a config error, a
    * response without image_url is a render error.
    */
  def renderSlides(context: Map[String, Any], slides: Seq[SlideSpec],
                   mapping: Map[String, SlideMapping],
                   provider: RenderProvider,
                   env: String => Option[String],
                   buildRequest: (String, Map[String, Any], SlideMapping) => Map[String, Any])
      : Seq[RenderedSlide] =
    slides.filter(_.enabled).map { slide =>
      val slideMapping = mapping.getOrElse(slide.key,
        throw new ProviderConfigError(
          s"No ${provider.name} mapping found for slide key: ${slide.key}"))
      val payload = context + ("slide" -> slide.fields)
      val templateRef = resolveReference(slideMapping.templateRef, env)
      val request = buildRequest(templateRef, payload, slideMapping)
      val response = provider.render(slide.key, templateRef, request)
      if (coalesceText(response.getOrElse("image_url", null)).isEmpty)
        throw new ProviderRenderError(
          s"${provider.name} response missing image_url for slide: ${slide.key}")
      RenderedSlide(slide.key, templateRef, request, response)
    }

  /** A Bannerbear-shaped request body (:243-250). */
  def bannerbearRequest(templateRef: String, payload: Map[String, Any],
                        m: SlideMapping): Map[String, Any] = Map(
    "template" -> templateRef,
    "modifications" -> buildBannerbearModifications(payload, m.items))

  /** A Placid-shaped request body (:286-300). */
  def placidRequest(width: Int, height: Int, imageFormat: String, filename: String)(
      templateRef: String, payload: Map[String, Any], m: SlideMapping): Map[String, Any] = Map(
    "template_uuid" -> templateRef,
    "layers" -> buildPlacidLayers(payload, m.items),
    "modifications" -> Map("width" -> width, "height" -> height,
      "filename" -> filename, "image_format" -> imageFormat))

  /** main's provider dispatch + fallback (:497-545): run the requested
    * provider; on a pipeline error fall back to local_html unless
    * skipFallback, the fallback is something else, or local_html itself
    * failed — those rethrow AFTER the status lands in statusSink
    * (render_status.json). Unknown provider names are pipeline errors
    * subject to the same fallback.
    */
  final case class RenderStatus(requestedProvider: String, fallbackProvider: String,
                                usedProvider: Option[String], fallbackUsed: Boolean,
                                error: Option[String])

  def runTemplatePipeline(requested: String,
                          providers: Map[String, () => Unit],
                          fallbackProvider: String = "local_html",
                          skipFallback: Boolean = false,
                          statusSink: RenderStatus => Unit = _ => ()): RenderStatus = {
    val provider = requested.trim.toLowerCase
    val fallback = fallbackProvider.trim.toLowerCase
    def run(name: String): Unit =
      providers.getOrElse(name,
        throw new TemplatePipelineError(s"Unsupported provider: $name")).apply()
    val status =
      try { run(provider); RenderStatus(provider, fallback, Some(provider), false, None) }
      catch {
        case e: TemplatePipelineError =>
          if (skipFallback || fallback != "local_html" || provider == "local_html") {
            val st = RenderStatus(provider, fallback, None, false, Some(e.getMessage))
            statusSink(st)
            throw e
          }
          run("local_html")
          RenderStatus(provider, fallback, Some("local_html"), true, Some(e.getMessage))
      }
    statusSink(status)
    status
  }
}
