package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.gold.{RendererContext, TemplatePipeline => TP}

/** Field-mapping + provider-fallback port of
  * instagram_template_pipeline.py, pinned against the reference's own
  * semantics: dot-path lookup, the four transforms, skip_if_blank,
  * env: template references, the enriched computed block, and main's
  * fallback state machine.
  */
class TemplatePipelineSpec extends AnyFunSuite {

  private val ctx = RendererContext.PostContext(
    constituency = RendererContext.ConstituencyContext(
      name = "Dublin Bay South", memberCount = 4, partyCount = 3, speechCount = 120,
      imageUrl = None, topIssueLabel = "Housing"),
    member = RendererContext.MemberContext(
      fullName = "Jane Murphy", party = "Example Party", constituency = "Dublin Bay South",
      photoUrl = Some("https://example.test/jane.jpg"), background = "  A background.  ",
      speechCount = 37, topIssueLabel = "Housing", memberKey = "jane murphy"),
    issues = Seq(RendererContext.IssueCount("Housing", 40),
      RendererContext.IssueCount("Health", 40), RendererContext.IssueCount("Transport", 12)),
    memberIssues = Seq(RendererContext.IssueCount("Housing", 9)))

  private lazy val payload = TP.enrichContext(
    TP.contextPayload(ctx, datasetsUsed = Seq("members.csv", "debates.csv")))

  test("coalesce_text skips null, blank, and nan") {
    assert(TP.coalesceText(null, "  ", "nan", " NaN ", " x ") == Some("x"))
    assert(TP.coalesceText(null, "").isEmpty)
    assert(TP.coalesceText(42) == Some("42"))
  }

  test("get_path walks dots and falls back at any break") {
    assert(TP.getPath(payload, "member.full_name") == "Jane Murphy")
    assert(TP.getPath(payload, "member.missing", "d") == "d")
    assert(TP.getPath(payload, "member.full_name.deeper", "d") == "d")
    assert(TP.getPath(payload, "computed.member_background_short") == "A background.")
  }

  test("issue summary enumerates top counts with count-desc label-asc ties") {
    // Health/Housing tie at 40 → label asc puts Health first
    assert(TP.getPath(payload, "computed.constituency_issue_summary") ==
      "1. Health — 40\n2. Housing — 40\n3. Transport — 12")
    assert(TP.formatIssueSummary(Nil) == "No classified issue counts available yet.")
    assert(TP.getPath(payload, "computed.datasets_used_text") == "members.csv\ndebates.csv")
  }

  test("transforms match the reference") {
    assert(TP.applyTransform("x", None) == "x")
    assert(TP.applyTransform(null, Some("string")) == "")
    assert(TP.applyTransform(12L, Some("string")) == "12")
    assert(TP.applyTransform("42", Some("int_string")) == "42")
    assert(TP.applyTransform(42.9, Some("int_string")) == "42")
    assert(TP.applyTransform("42.5", Some("int_string")) == "0") // int("42.5") raises
    assert(TP.applyTransform(null, Some("int_string")) == "0")
    assert(TP.applyTransform(null, Some("default_image_url")) ==
      "https://placehold.co/1080x1350/png?text=Image+pending")
    assert(TP.applyTransform(" https://i.test/a.png ", Some("default_image_url")) ==
      "https://i.test/a.png")
    intercept[TP.TemplatePipelineError](TP.applyTransform("x", Some("bogus")))
  }

  test("env: template references resolve through the injected environment") {
    val env = Map("BB_TEMPLATE" -> " uid-123 ")
    assert(TP.resolveReference("env:BB_TEMPLATE", env.get) == "uid-123")
    assert(TP.resolveReference("literal-uid", env.get) == "literal-uid")
    intercept[TP.ProviderConfigError](TP.resolveReference("env:MISSING", env.get))
    intercept[TP.ProviderConfigError](TP.resolveReference("  ", env.get))
  }

  test("bannerbear modifications map paths, apply transforms, skip blanks") {
    val items = Seq(
      TP.MappingItem("member_name", "member.full_name"),
      TP.MappingItem("speeches", "member.speech_count", transform = Some("int_string")),
      TP.MappingItem("photo", "member.photo_url", field = "image_url",
        transform = Some("default_image_url")),
      TP.MappingItem("con_image", "constituency.image_url", field = "image_url",
        skipIfBlank = true),
      TP.MappingItem("slide_title", "slide.title", default = "Untitled"))
    val mods = TP.buildBannerbearModifications(payload + ("slide" -> Map("title" -> "Cover")), items)
    assert(mods == Seq(
      Map("name" -> "member_name", "text" -> "Jane Murphy"),
      Map("name" -> "speeches", "text" -> "37"),
      Map("name" -> "photo", "image_url" -> "https://example.test/jane.jpg"),
      // con_image skipped: null + skip_if_blank
      Map("name" -> "slide_title", "text" -> "Cover")))
  }

  test("placid layers keyed by layer name with property values") {
    val items = Seq(
      TP.MappingItem("headline", "computed.member_issue_summary"),
      TP.MappingItem("bg", "constituency.image_url", field = "image",
        transform = Some("default_image_url")))
    val layers = TP.buildPlacidLayers(payload, items)
    assert(layers == Map(
      "headline" -> Map("text" -> "1. Housing — 9"),
      "bg" -> Map("image" -> "https://placehold.co/1080x1350/png?text=Image+pending")))
  }

  test("slide loop: enabled-only, env resolution, missing mapping and missing image_url fail") {
    val mapping = Map(
      "cover" -> TP.SlideMapping("env:T_COVER", Seq(TP.MappingItem("name", "member.full_name"))),
      "stats" -> TP.SlideMapping("uid-stats", Seq(TP.MappingItem("n", "member.speech_count",
        transform = Some("int_string")))))
    val env = Map("T_COVER" -> "uid-cover")
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val stub = new TP.RenderProvider {
      def name = "bannerbear"
      def render(slideKey: String, templateRef: String, request: Map[String, Any]) = {
        seen += s"$slideKey@$templateRef"
        Map("image_url" -> s"https://img.test/$slideKey.png", "status" -> "completed")
      }
    }
    val slides = Seq(TP.SlideSpec("cover", fields = Map("title" -> "Cover")),
      TP.SlideSpec("skipped", enabled = false), TP.SlideSpec("stats"))
    val out = TP.renderSlides(payload, slides, mapping, stub, env.get, TP.bannerbearRequest)
    assert(seen.toSeq == Seq("cover@uid-cover", "stats@uid-stats"))
    assert(out.map(_.response("image_url")) ==
      Seq("https://img.test/cover.png", "https://img.test/stats.png"))
    assert(out.head.request("template") == "uid-cover")

    intercept[TP.ProviderConfigError] {
      TP.renderSlides(payload, Seq(TP.SlideSpec("unmapped")), mapping, stub, env.get,
        TP.bannerbearRequest)
    }
    val broken = new TP.RenderProvider {
      def name = "placid"
      def render(k: String, t: String, r: Map[String, Any]) = Map("status" -> "finished")
    }
    intercept[TP.ProviderRenderError] {
      TP.renderSlides(payload, Seq(TP.SlideSpec("stats")), mapping, broken, env.get,
        TP.placidRequest(1080, 1350, "png", "01_stats.png"))
    }
  }

  test("fallback state machine matches main") {
    var statuses = List.empty[TP.RenderStatus]
    def sink(s: TP.RenderStatus): Unit = statuses ::= s
    var localRan = false
    val providers = Map[String, () => Unit](
      "bannerbear" -> (() => throw new TP.ProviderConfigError("Missing Bannerbear API key environment variable.")),
      "placid" -> (() => ()),
      "local_html" -> (() => { localRan = true }))

    // failing primary falls back to local_html
    val s1 = TP.runTemplatePipeline("bannerbear", providers, statusSink = sink)
    assert(localRan && s1.fallbackUsed && s1.usedProvider == Some("local_html") &&
      s1.error.exists(_.contains("Bannerbear API key")))

    // healthy primary: no fallback
    val s2 = TP.runTemplatePipeline("placid", providers, statusSink = sink)
    assert(s2 == TP.RenderStatus("placid", "local_html", Some("placid"), false, None))

    // skipFallback rethrows but still sinks the error status
    statuses = Nil
    intercept[TP.TemplatePipelineError] {
      TP.runTemplatePipeline("bannerbear", providers, skipFallback = true, statusSink = sink)
    }
    assert(statuses.head.usedProvider.isEmpty && statuses.head.error.nonEmpty)

    // unknown provider is a pipeline error subject to the same fallback
    val s4 = TP.runTemplatePipeline("imaginary", providers, statusSink = sink)
    assert(s4.fallbackUsed && s4.error.exists(_.contains("Unsupported provider")))

    // local_html itself failing never recurses
    val deadLocal = providers.updated("local_html",
      () => throw new TP.ProviderRenderError("browser missing"))
    intercept[TP.TemplatePipelineError] {
      TP.runTemplatePipeline("local_html", deadLocal, statusSink = sink)
    }
  }
}
