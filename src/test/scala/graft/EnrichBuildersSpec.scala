package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.operators.{EnrichBuilders, EnrichOps}

/** Resume/validation semantics for the dedicated L5 builders, mirroring
  * the reference scripts' behaviors (members_background_summarizer.py,
  * members_photo_urls.py).
  */
class EnrichBuildersSpec extends SparkSpec {
  import spark.implicits._

  test("constituency images: trial build, hashes, compat, renderer consumption") {
    val source = Seq(
      // file_name variant + explicit constituency
      ("dublin_bay_north_cover.jpg", "media/dbn.jpg", "https://img.ie/dbn.jpg", "Dublin Bay North"),
      // constituency blank -> inferred from filename (suffix stripped,
      // words capitalized)
      ("cork-south-central_image.png", "media/csc.png", "", ""),
      // no extension, no locator at all
      ("galwaywest", "", "", ""))
      .toDF("file_name", "s3_key", "url", "constituency")
    val trial = EnrichBuilders.buildConstituencyImages(source, "run42", "processed/constituencies/constituency_images.csv")
    val rows = trial.collect()
    assert(rows.length == 3)
    val byFile = rows.map(r => r.getAs[String]("filename") -> r).toMap
    val csc = byFile("cork-south-central_image.png")
    assert(csc.getAs[String]("constituency") == "Cork South Central")
    assert(csc.getAs[String]("media_type") == "image/png")
    val gw = byFile("galwaywest")
    assert(gw.getAs[String]("constituency") == "Galwaywest")
    assert(gw.getAs[String]("media_type") == "image/unknown")
    val dbn = byFile("dublin_bay_north_cover.jpg")
    assert(dbn.getAs[String]("constituency") == "Dublin Bay North")
    assert(dbn.getAs[String]("media_type") == "image/jpeg")
    // record_id = sha256(json.dumps([key, url, fname], default seps))[:24]
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val exp = md.digest(
      """["media/dbn.jpg", "https://img.ie/dbn.jpg", "dublin_bay_north_cover.jpg"]"""
        .getBytes("UTF-8")).map("%02x".format(_)).mkString.take(24)
    assert(dbn.getAs[String]("record_id") == s"constituency_image:$exp")
    assert(dbn.getAs[String]("source_system") == "legacy_constituency_image_index")
    assert(dbn.getAs[String]("run_id") == "run42")

    // compat adapter feeds the renderer's image picker end-to-end
    val compat = EnrichBuilders.constituencyImagesCompat(trial)
    assert(compat.columns.toSeq == Seq("filename", "s3_key", "url"))
    assert(graft.gold.RendererContext.pickConstituencyImage(compat, "Dublin Bay North")
      .contains("https://img.ie/dbn.jpg"))
    // csc/galway have no url -> first filename match wins but yields None
    assert(graft.gold.RendererContext.pickConstituencyImage(compat, "Cork South Central").isEmpty)

    // dq: pk unique + constituency populated, but one locator missing -> fail
    val dq = EnrichBuilders.constituencyImagesDq(trial, sourceRows = 3).collect()(0)
    assert(dq.getAs[Boolean]("primary_key_unique"))
    assert(dq.getAs[Boolean]("constituency_populated"))
    assert(dq.getAs[Long]("image_locator_missing_count") == 1L)
    assert(dq.getAs[String]("dq_status") == "fail")
    // dropping the locator-less row passes, and row_limit wires into the
    // expected-rows check
    val trimmed = EnrichBuilders.buildConstituencyImages(source.limit(2), "run42", "k")
    val dq2 = EnrichBuilders.constituencyImagesDq(trimmed, sourceRows = 3, rowLimit = 2).collect()(0)
    assert(dq2.getAs[String]("dq_status") == "pass")
  }

  test("strip_citations_and_links parity") {
    assert(EnrichBuilders.stripCitationsAndLinks(
      "Grew up in Cork (see https://example.com/bio) and worked [1] as a teacher.") ==
      "Grew up in Cork and worked as a teacher.")
    // reference-exact: [^)]* stops at the FIRST ')', so nested/markdown
    // parens leave a dangling ')' behind (verified against the reference fn)
    assert(EnrichBuilders.stripCitationsAndLinks(
      "A (x (see www.a.ie)) B https://b.ie/c C [12]") == "A ) B C")
    assert(EnrichBuilders.stripCitationsAndLinks(
      "Markdown ([source](https://x.ie/p)) stays out.") == "Markdown ) stays out.")
    assert(EnrichBuilders.stripCitationsAndLinks(null) == "")
  }

  test("to_public_profile_url conversions") {
    assert(EnrichBuilders.toPublicProfileUrl(
      "https://data.oireachtas.ie/ie/oireachtas/member/id/Aoife-Byrne.D.2024").contains(
      "https://www.oireachtas.ie/en/members/member/Aoife-Byrne.D.2024/"))
    assert(EnrichBuilders.toPublicProfileUrl("https://example.ie/p").contains("https://example.ie/p/"))
    assert(EnrichBuilders.toPublicProfileUrl("not-a-url").isEmpty)
    assert(EnrichBuilders.toPublicProfileUrl(null).isEmpty)
  }

  test("photo extraction: confirmed selector, fallbacks, urljoin") {
    val page = "https://www.oireachtas.ie/en/members/member/X/"
    assert(EnrichBuilders.extractPhotoUrl(page,
      """<img class="c-member-about__img" src="/media/members/photo/x.jpg">""").contains(
      "https://www.oireachtas.ie/media/members/photo/x.jpg"))
    assert(EnrichBuilders.extractPhotoUrl(page,
      """<img class="other"><div class="member-image"><img src="y.png"></div>""").contains(
      "https://www.oireachtas.ie/en/members/member/X/y.png"))
    assert(EnrichBuilders.extractPhotoUrl(page,
      """<img src="https://cdn.ie/media/members/photo/z.jpg">""").contains(
      "https://cdn.ie/media/members/photo/z.jpg"))
    assert(EnrichBuilders.extractPhotoUrl(page, "<p>no images</p>").isEmpty)
  }

  test("summarizer resume: only missing rows call the model, names refresh from base") {
    val base = Seq(("m1", "Alice A"), ("m2", "Bob B"), ("m3", "Cara C"), ("m4", ""))
      .toDF("member_code", "full_name")
    val existing = Seq(("m1", "Existing summary."), ("m9", "Ex-member summary."))
      .toDF("member_code", "background")
    val calls = spark.sparkContext.longAccumulator("model_calls")
    val out = EnrichBuilders.runBackgroundSummarizer(base, existing,
      () => new EnrichOps.ModelClient {
        def complete(prompt: String): String = {
          calls.add(1)
          assert(prompt.contains("politically neutral"))
          "Summary for prompt (see https://src.ie) done. [2]"
        }
      }).collect().map(r => r.getAs[String]("member_code") -> r.getAs[String]("background")).toMap

    assert(out.keySet == Set("m1", "m2", "m3", "m4")) // right-join: m9 dropped
    assert(out("m1") == "Existing summary.")           // preserved, not recomputed
    assert(out("m2") == "Summary for prompt done.")    // cleaned output
    assert(out("m3") == "Summary for prompt done.")
    assert(out("m4") == null)                          // blank name skipped
    assert(calls.value == 2)
  }

  test("summarizer force recomputes everything") {
    val base = Seq(("m1", "Alice A")).toDF("member_code", "full_name")
    val existing = Seq(("m1", "Old.")).toDF("member_code", "background")
    val out = EnrichBuilders.runBackgroundSummarizer(base, existing,
      () => new EnrichOps.ModelClient { def complete(p: String) = "New." },
      force = true).collect()
    assert(out.head.getAs[String]("background") == "New.")
  }

  test("photo urls: resume map, fetch failures and missing images are null") {
    val base = Seq(
      ("m1", "Alice", "https://data.oireachtas.ie/ie/oireachtas/member/id/A.1"),
      ("m2", "Bob", "https://data.oireachtas.ie/ie/oireachtas/member/id/B.2"),
      ("m3", "Cara", "bogus-uri"),
      ("m4", "Dan", "https://data.oireachtas.ie/ie/oireachtas/member/id/D.4"))
      .toDF("member_code", "full_name", "member_uri")
    val existing = Seq(("m1", "https://done.ie/a.jpg"), ("m2", " "))
      .toDF("member_code", "photo_url")
    val fetches = new AtomicInteger
    val out = EnrichBuilders.runPhotoUrls(base, existing, () => new EnrichBuilders.PageFetcher {
      def fetch(url: String): String = {
        fetches.incrementAndGet()
        if (url.contains("B.2")) """<img class="c-member-about__img" src="/media/members/photo/b.jpg">"""
        else throw new RuntimeException("boom")
      }
    }).collect().map(r => r.getAs[String]("member_code") -> r.getAs[String]("photo_url")).toMap

    assert(out("m1") == "https://done.ie/a.jpg")  // preserved, no fetch
    assert(out("m2") == "https://www.oireachtas.ie/media/members/photo/b.jpg") // blank existing → refetched
    assert(out("m3") == null)                     // no valid profile url
    assert(out("m4") == null)                     // fetch error → null
  }
}
