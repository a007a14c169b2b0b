package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import scala.util.Try

/** Dedicated L5 enrichment builders (reference
  * process/members_background_summarizer.py:1-357 and
  * process/members_photo_urls.py:1-244): thin configurations over the
  * generic enrich harness plus their builder-specific pieces — citation/link
  * stripping, the profile-URL rewrite, photo extraction selectors, and the
  * resume semantics (existing output preserved, only missing rows
  * recomputed, right-join onto the current member base).
  */
object EnrichBuilders {

  // ---------------- background summarizer ----------------

  /** build_prompt (members_background_summarizer.py:191-206). */
  def summarizerPrompt(fullName: String): String =
    s"""Use web search to write a politically neutral, factual background summary (MAX 200 words) of the Irish politician "$fullName".
       |
       |Include, if available:
       |- Where they grew up (town/county/region).
       |- What they worked as before becoming a politician.
       |- Their political history before 2025 (roles, elections, notable positions held).
       |
       |Rules:
       |- Neutral, factual tone.
       |- If a detail cannot be verified reliably, omit it rather than guessing.
       |- Do NOT include citations, links, URLs, domain names, markdown links, or parenthetical source references.
       |- Output plain text only.""".stripMargin.trim

  private val ParenWithLink =
    """(?i)\s*\([^)]*(https?://|www\.|\[[^\]]+\]\()([^)]*)\)\s*""".r
  private val UrlRe = """(?i)https?://\S+|www\.\S+""".r
  private val BracketCit = """\s*\[\d+\]\s*""".r

  /** strip_citations_and_links (…:169-188): repeatedly delete any (...)
    * containing a URL or markdown link, then raw URLs, then [n] markers,
    * then collapse whitespace.
    */
  def stripCitationsAndLinks(text: String): String = {
    var t = Option(text).getOrElse("").trim
    var prev: String = null
    while (t != prev) { prev = t; t = ParenWithLink.replaceAllIn(t, " ") }
    t = UrlRe.replaceAllIn(t, " ")
    t = BracketCit.replaceAllIn(t, " ")
    t.replaceAll("\\s{2,}", " ").trim
  }

  /** Resume merge (…:279-321): existing output RIGHT-joined onto the
    * current base so exactly the current members survive, base is the
    * source of truth for full_name, and previously-computed values are
    * preserved. Returns the merged frame with `background` (null where
    * missing → needs compute).
    */
  def summarizerResume(base: DataFrame, existing: DataFrame): DataFrame = {
    val b = base.select(trim(col("member_code")).as("member_code"), col("full_name"))
    if (existing.isEmpty || !existing.columns.contains("member_code") ||
        !existing.columns.contains("background")) {
      b.withColumn("background", lit(null).cast("string"))
    } else {
      val e = existing.select(trim(col("member_code")).as("member_code"),
        col("background").cast("string").as("background"))
      b.join(e, Seq("member_code"), "left")
    }
  }

  /** Full summarizer pass: compute only rows whose background is missing
    * (or all under force), via the model client; blank names yield null
    * (…:323-340). One client per partition; everything stays distributed.
    */
  def runBackgroundSummarizer(base: DataFrame, existing: DataFrame,
                              clientFactory: () => EnrichOps.ModelClient,
                              force: Boolean = false): DataFrame = {
    val merged = summarizerResume(base, existing)
    val isMissing = col("background").isNull || trim(col("background")) === ""
    val todoFilter = if (force) lit(true) else isMissing
    val keep = merged.filter(!todoFilter)
    val todo = merged.filter(todoFilter).drop("background")

    val outSchema = StructType(todo.schema.fields :+ StructField("background", StringType, nullable = true))
    val enc = Encoders.row(outSchema)
    val nameIdx = todo.schema.fieldIndex("full_name")
    val computed = todo.mapPartitions { it =>
      val client = clientFactory()
      it.map { row =>
        val name = Option(row.getString(nameIdx)).map(_.trim).getOrElse("")
        val out =
          if (name.isEmpty) null // missing full_name → skip (…:333-335)
          else Try(stripCitationsAndLinks(client.complete(summarizerPrompt(name))))
            .toOption.map(s => if (s.isEmpty) null else s).orNull
        Row.fromSeq(row.toSeq :+ out)
      }
    }(enc)
    keep.unionByName(computed)
  }

  // ---------------- member photo urls ----------------

  /** to_public_profile_url (members_photo_urls.py:97-116). */
  def toPublicProfileUrl(memberUri: String): Option[String] = {
    val uri = Option(memberUri).getOrElse("")
    if (uri.contains("data.oireachtas.ie") && uri.contains("/ie/oireachtas/member/id/"))
      Some(uri.replace(
        "https://data.oireachtas.ie/ie/oireachtas/member/id/",
        "https://www.oireachtas.ie/en/members/member/").stripSuffix("/") + "/")
    else if (uri.startsWith("http://") || uri.startsWith("https://"))
      Some(uri.stripSuffix("/") + "/")
    else None
  }

  /** Photo extraction from profile HTML (…:118-139): the confirmed
    * selector, then fallback patterns, resolved against the page URL.
    * Regex-based (no DOM library in the runtime); matches the same four
    * selector patterns.
    */
  def extractPhotoUrl(profileUrl: String, html: String): Option[String] = {
    val h = Option(html).getOrElse("")
    def imgTags: Iterator[String] = """(?is)<img\b[^>]*>""".r.findAllIn(h)
    def attr(tag: String, name: String): Option[String] =
      s"""(?is)\\b$name\\s*=\\s*["']([^"']*)["']""".r.findFirstMatchIn(tag).map(_.group(1))
    def hasClass(tag: String, cls: String): Boolean =
      attr(tag, "class").exists(_.split("\\s+").contains(cls))

    val candidate =
      imgTags.find(hasClass(_, "c-member-about__img"))
        .orElse(imgTags.find(hasClass(_, "member-profile-photo")))
        .orElse {
          // div.member-image img: first img after a member-image div open
          """(?is)<div\b[^>]*class\s*=\s*["'][^"']*\bmember-image\b[^"']*["'][^>]*>.*?(<img\b[^>]*>)""".r
            .findFirstMatchIn(h).map(_.group(1))
        }
        .orElse(imgTags.find(t => attr(t, "src").exists(_.contains("/media/members/photo/"))))

    candidate.flatMap(attr(_, "src")).filter(_.nonEmpty).map { src =>
      Try(new java.net.URI(profileUrl).resolve(src).toString).getOrElse(src)
    }
  }

  /** Page fetcher seam — real HTTP in production, stubbed in tests (the
    * runtime has no egress).
    */
  trait PageFetcher extends Serializable { def fetch(url: String): String }

  /** Full photo pass (…:152-231): resume map from existing output, only
    * missing rows fetched; no profile URL / no image / fetch error → null.
    */
  def runPhotoUrls(base: DataFrame, existing: DataFrame,
                   fetcherFactory: () => PageFetcher): DataFrame = {
    val b = base.select(trim(col("member_code")).as("member_code"),
      col("full_name"), col("member_uri"))
    val merged =
      if (existing.isEmpty || !existing.columns.contains("member_code") ||
          !existing.columns.contains("photo_url"))
        b.withColumn("photo_url", lit(null).cast("string"))
      else
        b.join(existing.select(trim(col("member_code")).as("member_code"),
            // blank existing values do not count as done (is_missing)
            when(trim(col("photo_url")) === "", lit(null).cast("string"))
              .otherwise(col("photo_url")).as("photo_url")),
          Seq("member_code"), "left")

    val keep = merged.filter(col("photo_url").isNotNull)
    val todo = merged.filter(col("photo_url").isNull).drop("photo_url")

    val outSchema = StructType(todo.schema.fields :+ StructField("photo_url", StringType, nullable = true))
    val enc = Encoders.row(outSchema)
    val uriIdx = todo.schema.fieldIndex("member_uri")
    val computed = todo.mapPartitions { it =>
      val fetcher = fetcherFactory()
      it.map { row =>
        val uri = Option(row.getString(uriIdx)).getOrElse("")
        val out = toPublicProfileUrl(uri).flatMap { profile =>
          Try(extractPhotoUrl(profile, fetcher.fetch(profile))).toOption.flatten
        }.orNull
        Row.fromSeq(row.toSeq :+ out)
      }
    }(enc)
    keep.unionByName(computed).drop("member_uri")
  }

  // ---------------- constituency images ----------------

  /** enrichment_constituency_images.py _stable_hash (:190-191): sha256 of
    * json.dumps(list, sort_keys=True) with Python's DEFAULT separators
    * (", " — unlike normalize.py's compact stable_json_dumps), 24-hex
    * prefix.
    */
  def imagesStableHash(values: Seq[String]): String = {
    val json = values.map(graft.io.StableJson.write).mkString("[", ", ", "]")
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(json.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(24)
  }

  /** _constituency_from_filename (:173-179): stem minus a cover/image
    * suffix, separators to spaces, each word capitalized. The stem is the
    * part before the LAST dot (Python rsplit('.', 1)[0]), so multi-dot
    * names keep their interior dots.
    */
  def constituencyFromFilename(filename: String): String = {
    val f = Option(filename).getOrElse("")
    val dot = f.lastIndexOf('.')
    var stem = if (dot >= 0) f.substring(0, dot) else f
    Seq("_cover", "-cover", "_image", "-image").foreach { suffix =>
      if (stem.toLowerCase.endsWith(suffix)) stem = stem.dropRight(suffix.length)
    }
    stem.replace('_', ' ').replace('-', ' ').trim
      .split("\\s+").filter(_.nonEmpty)
      .map(w => w.head.toUpper.toString + w.tail.toLowerCase).mkString(" ")
  }

  /** _extension (:182-187): lowered suffix after the LAST dot, jpg → jpeg,
    * "" if no dot. A trailing dot ("file.") yields "" (media_type
    * image/unknown), matching Python rsplit — not the pre-dot stem.
    */
  def imageExtension(filename: String): String = {
    val f = Option(filename).getOrElse("")
    val dot = f.lastIndexOf('.')
    if (dot < 0) ""
    else f.substring(dot + 1).toLowerCase match { case "jpg" => "jpeg"; case e => e }
  }

  private def firstCol(df: DataFrame, names: String*): org.apache.spark.sql.Column =
    names.find(df.columns.contains).map(n => coalesce(col(n).cast("string"), lit("")))
      .getOrElse(lit(""))

  /** Unified enrichment table from the legacy constituency image index
    * (_build_trial_df :140-162): column-name fallbacks, constituency
    * inferred from the filename when blank, stable record/source hashes,
    * media type from the extension. Pure projection (the two helpers run
    * as UDFs — tiny curated catalog, but the plan stays distributed);
    * ordered like the reference (constituency, filename, record_id).
    * No resume pass: the builder is a full deterministic reshape of the
    * index, not an accumulating LLM enrichment.
    */
  def buildConstituencyImages(source: DataFrame, runId: String,
                              sourceKey: String, rowLimit: Int = 0): DataFrame = {
    val limited = if (rowLimit > 0) source.limit(rowLimit) else source
    val hashU = udf((a: String, b: String, c: String) => imagesStableHash(Seq(a, b, c)))
    val conU = udf(constituencyFromFilename _)
    val extU = udf(imageExtension _)
    limited.select(
        firstCol(limited, "filename", "file_name").as("filename"),
        firstCol(limited, "s3_key", "image_key", "key").as("image_key"),
        firstCol(limited, "url", "image_url").as("image_url"),
        firstCol(limited, "constituency", "constituency_name").as("_con"))
      .select(
        concat(lit("constituency_image:"),
          hashU(col("image_key"), col("image_url"), col("filename"))).as("record_id"),
        when(col("_con") =!= "", col("_con"))
          .otherwise(conU(col("filename"))).as("constituency"),
        col("filename"), col("image_key"), col("image_url"),
        concat(lit("image/"),
          when(extU(col("filename")) === "", "unknown")
            .otherwise(extU(col("filename")))).as("media_type"),
        lit(sourceKey).as("source_key"),
        lit("legacy_constituency_image_index").as("source_system"),
        // source_hash folds (filename, key, url) — note the different
        // field order vs record_id (:158)
        hashU(col("filename"), col("image_key"), col("image_url")).as("source_hash"),
        lit("").as("retrieved_at_utc"),
        lit("unreviewed").as("review_status"),
        lit(runId).as("run_id"))
      .orderBy("constituency", "filename", "record_id")
  }

  /** Legacy-compatible adapter (_build_compat_df :165-170): the three
    * legacy columns, ordered by (filename, s3_key) — exactly the frame
    * RendererContext.pickConstituencyImage consumes.
    */
  def constituencyImagesCompat(trial: DataFrame): DataFrame =
    trial.select(col("filename"), col("image_key").as("s3_key"), col("image_url").as("url"))
      .orderBy("filename", "s3_key")

  /** One-row DQ summary (_dq :195-231): row count, pk uniqueness,
    * constituency population, image locator coverage, expected-rows
    * check; dq_status pass only when every check passes.
    */
  def constituencyImagesDq(trial: DataFrame, sourceRows: Long, rowLimit: Int = 0): DataFrame = {
    val expected = if (rowLimit > 0) math.min(sourceRows, rowLimit.toLong) else sourceRows
    val agg = trial.agg(
      count(lit(1)).as("row_count"),
      count_distinct(col("record_id")).as("_distinct_pk"),
      sum(when(trim(col("constituency")) =!= "", 1L).otherwise(0L)).as("_con_pop"),
      sum(when(trim(col("image_key")) =!= "" || trim(col("image_url")) =!= "", 1L)
        .otherwise(0L)).as("image_locator_populated_count"))
    agg.select(
        col("row_count"),
        (col("_distinct_pk") === col("row_count") && col("row_count") > 0).as("primary_key_unique"),
        (col("_con_pop") === col("row_count") && col("row_count") > 0).as("constituency_populated"),
        col("image_locator_populated_count"),
        (col("row_count") - col("image_locator_populated_count")).as("image_locator_missing_count"),
        (col("row_count") === expected).as("row_count_expected"))
      .withColumn("dq_status",
        when(col("row_count") > 0 && col("primary_key_unique") &&
          col("constituency_populated") && col("image_locator_missing_count") === 0 &&
          col("row_count_expected"), "pass").otherwise("fail"))
  }
}
