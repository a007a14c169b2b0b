package graft

import java.nio.file.Files

import graft.io.{OpsTools, StableJson}

/** Ports of the reference's operational driver scripts: the object-store
  * inventory audit (oireachtas_audit_inventory.py) and the deterministic
  * Instagram copy-pack builder (instagram_build_copy_pack.py). Expected
  * strings are hand-derived from the reference's Python.
  */
class OpsToolsSpec extends SparkSpec {
  import spark.implicits._

  test("inventory audit lists prefixes recursively, key-sorted, with a summary") {
    val root = Files.createTempDirectory("graft_audit_root").toString
    val out = Files.createTempDirectory("graft_audit_out").toString
    def put(rel: String, bytes: Int): Unit = {
      val f = new java.io.File(root, rel)
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, Array.fill[Byte](bytes)(65))
    }
    put("processed/oireachtas_unified/latest/members.parquet/part-0.parquet", 10)
    put("processed/oireachtas_unified/latest/members.csv", 7)
    put("processed/oireachtas_unified/gold/profile.csv", 5)
    put("processed/oireachtas_unified/unaudited/skip.csv", 99) // outside prefixes

    val summary = OpsTools.auditInventory(spark, root, out,
      now = () => "2026-08-13T00:00:00Z")
    assert(summary("object_count") == 3)
    assert(summary("total_bytes") == 22L)
    val counts = summary("prefix_counts").asInstanceOf[Map[String, Long]]
    assert(counts("processed/oireachtas_unified/latest/") == 2L)
    assert(counts("processed/oireachtas_unified/gold/") == 1L)
    assert(counts("processed/oireachtas_unified/review/") == 0L)

    val csv = spark.read.option("header", "true").csv(s"$out/s3_inventory.csv")
      .collect().map(r => (r.getAs[String]("key"), r.getAs[String]("size")))
    assert(csv.map(_._1).toSeq == csv.map(_._1).toSeq.sorted, "inventory not key-sorted")
    assert(csv.toMap.apply("processed/oireachtas_unified/latest/members.csv") == "7")

    val js = StableJson.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "summary.json")), "UTF-8"))
      .asInstanceOf[Map[String, Any]]
    assert(js("generated_at_utc") == "2026-08-13T00:00:00Z")
    assert(js("object_count") == 3L && js("total_bytes") == 22L)
  }

  test("max-length fixture picks longest values per field with the reference tie-break") {
    val out = Files.createTempDirectory("graft_maxlen").resolve("fixture.csv").toString
    val review = Seq(
      // longest full_name row is the base row; its extra column rides along
      ("Seán Ó Coileáin-Mac Gearailt", "FF", "Cork North", "", "82%",
        "m-001", "https://ex.org/a.png", "base"),
      // ties on length for party ("IND" vs "SDP"): alphabetically
      // earliest lowercase wins → "IND"
      ("Mary Black", "IND", "Galway West Connemara South", "Housing", "91.5%",
        "m-002", "", "other"),
      ("Tom Green", "SDP", "Cork", "Climate and Just Transition", "7%",
        "m-003", "not-a-url", "other2")
    ).toDF("full_name", "party", "constituency", "top_issue_2025",
      "vote_participation_pct_2025", "member_code", "photo_url", "extra")

    val meta = OpsTools.writeMaxLengthFixture(review, out,
      now = () => "2026-08-14T00:00:00Z")
    val row = spark.read.option("header", "true").csv(out).collect()(0)
    assert(row.getAs[String]("full_name") == "Seán Ó Coileáin-Mac Gearailt")
    assert(row.getAs[String]("party") == "IND", "tie must break alphabetically")
    assert(row.getAs[String]("constituency") == "Galway West Connemara South")
    assert(row.getAs[String]("top_issue_2025") == "Climate and Just Transition")
    assert(row.getAs[String]("vote_participation_pct_2025") == "91.5%")
    assert(row.getAs[String]("member_code") == "synthetic-max-length")
    assert(row.getAs[String]("photo_url") == "https://ex.org/a.png",
      "non-http photo values must not win")
    assert(row.getAs[String]("extra") == "base", "base-row columns must ride along")

    assert(meta("selected_full_name") == "Seán Ó Coileáin-Mac Gearailt")
    assert(meta("synthetic_row") == true && meta("input_rows") == 3)
    val fs = meta("field_sources").asInstanceOf[Map[String, Map[String, Any]]]
    assert(fs("party")("value") == "IND" && fs("party")("source_row_index") == 1)
    assert(fs("top_issue_2025")("source_full_name") == "Tom Green")
    assert(fs("photo_url")("length") == 20)
    // metadata json lands next to the csv
    val metaJson = StableJson.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out.replaceAll("\\.csv$", "") + ".metadata.json")), "UTF-8"))
      .asInstanceOf[Map[String, Any]]
    assert(metaJson("selection_mode") == "synthetic_longest_value_per_field")
  }

  test("copy pack builds reference captions, alt text, safety notes, and files") {
    val copyDir = Files.createTempDirectory("graft_copy_pack").resolve("copy").toString
    val review = Seq(
      ("Seán Ó Briain", "Ind", "Galway West", "", "82%", "", "3", "no", "yes", "low-res photo", "ok.png"),
      ("Mary Black", "FF", "Cork North", "Housing", "91%", "12", "1", "yes", "no", "", "img/mary.png")
    ).toDF("full_name", "party", "constituency", "top_issue_2025",
      "vote_participation_pct_2025", "speech_count_2025", "speech_rank_2025",
      "publish_ready", "needs_photo_check", "warnings", "output_file_rel")

    val manifest = OpsTools.buildCopyPack(review, copyDir,
      now = () => "2026-08-13T00:00:00Z")
    val items = manifest("items").asInstanceOf[Seq[Map[String, String]]]
    assert(items.size == 2)
    val sean = items.find(_("full_name") == "Seán Ó Briain").get

    // slugify: non-[a-z0-9] runs → "-" (reference slugify, line 24-27)
    assert(sean("slug") == "se-n-briain", sean("slug"))
    // caption: blank top issue / speech count fall back to the
    // reference's defaults (build_caption, lines 51-70)
    val expectedCaption =
      """TD profile: Seán Ó Briain (Ind, Galway West).
        |
        |Top 2025 debate issue in this dataset: No classified issue yet.
        |Vote participation: 82%.
        |Speech activity: 0 issue-labelled speeches; rank 3.
        |
        |Source: Oireachtas data pipeline. Review before publishing.
        |
        |#EirePolitic #IrishPolitics #DailEireann #Oireachtas #DataPolitics""".stripMargin
    assert(sean("caption") == expectedCaption, sean("caption"))
    assert(sean("alt_text") ==
      "Profile card for Seán Ó Briain, Ind TD for Galway West. " +
        "The card lists top 2025 debate issue as No classified issue yet, " +
        "vote participation as 82%, and speech activity as 0 issue-labelled " +
        "speeches with rank 3.", sean("alt_text"))
    assert(sean("safety_notes") ==
      "publish_ready is not yes; photo needs checking; render warnings: low-res photo")

    val mary = items.find(_("full_name") == "Mary Black").get
    assert(mary("slug") == "mary-black" && mary("safety_notes") == "")

    // per-slug text files + BOM'd captions.csv exist with the same copy
    val capFile = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(copyDir, "se-n-briain.caption.txt")), "UTF-8")
    assert(capFile == expectedCaption)
    val csvBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(copyDir, "captions.csv"))
    assert(csvBytes(0) == 0xEF.toByte && csvBytes(1) == 0xBB.toByte && csvBytes(2) == 0xBF.toByte,
      "captions.csv missing the utf-8-sig BOM")

    // hashtag normalization (normalize_hashtags, lines 37-48)
    assert(OpsTools.normalizeHashtags(Some("a, #b ,")) == Seq("#a", "#b"))
    assert(OpsTools.normalizeHashtags(Some(" ")) == OpsTools.DefaultHashtags)
    assert(OpsTools.normalizeHashtags(None) == OpsTools.DefaultHashtags)
  }

  test("cleanColumnNames ports the csv-to-parquet recode's clean + probing dedupe") {
    // reference process/debate_speeches_csv_to_parquet.py:35-60 —
    // lowercase, whitespace/hyphens → _, OTHER non-alphanumerics DROPPED
    // (ascii-only keep: the accent vanishes, not folds), collapse/trim,
    // empty → col; dedupe probes _2, _3... against every taken name
    val df = Seq(("x", "x", "x", "x", "x", "x", "x"))
      .toDF(" Speaker-Name ", "café", "name_2", "Name", "name", "%%", "a..b")
    val cleaned = graft.io.TableIO.cleanColumnNames(df)
    assert(cleaned.columns.toSeq ==
      Seq("speaker_name", "caf", "name_2", "name", "name_3", "col", "ab"),
      cleaned.columns.toSeq.toString)
  }

  test("option-5 review sheet: manifest columns first, seven blank review columns appended") {
    // reference process/instagram_option5_build_review_sheet.py:24-45 —
    // the generated-image manifest (instagram_option5_generate_images.py:125-136
    // column set) plus blank hand-review fields, original columns first
    val manifest = Seq(
      ("rec1", "Dublin Bay North", "warm", "0", "ab12", "img-model",
        "1024x1536", "/r/images/rec1.png", "/r/specs/rec1.yaml", "generated"),
      ("rec2", "Cork East", "cool", "1", "cd34", "img-model",
        "1024x1536", "/r/images/rec2.png", "/r/specs/rec2.yaml", "generated"))
      .toDF("record_id", "constituency_name", "style_direction", "variant_index",
        "prompt_hash", "model", "size", "image_path", "render_spec_path", "status")
    val sheet = OpsTools.buildReviewSheet(manifest)
    assert(sheet.columns.toSeq == manifest.columns.toSeq ++ OpsTools.ReviewSheetColumns)
    val rows = sheet.orderBy("record_id").collect()
    assert(rows.length == 2)
    assert(rows.forall(r => OpsTools.ReviewSheetColumns
      .forall(c => r.getAs[String](c) == "")), "review fields must start blank")
    assert(rows.head.getAs[String]("record_id") == "rec1" &&
      rows.head.getAs[String]("status") == "generated")

    // a stale review column in the input is re-blanked (the reference's
    // dict-merge overwrite), never carried into a fresh sheet
    val stale = manifest.withColumn("approved",
      org.apache.spark.sql.functions.lit("yes"))
    val refreshed = OpsTools.buildReviewSheet(stale)
    assert(refreshed.select("approved").collect().forall(_.getString(0) == ""))

    // write-through lands at <runRoot>/review/review_sheet.csv and
    // round-trips through the all-string CSV reader
    val root = Files.createTempDirectory("graft_option5_").toFile
    org.apache.commons.io.FileUtils.forceDeleteOnExit(root)
    val target = OpsTools.writeReviewSheet(manifest, root.getPath)
    assert(target.endsWith("/review/review_sheet.csv"))
    val back = graft.io.TableIO.readCsvAllString(spark, target, sheet.columns.toSeq)
    assert(back.count() == 2)
    assert(back.columns.toSeq == sheet.columns.toSeq)
  }
}
