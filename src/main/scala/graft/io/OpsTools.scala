package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.functions.Fns

/** Operational driver tools (the reference's thin `process/` scripts over
  * published storage): object-store inventory audit
  * (process/oireachtas_audit_inventory.py:1-77) and the deterministic
  * Instagram copy-pack builder
  * (process/instagram_build_copy_pack.py:1-170). The column-drop rewrite
  * (process/delete_s3_column.py) lives in [[TableIO.dropColumn]].
  *
  * Both are driver-side orchestration over bounded data (a file listing,
  * a ≤200-row review roster) — the same split the reference uses; the
  * heavy lifting stays in the distributed operators that produced the
  * audited/packed artifacts.
  */
object OpsTools {

  /** The reference's audited prefixes (oireachtas_audit_inventory.py:13-20),
    * relative to the store root.
    */
  val DefaultAuditPrefixes: Seq[String] = Seq(
    "processed/oireachtas_unified/latest/",
    "processed/oireachtas_unified/compat/",
    "processed/oireachtas_unified/silver/",
    "processed/oireachtas_unified/gold/",
    "processed/oireachtas_unified/control/",
    "processed/oireachtas_unified/review/")

  /** One inventory row per stored object under the audited prefixes
    * (recursive listing, key-sorted), as a DataFrame:
    * (prefix, key, size, etag, last_modified_utc, storage_class).
    * `etag`/`storage_class` are object-store metadata with no filesystem
    * analog — empty strings off S3, matching the reference's
    * `obj.get(..., "")` defaults for stores that omit them.
    */
  def inventoryRows(spark: SparkSession, root: String,
                    prefixes: Seq[String] = DefaultAuditPrefixes): DataFrame = {
    val fs = FileSystem.get(new java.net.URI(root).resolve("/"),
      spark.sparkContext.hadoopConfiguration)
    val rootPath = new Path(root)
    val iso = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ssXXX")
      .withZone(java.time.ZoneOffset.UTC)
    val qualifiedRoot = fs.makeQualified(rootPath).toString
    val rows = prefixes.flatMap { prefix =>
      val p = new Path(rootPath, prefix.stripSuffix("/"))
      if (!fs.exists(p)) Nil
      else {
        val it = fs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (it.hasNext) {
          val st = it.next()
          val key = fs.makeQualified(st.getPath).toString
            .stripPrefix(qualifiedRoot).stripPrefix("/")
          buf += Row(prefix, key, st.getLen,
            "", iso.format(java.time.Instant.ofEpochMilli(st.getModificationTime)), "")
        }
        buf.toSeq
      }
    }.sortBy(_.getString(1))
    val schema = StructType(Seq(
      StructField("prefix", StringType), StructField("key", StringType),
      StructField("size", LongType), StructField("etag", StringType),
      StructField("last_modified_utc", StringType),
      StructField("storage_class", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Full audit run (the script's main): writes `s3_inventory.csv`
    * (key-sorted) and a `summary.json` with object/byte totals and
    * per-prefix counts into `outDir`, and returns the summary. The clock
    * injects for deterministic tests (F4 convention).
    */
  def auditInventory(spark: SparkSession, root: String, outDir: String,
                     prefixes: Seq[String] = DefaultAuditPrefixes,
                     now: () => String = BatchStore.defaultNow): Map[String, Any] = {
    val inv = inventoryRows(spark, root, prefixes)
    TableIO.writeCsv(inv.orderBy("key"), s"$outDir/s3_inventory.csv")
    val collected = inv.collect()
    val summary: Map[String, Any] = Map(
      "generated_at_utc" -> now(),
      "root" -> root,
      "object_count" -> collected.length,
      "total_bytes" -> collected.map(_.getLong(2)).sum,
      "prefix_counts" -> prefixes.map(p =>
        p -> collected.count(_.getString(0) == p)).toMap)
    val fs = FileSystem.get(new java.net.URI(outDir).resolve("/"),
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(s"$outDir/summary.json"), true)
    try out.write(StableJson.write(summary).getBytes("UTF-8")) finally out.close()
    summary
  }

  // ---------------- Instagram copy pack ----------------

  /** Default hashtag set (instagram_build_copy_pack.py:15-21). */
  val DefaultHashtags: Seq[String] = Seq(
    "#EirePolitic", "#IrishPolitics", "#DailEireann", "#Oireachtas", "#DataPolitics")

  /** Comma-separated hashtag override → normalized list: blanks drop,
    * a missing `#` is prepended, an empty result falls back to the
    * defaults (normalize_hashtags, instagram_build_copy_pack.py:37-48).
    */
  def normalizeHashtags(raw: Option[String]): Seq[String] = raw match {
    case None | Some("") => DefaultHashtags
    case Some(s) =>
      val tags = s.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        .map(t => if (t.startsWith("#")) t else s"#$t")
      if (tags.nonEmpty) tags else DefaultHashtags
  }

  /** Blank/NaN-coalescing display value (clean(),
    * instagram_build_copy_pack.py:30-34): null, empty, or "nan" → the
    * default.
    */
  private def cleanCol(c: org.apache.spark.sql.Column, default: String) = {
    val t = trim(coalesce(c.cast("string"), lit("")))
    when(t === "" || t === "nan" || t === "NaN", lit(default)).otherwise(t)
  }

  /** Copy-pack rows derived from a review table — slug, deterministic
    * caption and alt text, joined hashtags, and safety notes
    * (build_caption/build_alt_text/build_safety_notes,
    * instagram_build_copy_pack.py:51-97) — as a distributed projection
    * over the review frame. Missing review columns are treated as blank
    * (the reference's `row.get`).
    */
  def copyPackRows(review: DataFrame, hashtags: Seq[String] = DefaultHashtags): DataFrame = {
    def c(name: String, default: String = "N/A") =
      cleanCol(if (review.columns.contains(name)) col(name) else lit(""), default)
    val fullName = c("full_name")
    val party = c("party")
    val constituency = c("constituency")
    val topIssue = c("top_issue_2025", "No classified issue yet")
    val vote = c("vote_participation_pct_2025")
    val speechCount = c("speech_count_2025", "0")
    val speechRank = c("speech_rank_2025")
    val tagLine = hashtags.mkString(" ")

    val caption = concat(
      lit("TD profile: "), fullName, lit(" ("), party, lit(", "), constituency, lit(").\n\n"),
      lit("Top 2025 debate issue in this dataset: "), topIssue, lit(".\n"),
      lit("Vote participation: "), vote, lit(".\n"),
      lit("Speech activity: "), speechCount, lit(" issue-labelled speeches; rank "),
      speechRank, lit(".\n\n"),
      lit("Source: Oireachtas data pipeline. Review before publishing.\n\n"),
      lit(tagLine))
    val altText = concat(
      lit("Profile card for "), fullName, lit(", "), party, lit(" TD for "), constituency,
      lit(". The card lists top 2025 debate issue as "), topIssue,
      lit(", vote participation as "), vote, lit(", and speech activity as "),
      speechCount, lit(" issue-labelled speeches with rank "), speechRank, lit("."))
    val safetyNotes = array_join(filter(array(
      when(lower(c("publish_ready", "no")) =!= "yes", lit("publish_ready is not yes")),
      when(lower(c("needs_photo_check", "no")) === "yes", lit("photo needs checking")),
      when(c("warnings", "") =!= "", concat(lit("render warnings: "), c("warnings", "")))
    ), _.isNotNull), "; ")

    review.select(
      // slugify: lower, non-alnum runs → "-", trim "-", empty → "item"
      when(Fns.slug(fullName) === "", lit("item")).otherwise(Fns.slug(fullName)).as("slug"),
      fullName.as("full_name"), party.as("party"), constituency.as("constituency"),
      c("output_file_rel", "").as("output_file_rel"),
      caption.as("caption"), altText.as("alt_text"),
      lit(tagLine).as("hashtags"),
      c("publish_ready", "no").as("publish_ready"),
      c("review_status", "needs_review").as("review_status"),
      safetyNotes.as("safety_notes"))
  }

  /** The full copy-pack build: per-row `<slug>.caption.txt` /
    * `<slug>.alt_text.txt` files, a BOM'd `captions.csv`, and a
    * `copy_manifest.json` under `copyDir`; returns the manifest. The
    * roster is bounded (one row per member profile — the reference
    * iterates a pandas frame), so the per-file writes collect the
    * same bounded frame driver-side.
    */
  def buildCopyPack(review: DataFrame, copyDir: String,
                    hashtags: Seq[String] = DefaultHashtags,
                    now: () => String = BatchStore.defaultNow): Map[String, Any] = {
    val spark = review.sparkSession
    val rows = copyPackRows(review, hashtags)
      .withColumn("caption_file", concat(lit(s"$copyDir/"), col("slug"), lit(".caption.txt")))
      .withColumn("alt_text_file", concat(lit(s"$copyDir/"), col("slug"), lit(".alt_text.txt")))
    val ordered = rows.select("slug", "full_name", "party", "constituency",
      "output_file_rel", "caption_file", "alt_text_file", "caption", "alt_text",
      "hashtags", "publish_ready", "review_status", "safety_notes")
    val fs = FileSystem.get(new java.net.URI(copyDir).resolve("/"),
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(copyDir))
    val collected = ordered.collect()
    collected.foreach { r =>
      def write(path: String, text: String): Unit = {
        val out = fs.create(new Path(path), true)
        try out.write(text.getBytes("UTF-8")) finally out.close()
      }
      write(r.getAs[String]("caption_file"), r.getAs[String]("caption"))
      write(r.getAs[String]("alt_text_file"), r.getAs[String]("alt_text"))
    }
    TableIO.writeCsv(ordered, s"$copyDir/captions.csv", bom = true)
    val manifest: Map[String, Any] = Map(
      "success" -> true,
      "created_at" -> now(),
      "copy_dir" -> copyDir,
      "captions_csv" -> s"$copyDir/captions.csv",
      "items" -> collected.map(r => ordered.columns.map(c =>
        c -> String.valueOf(r.getAs[Any](c))).toMap).toSeq,
      "notes" -> Seq(
        "Captions and alt text are deterministic draft copy only.",
        "Do not publish until review_status and publish_ready are manually updated in the review table.",
        "Check metrics, names, constituencies, photos, and warning flags before publishing."))
    val out = fs.create(new Path(s"$copyDir/copy_manifest.json"), true)
    try out.write(StableJson.write(manifest).getBytes("UTF-8")) finally out.close()
    manifest
  }
}
