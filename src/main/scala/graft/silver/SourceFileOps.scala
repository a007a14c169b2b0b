package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Source-file discovery helpers shared by the bill/debate satellite tables
  * and the source-file inventory itself (reference
  * table_bill_versions.py:210-275, table_source_files.py:1-466,
  * normalize.py:84-93). Everything is a Column expression — the reference
  * runs this per row in Python; here it stays inside codegen.
  */
object SourceFileOps {

  private val dataBaseUrl = "https://data.oireachtas.ie"
  private val knownExts = Seq("pdf", "xml", "json", "html", "txt", "csv")

  private def nonBlank(c: Column): Column =
    when(trim(coalesce(c, lit(""))) === "", lit(null)).otherwise(trim(c))

  private def isHttp(c: Column): Column =
    c.isNotNull && (c.startsWith("http://") || c.startsWith("https://"))

  /** One format locator (table_bill_versions.py:210-226): given the raw
    * format object's candidate fields, produce (format_uri, url_for_hash,
    * output_url). uri/url cross-promote when http-absolute, and the output
    * URL is absolutized against the data host.
    */
  final case class FormatLocator(uri: Column, urlForHash: Column, url: Column)

  def formatLocator(rawUri: Column, rawUrl: Column): FormatLocator = {
    val u0 = nonBlank(rawUri)
    val r0 = nonBlank(rawUrl)
    val urlForHash = coalesce(r0, when(isHttp(u0), u0))
    val uriOut = coalesce(u0, when(isHttp(urlForHash), urlForHash))
    FormatLocator(uriOut, urlForHash, normalizeFormatUrl(coalesce(urlForHash, uriOut)))
  }

  /** normalize.py:84-93: absolute http URLs pass through; else ensure one
    * leading slash and prefix the data host.
    */
  def normalizeFormatUrl(c: Column): Column =
    when(c.isNull, lit(null))
      .when(isHttp(c), c)
      .when(c.startsWith("/"), concat(lit(dataBaseUrl), c))
      .otherwise(concat(lit(dataBaseUrl + "/"), c))

  /** source_file surrogate id (table_bill_versions.py:229-233,
    * table_debate_records.py _source_file_id): null when neither locator
    * resolved, else stable hash over (entity_type, entity_id, format,
    * uri, url).
    */
  def sourceFileId(entityType: String, entityId: Column, formatType: String,
                   formatUri: Column, formatUrl: Column): Column =
    when(formatUri.isNull && formatUrl.isNull, lit(null))
      .otherwise(concat(lit("source_file:"),
        Fns.stableHash(24, lit(entityType), entityId, lit(formatType), formatUri, formatUrl)))

  /** Python `_safe_slug` (table_bill_versions.py:245-253): strip scheme,
    * keep alnum and - _ ., everything else → '-', strip edge dashes.
    * str.isalnum() is Unicode-aware (á/é in Irish-language ids survive),
    * so the keep-class is \p{L}\p{N}, not ASCII.
    */
  def safeSlug(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(trim(coalesce(c, lit(""))), "https://|http://", ""),
        "[^\\p{L}\\p{N}\\-_.]", "-"),
      "(^-+)|(-+$)", "")

  /** URL path without query/fragment, lowercased — feeds extension
    * inference (table_source_files.py _infer_format_type).
    */
  private def urlPath(c: Column): Column =
    lower(regexp_extract(c, "^(?:[a-z]+://[^/]*)?([^?#]*)", 1))

  def inferFormatType(url: Column): Column = {
    val p = urlPath(coalesce(url, lit("")))
    knownExts.foldLeft(lit(null).cast("string")) { (acc, ext) =>
      when(p.endsWith("." + ext), lit(ext)).otherwise(acc)
    }
  }

  /** table_source_files.py `_extension`: declared type if known, else the
    * URL-inferred one, else "bin".
    */
  def extension(formatType: Column, url: Column): Column = {
    val inferred = inferFormatType(url)
    val fmt = regexp_replace(lower(trim(coalesce(formatType, inferred, lit("bin")))), "^\\.+|\\.+$", "")
    when(fmt.isin(knownExts: _*), fmt).otherwise(coalesce(inferred, lit("bin")))
  }

  def contentType(formatType: Column, url: Column): Column = {
    val ext = extension(formatType, url)
    when(ext === "xml", "application/xml")
      .when(ext === "pdf", "application/pdf")
      .when(ext === "json", "application/json")
      .when(ext === "html", "text/html")
      .when(ext === "txt", "text/plain")
      .when(ext === "csv", "text/csv")
      .otherwise(lit(null).cast("string"))
  }

  /** Landing key for a fetched source file (table_bill_versions.py:236-242):
    * entity slug is the LAST 120 chars of the slug (ids are URIs whose
    * tail is the discriminating part).
    */
  def targetKey(entityType: String, entityId: Column, sourceFileId: Column,
                formatType: Column, formatUrl: Column): Column = {
    val slugged = safeSlug(entityId)
    val entitySlug =
      when(length(slugged) > 120, substring(slugged, -120, 120)).otherwise(slugged)
    when(sourceFileId.isNull, lit(null))
      .otherwise(concat(
        lit("raw/oireachtas_unified/source_files/"), lit(entityType), lit("/"),
        when(entitySlug === "", lit("entity")).otherwise(entitySlug), lit("/"),
        safeSlug(sourceFileId), lit("."), extension(formatType, formatUrl)))
  }

  /** The source-file inventory row shape (table_source_files.py
    * `_normalise_format_row`): derive one row per (entity, format) with
    * download bookkeeping columns initialized.
    */
  def inventoryRows(df: DataFrame, entityType: String, entityIdCol: String,
                    formats: Seq[(String, String, String)]): DataFrame = {
    // formats: (formatType, uriCol, urlCol) triples present on df
    val perFormat = formats.map { case (ft, uriCol, urlCol) =>
      val loc = formatLocator(col(uriCol), col(urlCol))
      val fid = sourceFileId(entityType, col(entityIdCol), ft, loc.uri, loc.urlForHash)
      df.select(
        fid.as("source_file_id"),
        lit(entityType).as("source_entity_type"),
        col(entityIdCol).as("source_entity_id"),
        coalesce(extension(lit(ft), loc.url), lit("unknown")).as("format_type"),
        loc.uri.as("format_uri"),
        loc.url.as("format_url"),
        targetKey(entityType, col(entityIdCol), fid, lit(ft), loc.url).as("s3_key"),
        contentType(lit(ft), loc.url).as("content_type"),
        lit("not_downloaded").as("download_status"),
        lit(null).cast("string").as("downloaded_at_utc"),
        lit(null).cast("string").as("byte_size"),
        lit(null).cast("string").as("etag_or_hash"))
        .filter(col("source_file_id").isNotNull)
    }
    perFormat.reduce(_ unionByName _)
  }
}
