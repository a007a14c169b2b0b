package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Fns
import graft.operators.FlattenOps.{FieldSpec, FlattenSpec}

/** Per-table flatten specs (SURVEY §2.4 N1-N5, N7): the data that drives
  * the one flatten engine for the API-backed silver tables. Fallback
  * paths mirror the reference's _first_text chains (table_members.py:195-258,
  * table_divisions.py:157-189, table_division_tallies.py:171-195).
  * Each table also gets its surrogate-key transform hook (M6: ids hash
  * only immutable fields, so closing an end date never forks identity).
  */
object FlattenSpecs {

  private val memberWrappers = Seq("member", "person", "memberDetails")

  val members: FlattenSpec = FlattenSpec(
    wrapperKeys = memberWrappers,
    fields = Seq(
      FieldSpec("full_name", Seq("fullName", "showAs", "name", "displayName")),
      FieldSpec("first_name", Seq("firstName", "forename", "givenName")),
      FieldSpec("last_name", Seq("lastName", "surname", "familyName")),
      FieldSpec("display_name", Seq("showAs", "displayName", "fullName", "name")),
      FieldSpec("member_code", Seq("memberCode", "code", "id")),
      FieldSpec("member_uri", Seq("uri", "memberUri")),
      FieldSpec("gender", Seq("gender", "sex"))))

  /** member_key + code fallback hash (table_members.py:205-227). */
  def membersTransform(df: DataFrame): DataFrame =
    df.withColumn("member_code",
        when(trim(col("member_code")) === "",
          Fns.stableHash(16, col("member_uri"), col("full_name"), col("first_name"), col("last_name")))
          .otherwise(col("member_code")))
      .withColumn("member_key",
        Fns.stableHash(16, col("member_code"), col("member_uri"), col("full_name")))

  val memberMemberships: FlattenSpec = FlattenSpec(
    wrapperKeys = memberWrappers,
    explodePath = Some("memberships"),
    parentFields = Seq(FieldSpec("member_code", Seq("memberCode", "code", "id"))),
    fields = Seq(
      FieldSpec("house_uri", Seq("membership.house.uri", "house.uri", "houseUri")),
      FieldSpec("house_no", Seq("membership.house.houseNo", "house.houseNo", "houseNo")),
      FieldSpec("membership_start", Seq("membership.dateRange.start", "dateRange.start", "start")),
      FieldSpec("membership_end", Seq("membership.dateRange.end", "dateRange.end", "end"))))

  /** Surrogate id excludes the mutable end date (M6,
    * tests/test_oireachtas_write_semantics.py:93-129).
    */
  def membershipsTransform(df: DataFrame): DataFrame =
    df.withColumn("membership_id",
        Fns.stableHash(16, col("member_code"), col("house_uri"), col("membership_start")))
      .withColumn("is_current",
        Fns.isCurrentRange(col("membership_start"), col("membership_end"),
          current_date()).cast("string"))

  val divisions: FlattenSpec = FlattenSpec(
    fields = Seq(
      FieldSpec("division_uri", Seq("uri", "divisionUri", "voteUri")),
      FieldSpec("vote_id", Seq("voteId", "divisionId", "id", "eId")),
      FieldSpec("division_date", Seq("date", "voteDate", "divisionDate")),
      FieldSpec("house_uri", Seq("house.uri", "houseUri")),
      FieldSpec("house_no", Seq("house.houseNo", "house.number", "houseNo")),
      FieldSpec("chamber", Seq("house.houseCode", "house.chamberCode", "house.showAs", "chamberCode")),
      FieldSpec("committee_code", Seq("house.committeeCode", "committeeCode", "committeeId")),
      FieldSpec("subject", Seq("subject.showAs", "subject", "showAs", "title", "motion", "question")),
      FieldSpec("outcome", Seq("outcome", "result", "decision", "voteResult")),
      FieldSpec("debate_id", Seq("debate.debateId", "debateId")),
      FieldSpec("debate_section_id", Seq("debateSection.debateSectionId", "debateSectionId")),
      FieldSpec("debate_show_as", Seq("debateSection.showAs", "debate.showAs", "debateShowAs"))))

  def divisionsTransform(df: DataFrame): DataFrame =
    df.withColumn("division_id",
      when(trim(col("vote_id")) =!= "",
        concat(lit("division:"), col("vote_id"), lit(":"), col("division_date")))
        .otherwise(concat(lit("division:"),
          Fns.stableHash(16, col("division_uri"), col("division_date")))))

  /** Tallies: one row per vote kind from the taVotes/nilVotes/staonVotes
    * payload maps (table_division_tallies.py:171-195). The explode over a
    * fixed key set is data, not code: three specs unioned by the builder.
    */
  def tallySpec(kind: String, payloadKey: String): FlattenSpec = FlattenSpec(
    fields = Seq(
      FieldSpec("vote_id", Seq("voteId", "divisionId", "id")),
      FieldSpec("division_date", Seq("date", "voteDate")),
      FieldSpec("vote_label", Seq(s"$payloadKey.showAs")),
      FieldSpec("api_member_count", Seq(s"$payloadKey.tally")),
      FieldSpec("members_json", Seq(s"$payloadKey.members"))))

  val tallyKinds: Seq[(String, String)] =
    Seq(("ta", "taVotes"), ("nil", "nilVotes"), ("staon", "staonVotes"))

  /** member_count = API tally else member-array length, with mismatch
    * diagnostics (table_division_tallies.py:180, 282-283).
    */
  def tallyTransform(kind: String)(df: DataFrame): DataFrame =
    df.withColumn("vote_code", lit(kind))
      .withColumn("members_size",
        when(col("members_json").isNull, lit(0))
          .otherwise(size(from_json(col("members_json"),
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))))
      .withColumn("member_count",
        coalesce(col("api_member_count").cast("long"), col("members_size").cast("long")).cast("string"))
      .withColumn("tally_mismatch",
        (col("api_member_count").cast("long").isNotNull &&
          col("members_size") > 0 &&
          col("api_member_count").cast("long") =!= col("members_size")).cast("string"))
      .withColumn("division_tally_id",
        Fns.stableHash(16, col("vote_id"), col("division_date"), col("vote_code")))

  val questions: FlattenSpec = FlattenSpec(
    wrapperKeys = Seq("question"),
    fields = Seq(
      FieldSpec("question_uri", Seq("uri", "questionUri")),
      FieldSpec("question_number", Seq("questionNumber", "number")),
      FieldSpec("question_type", Seq("questionType", "type")),
      FieldSpec("question_date", Seq("date", "questionDate")),
      FieldSpec("member_code", Seq("by.memberCode", "memberCode", "by.showAs")),
      FieldSpec("subject", Seq("showAs", "subject", "title")),
      FieldSpec("debate_section_id", Seq("debateSection.debateSectionId", "debateSectionId"))))

  /** Party/constituency/office bridges ride the same memberships explode
    * with deeper fallback paths (table_member_parties.py:205-208,
    * table_member_constituencies.py:231-239, table_member_offices.py:175-197).
    */
  val memberParties: FlattenSpec = FlattenSpec(
    wrapperKeys = memberWrappers,
    explodePath = Some("memberships"),
    parentFields = Seq(FieldSpec("member_code", Seq("memberCode", "code", "id"))),
    fields = Seq(
      FieldSpec("membership_uri", Seq("membership.uri", "uri", "membershipUri")),
      FieldSpec("party_uri", Seq("membership.parties[0].party.uri", "party.uri", "partyUri")),
      FieldSpec("party_name", Seq("membership.parties[0].party.showAs", "party.showAs", "party.partyName", "party.name")),
      FieldSpec("party_start", Seq("membership.parties[0].party.dateRange.start", "party.dateRange.start")),
      FieldSpec("party_end", Seq("membership.parties[0].party.dateRange.end", "party.dateRange.end"))))

  def memberPartiesTransform(df: DataFrame): DataFrame =
    df.withColumn("member_party_id",
        Fns.stableHash(16, col("member_code"), col("party_uri"), col("party_start")))
      .withColumn("is_current",
        Fns.isCurrentRange(col("party_start"), col("party_end"), current_date()).cast("string"))

  val memberConstituencies: FlattenSpec = FlattenSpec(
    wrapperKeys = memberWrappers,
    explodePath = Some("memberships"),
    parentFields = Seq(FieldSpec("member_code", Seq("memberCode", "code", "id"))),
    fields = Seq(
      FieldSpec("constituency_uri", Seq("membership.represents[0].represent.uri", "represent.uri", "constituencyUri")),
      FieldSpec("constituency_name", Seq("membership.represents[0].represent.showAs",
        "represent.showAs", "represent.name", "represent.constituencyName")),
      FieldSpec("represent_start", Seq("membership.represents[0].represent.dateRange.start", "represent.dateRange.start")),
      FieldSpec("represent_end", Seq("membership.represents[0].represent.dateRange.end", "represent.dateRange.end"))))

  def memberConstituenciesTransform(df: DataFrame): DataFrame =
    df.withColumn("member_constituency_id",
        Fns.stableHash(16, col("member_code"), col("constituency_uri"), col("represent_start")))
      .withColumn("is_current",
        Fns.isCurrentRange(col("represent_start"), col("represent_end"), current_date()).cast("string"))

  val memberOffices: FlattenSpec = FlattenSpec(
    wrapperKeys = memberWrappers,
    explodePath = Some("memberships"),
    parentFields = Seq(FieldSpec("member_code", Seq("memberCode", "code", "id"))),
    fields = Seq(
      FieldSpec("office_uri", Seq("membership.offices[0].office.uri", "office.uri", "officeUri")),
      FieldSpec("office_name", Seq("membership.offices[0].office.officeName.showAs",
        "office.showAs", "office.officeName", "office.name", "office.title", "office.role")),
      FieldSpec("office_start", Seq("membership.offices[0].office.dateRange.start", "office.dateRange.start")),
      FieldSpec("office_end", Seq("membership.offices[0].office.dateRange.end", "office.dateRange.end"))))

  def memberOfficesTransform(df: DataFrame): DataFrame =
    df.withColumn("member_office_id",
        Fns.stableHash(16, col("member_code"), col("office_uri"), col("office_start")))
      .withColumn("is_current",
        Fns.isCurrentRange(col("office_start"), col("office_end"), current_date()).cast("string"))

  /** Catalog tables (table_houses.py, table_parties.py:200-203,
    * table_constituencies.py:183-189).
    */
  val houses: FlattenSpec = FlattenSpec(
    wrapperKeys = Seq("house"),
    fields = Seq(
      FieldSpec("house_uri", Seq("uri", "houseUri")),
      FieldSpec("house_no", Seq("houseNo", "house_no", "number")),
      FieldSpec("house_code", Seq("houseCode", "chamberCode")),
      FieldSpec("show_as", Seq("showAs", "name"))))

  val parties: FlattenSpec = FlattenSpec(
    wrapperKeys = Seq("party"),
    fields = Seq(
      FieldSpec("party_name", Seq("partyName", "name", "showAs", "show_as", "label")),
      FieldSpec("show_as", Seq("showAs", "show_as", "name", "partyName", "label")),
      FieldSpec("party_code", Seq("partyCode", "code", "id", "representCode")),
      FieldSpec("party_uri", Seq("uri", "partyUri"))))

  val constituencies: FlattenSpec = FlattenSpec(
    wrapperKeys = Seq("constituency", "represent"),
    fields = Seq(
      FieldSpec("show_as", Seq("showAs", "show_as", "name", "constituencyName")),
      FieldSpec("constituency_name", Seq("name", "constituencyName", "showAs", "show_as")),
      FieldSpec("constituency_code", Seq("constituencyCode", "representCode", "code", "id")),
      FieldSpec("constituency_uri", Seq("uri", "constituencyUri")),
      FieldSpec("house_uri", Seq("house.uri", "houseUri")),
      FieldSpec("house_no", Seq("house.houseNo", "house.house_no")),
      FieldSpec("chamber", Seq("house.houseCode", "house.chamberCode", "house.chamber", "house.houseType"))))

  val bills: FlattenSpec = FlattenSpec(
    wrapperKeys = Seq("bill"),
    fields = Seq(
      FieldSpec("bill_uri", Seq("uri", "billUri")),
      FieldSpec("bill_no", Seq("billNo", "number")),
      FieldSpec("bill_year", Seq("billYear", "year")),
      FieldSpec("bill_type", Seq("billType", "type")),
      FieldSpec("status", Seq("status")),
      FieldSpec("short_title", Seq("shortTitleEn", "shortTitle", "showAs")),
      FieldSpec("long_title", Seq("longTitleEn", "longTitle")),
      FieldSpec("source", Seq("source", "originHouse.showAs"))))

  // ---------------------------------------------------------------------
  // Bill satellite tables (table_bill_stages.py:162-199,
  // table_bill_versions.py:162-214, table_bill_sponsors.py:162-196,
  // table_bill_related_docs.py:162-207, table_bill_events.py:162-197,
  // table_bill_debates.py:162-196). All share the bill unwrap + a child
  // array explode; each child may itself be wrapped ({event: {...}},
  // {version: {...}}, ...) which the fallback path chains absorb. The
  // reference threads enumerate() indices into surrogate ids and order
  // columns — indexField carries that through posexplode.
  // ---------------------------------------------------------------------

  /** Shared bill-id parent fields: uri → billId/id → generated hash of the
    * raw payload (table_bill_stages.py:163-165). The generated branch
    * hashes the raw JSON text (deviation: reference canonicalizes the
    * parsed record; only differs for bills with NO uri and NO id, where
    * any deterministic unique surrogate is equivalent).
    */
  private val billParentFields = Seq(
    FieldSpec("bill_uri", Seq("uri", "billUri")),
    FieldSpec("bill_fallback_id", Seq("billId", "id")),
    FieldSpec("bill_raw", Seq("$")))

  /** FieldSpec defaults missing fields to "" (not null) — every "uri else
    * generated id" decision must treat blank as missing.
    */
  private def nonBlankCol(c: Column): Column =
    when(trim(coalesce(c, lit(""))) === "", lit(null)).otherwise(c)

  private def withBillId(df: DataFrame): DataFrame =
    df.withColumn("bill_id",
        coalesce(Fns.coalesceNonBlank(col("bill_uri"), col("bill_fallback_id")),
          concat(lit("generated:bill:"),
            graft.functions.Udfs.canonicalRecordHash(col("bill_raw"), lit(24)))))
      .drop("bill_fallback_id", "bill_raw")

  /** Parse every entry of a JSON date array (entries are either scalars or
    * {date: ...} objects), include the direct date, take the earliest
    * (table_bill_stages.py:203-217, table_bill_events.py _first_event_date).
    */
  private def earliestDate(datesJson: Column, direct: Column): Column = {
    val entries = from_json(datesJson,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    val parsed = filter(
      transform(coalesce(entries, array()),
        e => coalesce(Fns.parseIsoDate(get_json_object(e, "$.date")), Fns.parseIsoDate(e))),
      d => d.isNotNull)
    val all = concat(parsed, filter(array(Fns.parseIsoDate(direct)), d => d.isNotNull))
    array_min(all).cast("string")
  }

  val billStages: FlattenSpec = FlattenSpec(
    wrapperKeys = Seq("bill"),
    explodePath = Some("stages"),
    parentFields = billParentFields,
    indexField = Some("stage_index"),
    fields = Seq(
      FieldSpec("stage_uri", Seq("event.uri", "event.stageUri", "event.stageURI", "uri", "stageUri", "stageURI")),
      FieldSpec("stage_name", Seq("event.showAs", "event.stageName", "event.name", "showAs", "stageName", "name")),
      FieldSpec("stage_dates_raw", Seq("event.dates", "dates")),
      FieldSpec("stage_date_direct", Seq("event.date", "date")),
      FieldSpec("order_in_bill", Seq("event.progressStage", "event.order", "event.stageOrder",
        "progressStage", "order", "stageOrder")),
      FieldSpec("stage_outcome", Seq("event.stageOutcome", "event.outcome", "stageOutcome", "outcome")),
      FieldSpec("house_uri", Seq("event.house.uri", "event.chamber.uri", "house.uri", "chamber.uri")),
      FieldSpec("house_name", Seq("event.house.showAs", "event.house.name",
        "event.chamber.showAs", "event.chamber.name",
        "house.showAs", "house.name", "chamber.showAs", "chamber.name"))))

  def billStagesTransform(df: DataFrame): DataFrame =
    withBillId(df)
      .withColumn("stage_date", earliestDate(col("stage_dates_raw"), col("stage_date_direct")))
      .withColumn("bill_stage_id",
        coalesce(nonBlankCol(col("stage_uri")), concat(lit("generated:bill_stage:"),
          Fns.stableHash(24, col("bill_id"), col("stage_name"), col("stage_date"),
            col("order_in_bill"), col("house_uri"), col("stage_index")))))
      .drop("stage_dates_raw", "stage_date_direct")

  val billVersions: FlattenSpec = FlattenSpec(
    wrapperKeys = Seq("bill"),
    explodePath = Some("versions"),
    parentFields = billParentFields,
    indexField = Some("version_index"),
    fields = Seq(
      FieldSpec("version_uri", Seq("version.uri", "version.versionUri", "uri", "versionUri")),
      FieldSpec("version_label", Seq("version.showAs", "version.title", "version.label",
        "showAs", "title", "label")),
      FieldSpec("version_date_raw", Seq("version.date", "date")),
      FieldSpec("version_doc_type", Seq("version.docType", "docType")),
      FieldSpec("version_lang", Seq("version.lang", "lang")),
      FieldSpec("pdf_uri_raw", Seq("version.formats.pdf.uri", "version.formats.pdf.formatUri",
        "formats.pdf.uri", "formats.pdf.formatUri")),
      FieldSpec("pdf_url_raw", Seq("version.formats.pdf.url", "version.formats.pdf.href",
        "version.formats.pdf.downloadUrl", "version.formats.pdf.formatUrl",
        "formats.pdf.url", "formats.pdf.href", "formats.pdf.downloadUrl", "formats.pdf.formatUrl")),
      FieldSpec("xml_uri_raw", Seq("version.formats.xml.uri", "version.formats.xml.formatUri",
        "formats.xml.uri", "formats.xml.formatUri")),
      FieldSpec("xml_url_raw", Seq("version.formats.xml.url", "version.formats.xml.href",
        "version.formats.xml.downloadUrl", "version.formats.xml.formatUrl",
        "formats.xml.url", "formats.xml.href", "formats.xml.downloadUrl", "formats.xml.formatUrl"))))

  def billVersionsTransform(df: DataFrame): DataFrame = {
    val pdf = SourceFileOps.formatLocator(col("pdf_uri_raw"), col("pdf_url_raw"))
    val xml = SourceFileOps.formatLocator(col("xml_uri_raw"), col("xml_url_raw"))
    val base = withBillId(df)
      .withColumn("version_date", Fns.parseIsoDate(col("version_date_raw")).cast("string"))
      .withColumn("bill_version_id",
        coalesce(nonBlankCol(col("version_uri")), concat(lit("generated:bill_version:"),
          Fns.stableHash(24, col("bill_id"), col("version_label"), Fns.parseIsoDate(col("version_date_raw")),
            col("version_doc_type"), col("version_lang"), col("version_index")))))
    val fidPdf = SourceFileOps.sourceFileId("legislation", col("bill_id"), "pdf", pdf.uri, pdf.urlForHash)
    val fidXml = SourceFileOps.sourceFileId("legislation", col("bill_id"), "xml", xml.uri, xml.urlForHash)
    base
      .withColumn("format_pdf_uri", pdf.uri).withColumn("format_pdf_url", pdf.url)
      .withColumn("format_xml_uri", xml.uri).withColumn("format_xml_url", xml.url)
      .withColumn("source_file_id_pdf", fidPdf)
      .withColumn("source_file_id_xml", fidXml)
      .withColumn("s3_pdf_key", SourceFileOps.targetKey("legislation", col("bill_id"),
        fidPdf, lit("pdf"), coalesce(pdf.urlForHash, pdf.uri)))
      .withColumn("s3_xml_key", SourceFileOps.targetKey("legislation", col("bill_id"),
        fidXml, lit("xml"), coalesce(xml.urlForHash, xml.uri)))
      .drop("version_date_raw", "pdf_uri_raw", "pdf_url_raw", "xml_uri_raw", "xml_url_raw")
  }

  val billSponsors: FlattenSpec = FlattenSpec(
    wrapperKeys = Seq("bill"),
    explodePath = Some("sponsors"),
    parentFields = billParentFields,
    indexField = Some("sponsor_index"),
    fields = Seq(
      FieldSpec("sponsor_uri", Seq("sponsor.by.uri", "by.uri")),
      FieldSpec("sponsor_name", Seq("sponsor.by.showAs", "sponsor.by.name", "by.showAs", "by.name")),
      FieldSpec("sponsor_role_uri", Seq("sponsor.as.uri", "as.uri")),
      FieldSpec("sponsor_role_name", Seq("sponsor.as.showAs", "sponsor.as.name", "as.showAs", "as.name")),
      FieldSpec("is_primary_raw", Seq("sponsor.isPrimary", "isPrimary"))))

  /** `_bool_text` (table_bill_sponsors.py:214-225): truthy tokens
    * ('true','1','yes','y') → 'true', falsy ('false','0','no','n') →
    * 'false', anything else lowercased-stripped, blank → null.
    */
  def boolText(raw: Column): Column = {
    val t = lower(trim(raw))
    when(t.isin("true", "1", "yes", "y"), lit("true"))
      .when(t.isin("false", "0", "no", "n"), lit("false"))
      .when(t.isNull || t === "", lit(null).cast("string"))
      .otherwise(t)
  }

  def billSponsorsTransform(df: DataFrame): DataFrame =
    withBillId(df)
      .withColumn("is_primary", boolText(col("is_primary_raw")))
      .withColumn("sponsor_order", (col("sponsor_index") + 1).cast("string"))
      .withColumn("bill_sponsor_id", concat(lit("bill_sponsor:"),
        Fns.stableHash(24, col("bill_id"), col("sponsor_uri"), col("sponsor_name"),
          col("sponsor_role_uri"), col("sponsor_role_name"), col("is_primary"), col("sponsor_order"))))
      .drop("is_primary_raw")

  val billRelatedDocs: FlattenSpec = FlattenSpec(
    wrapperKeys = Seq("bill"),
    explodePath = Some("relatedDocs"),
    parentFields = billParentFields,
    indexField = Some("doc_index"),
    fields = Seq(
      FieldSpec("doc_uri", Seq("relatedDoc.uri", "relatedDoc.relatedDocUri", "relatedDoc.docUri",
        "uri", "relatedDocUri", "docUri")),
      FieldSpec("related_doc_label", Seq("relatedDoc.showAs", "relatedDoc.title", "relatedDoc.label",
        "showAs", "title", "label")),
      FieldSpec("doc_date_raw", Seq("relatedDoc.date", "date")),
      FieldSpec("doc_type", Seq("relatedDoc.docType", "relatedDoc.type", "docType", "type")),
      FieldSpec("language", Seq("relatedDoc.lang", "relatedDoc.language", "lang", "language")),
      FieldSpec("pdf_uri_raw", Seq("relatedDoc.formats.pdf.uri", "relatedDoc.formats.pdf.formatUri",
        "formats.pdf.uri", "formats.pdf.formatUri")),
      // related docs share _format_locator's url/href/downloadUrl/formatUrl
      // chain with bill versions (table_bill_versions.py:219, invoked from
      // table_bill_related_docs.py:184)
      FieldSpec("pdf_url_raw", Seq("relatedDoc.formats.pdf.url", "relatedDoc.formats.pdf.href",
        "relatedDoc.formats.pdf.downloadUrl", "relatedDoc.formats.pdf.formatUrl",
        "formats.pdf.url", "formats.pdf.href", "formats.pdf.downloadUrl", "formats.pdf.formatUrl")),
      FieldSpec("xml_uri_raw", Seq("relatedDoc.formats.xml.uri", "relatedDoc.formats.xml.formatUri",
        "formats.xml.uri", "formats.xml.formatUri")),
      FieldSpec("xml_url_raw", Seq("relatedDoc.formats.xml.url", "relatedDoc.formats.xml.href",
        "relatedDoc.formats.xml.downloadUrl", "relatedDoc.formats.xml.formatUrl",
        "formats.xml.url", "formats.xml.href", "formats.xml.downloadUrl", "formats.xml.formatUrl"))))

  def billRelatedDocsTransform(df: DataFrame): DataFrame = {
    val pdf = SourceFileOps.formatLocator(col("pdf_uri_raw"), col("pdf_url_raw"))
    val xml = SourceFileOps.formatLocator(col("xml_uri_raw"), col("xml_url_raw"))
    val fidPdf = SourceFileOps.sourceFileId("legislation", col("bill_id"), "pdf", pdf.uri, pdf.urlForHash)
    val fidXml = SourceFileOps.sourceFileId("legislation", col("bill_id"), "xml", xml.uri, xml.urlForHash)
    withBillId(df)
      .withColumn("related_doc_date", Fns.parseIsoDate(col("doc_date_raw")).cast("string"))
      .withColumn("related_doc_id",
        coalesce(nonBlankCol(col("doc_uri")), concat(lit("generated:bill_related_doc:"),
          Fns.stableHash(24, col("bill_id"), col("related_doc_label"),
            Fns.parseIsoDate(col("doc_date_raw")), col("doc_type"), col("language"), col("doc_index")))))
      .withColumn("format_pdf_uri", pdf.uri).withColumn("format_pdf_url", pdf.url)
      .withColumn("format_xml_uri", xml.uri).withColumn("format_xml_url", xml.url)
      .withColumn("source_file_id_pdf", fidPdf)
      .withColumn("source_file_id_xml", fidXml)
      .withColumn("s3_pdf_key", SourceFileOps.targetKey("legislation", col("bill_id"),
        fidPdf, lit("pdf"), coalesce(pdf.urlForHash, pdf.uri)))
      .withColumn("s3_xml_key", SourceFileOps.targetKey("legislation", col("bill_id"),
        fidXml, lit("xml"), coalesce(xml.urlForHash, xml.uri)))
      .drop("doc_date_raw", "doc_uri", "pdf_uri_raw", "pdf_url_raw", "xml_uri_raw", "xml_url_raw")
  }

  val billEvents: FlattenSpec = FlattenSpec(
    wrapperKeys = Seq("bill"),
    explodePath = Some("events"),
    parentFields = billParentFields,
    indexField = Some("event_index"),
    fields = Seq(
      FieldSpec("event_uri", Seq("event.uri", "uri")),
      FieldSpec("event_type_uri", Seq("event.eventURI", "event.eventUri", "event.typeURI", "event.typeUri",
        "eventURI", "eventUri", "typeURI", "typeUri")),
      FieldSpec("event_name", Seq("event.showAs", "event.name", "event.label", "showAs", "name", "label")),
      FieldSpec("event_dates_raw", Seq("event.dates", "dates")),
      FieldSpec("event_date_direct", Seq("event.date", "date")),
      FieldSpec("chamber_uri", Seq("event.chamber.uri", "chamber.uri")),
      FieldSpec("chamber_name", Seq("event.chamber.showAs", "event.chamber.name",
        "chamber.showAs", "chamber.name"))))

  def billEventsTransform(df: DataFrame): DataFrame =
    withBillId(df)
      .withColumn("event_date", earliestDate(col("event_dates_raw"), col("event_date_direct")))
      .withColumn("event_order", (col("event_index") + 1).cast("string"))
      .withColumn("bill_event_id",
        coalesce(nonBlankCol(col("event_uri")), concat(lit("generated:bill_event:"),
          Fns.stableHash(24, col("bill_id"), col("event_type_uri"), col("event_name"),
            col("event_date"), col("chamber_uri"), col("event_order")))))
      .drop("event_dates_raw", "event_date_direct")

  val billDebates: FlattenSpec = FlattenSpec(
    wrapperKeys = Seq("bill"),
    explodePath = Some("debates"),
    parentFields = billParentFields,
    indexField = Some("debate_index"),
    fields = Seq(
      FieldSpec("debate_uri", Seq("uri", "debateUri")),
      FieldSpec("debate_date_raw", Seq("date")),
      FieldSpec("debate_show_as", Seq("showAs", "title", "label")),
      FieldSpec("debate_section_id", Seq("debateSectionId", "sectionId")),
      FieldSpec("chamber_uri", Seq("chamber.uri")),
      FieldSpec("chamber_name", Seq("chamber.showAs", "chamber.name"))))

  def billDebatesTransform(df: DataFrame): DataFrame =
    withBillId(df)
      .withColumn("debate_date", Fns.parseIsoDate(col("debate_date_raw")).cast("string"))
      .withColumn("debate_order", (col("debate_index") + 1).cast("string"))
      .withColumn("debate_id",
        coalesce(nonBlankCol(col("debate_uri")), concat(lit("generated:debate:"),
          Fns.stableHash(24, col("bill_id"), col("debate_show_as"), col("debate_date"),
            col("debate_section_id"), col("debate_order")))))
      .withColumn("bill_debate_id", concat(lit("bill_debate:"),
        Fns.stableHash(24, col("bill_id"), col("debate_uri"), col("debate_section_id"), col("debate_order"))))
      .drop("debate_date_raw")

  /** Debate metadata records (table_debate_records.py:_normalise_debate_row):
    * the debate sits under a debateRecord wrapper but contextDate rides at
    * the PAYLOAD root next to it — so no wrapper unwrap; every record field
    * carries a debateRecord.-prefixed path with a root fallback, and
    * context_date reads the root directly. Chamber precedence is
    * house_code → chamber.showAs → house.showAs; http-absolute uris promote
    * to urls.
    */
  val debateRecords: FlattenSpec = FlattenSpec(
    fields = Seq(
      FieldSpec("debate_uri", Seq("debateRecord.uri", "debateRecord.debateUri", "uri", "debateUri")),
      // rawText: the generated debate id hashes DOCUMENT-ORDER keys —
      // variant re-serialization sorts them
      FieldSpec("debate_raw", Seq("debateRecord", "$"), rawText = true),
      FieldSpec("item_raw", Seq("$")),
      FieldSpec("context_date_raw", Seq("contextDate")),
      FieldSpec("debate_date_raw", Seq("debateRecord.date", "date")),
      FieldSpec("house_uri", Seq("debateRecord.house.uri", "debateRecord.chamber.uri",
        "house.uri", "chamber.uri")),
      FieldSpec("house_no", Seq("debateRecord.house.houseNo", "house.houseNo")),
      FieldSpec("house_code", Seq("debateRecord.house.houseCode", "debateRecord.house.chamberCode",
        "house.houseCode", "house.chamberCode")),
      FieldSpec("chamber_show_as", Seq("debateRecord.chamber.showAs", "chamber.showAs")),
      FieldSpec("house_show_as", Seq("debateRecord.house.showAs", "house.showAs")),
      FieldSpec("show_as_raw", Seq("debateRecord.showAs", "debateRecord.title", "showAs", "title")),
      FieldSpec("pdf_uri_raw", Seq("debateRecord.formats.pdf.uri", "debateRecord.formats.pdf.url",
        "debateRecord.formats.pdf.href", "formats.pdf.uri", "formats.pdf.url", "formats.pdf.href")),
      FieldSpec("pdf_url_raw", Seq("debateRecord.formats.pdf.url", "debateRecord.formats.pdf.href",
        "formats.pdf.url", "formats.pdf.href")),
      FieldSpec("xml_uri_raw", Seq("debateRecord.formats.xml.uri", "debateRecord.formats.xml.url",
        "debateRecord.formats.xml.href", "formats.xml.uri", "formats.xml.url", "formats.xml.href")),
      FieldSpec("xml_url_raw", Seq("debateRecord.formats.xml.url", "debateRecord.formats.xml.href",
        "formats.xml.url", "formats.xml.href"))))

  def debateRecordsTransform(df: DataFrame): DataFrame = {
    val ctx = Fns.parseIsoDate(col("context_date_raw")).cast("string")
    val withDates = df
      .withColumn("context_date", ctx)
      .withColumn("debate_date",
        coalesce(Fns.parseIsoDate(col("debate_date_raw")).cast("string"), ctx))
      .withColumn("debate_id",
        // reference quirk: stable_hash over a Mapping hashes its KEYS
        coalesce(nonBlankCol(col("debate_uri")),
          concat(lit("generated:debate:"),
            graft.functions.Udfs.jsonKeysHash(col("debate_raw"), lit(20)))))
      .withColumn("chamber",
        Fns.coalesceNonBlank(col("house_code"), col("chamber_show_as"), col("house_show_as")))
      .withColumn("show_as",
        // fallback joins non-blank (chamber, date) with " — "
        // (table_debate_records.py:236-238)
        coalesce(nonBlankCol(col("show_as_raw")),
          Fns.nullif(concat_ws(" — ", col("chamber"), col("debate_date")), lit(""))))
    val srcPdfUri = nonBlankCol(col("pdf_uri_raw"))
    val srcXmlUri = nonBlankCol(col("xml_uri_raw"))
    val srcPdfUrl = when(srcPdfUri.isNotNull && srcPdfUri.startsWith("http"), srcPdfUri)
      .otherwise(nonBlankCol(col("pdf_url_raw")))
    val srcXmlUrl = when(srcXmlUri.isNotNull && srcXmlUri.startsWith("http"), srcXmlUri)
      .otherwise(nonBlankCol(col("xml_url_raw")))
    withDates
      .withColumn("source_pdf_uri", srcPdfUri).withColumn("source_pdf_url", srcPdfUrl)
      .withColumn("source_xml_uri", srcXmlUri).withColumn("source_xml_url", srcXmlUrl)
      .withColumn("source_file_id_pdf",
        SourceFileOps.sourceFileId("debate", col("debate_id"), "pdf", srcPdfUri, srcPdfUrl))
      .withColumn("source_file_id_xml",
        SourceFileOps.sourceFileId("debate", col("debate_id"), "xml", srcXmlUri, srcXmlUrl))
      .withColumn("api_result_hash",
        graft.functions.Udfs.canonicalRecordHash(col("item_raw"), lit(16)))
      // _first_text yields None for missing fields — flatten's "" default
      // must not leak into the table
      .withColumn("debate_uri", nonBlankCol(col("debate_uri")))
      .withColumn("house_uri", nonBlankCol(col("house_uri")))
      .withColumn("house_no", nonBlankCol(col("house_no")))
      .withColumn("house_code", nonBlankCol(col("house_code")))
      .drop("debate_raw", "item_raw", "context_date_raw", "debate_date_raw",
        "chamber_show_as", "house_show_as", "show_as_raw",
        "pdf_uri_raw", "pdf_url_raw", "xml_uri_raw", "xml_url_raw")
  }

  /** Debate sections (table_debate_sections.py:_normalise_section_row):
    * exploded from each debate record's section list; parent debate id and
    * section order are threaded by the caller.
    */
  val debateSections: FlattenSpec = FlattenSpec(
    explodePath = Some("sections"),
    parentFields = Seq(FieldSpec("debate_uri", Seq("uri", "debateUri"))),
    indexField = Some("section_index"),
    fields = Seq(
      FieldSpec("section_uri", Seq("debateSection.uri", "debateSection.sectionUri", "uri", "sectionUri")),
      FieldSpec("section_eid", Seq("debateSection.debateSectionId", "debateSection.sectionId", "debateSection.eid",
        "debateSectionId", "sectionId", "eid")),
      FieldSpec("show_as", Seq("debateSection.showAs", "debateSection.heading", "debateSection.title",
        "showAs", "heading", "title")),
      FieldSpec("heading", Seq("debateSection.heading", "debateSection.title", "debateSection.showAs",
        "heading", "title", "showAs")),
      FieldSpec("parent_section_raw", Seq("debateSection.parentDebateSection", "parentDebateSection"))))

  def debateSectionsTransform(df: DataFrame): DataFrame =
    df.withColumn("debate_id", col("debate_uri"))
      .withColumn("section_order", (col("section_index") + 1).cast("long"))
      .withColumn("parent_section_id",
        // mapping → first_text(uri, debateSectionId, sectionId, eid); scalar → itself
        coalesce(
          get_json_object(col("parent_section_raw"), "$.uri"),
          get_json_object(col("parent_section_raw"), "$.debateSectionId"),
          get_json_object(col("parent_section_raw"), "$.sectionId"),
          get_json_object(col("parent_section_raw"), "$.eid"),
          when(col("parent_section_raw").startsWith("{"), lit(null))
            .otherwise(nonBlankCol(col("parent_section_raw")))))
      .withColumn("debate_section_id",
        coalesce(nonBlankCol(col("section_uri")), concat(lit("generated:debate_section:"),
          Fns.stableHash(20, col("debate_id"), col("section_eid"), col("section_order")))))
      .drop("parent_section_raw", "section_index")
}
