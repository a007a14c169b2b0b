package graft.silver

import org.apache.spark.sql.DataFrame
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
}
