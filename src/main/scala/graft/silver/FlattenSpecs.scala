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
