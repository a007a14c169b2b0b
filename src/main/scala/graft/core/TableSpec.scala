package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** Declarative table registry (SURVEY §1.3; reference
  * configs/oireachtas/tables.yml + write_policies.yml + schemas.py). The
  * engine validates and projects to declared schemas instead of inferring;
  * write strategy and business keys drive the MergeOps policy dispatch.
  */
final case class TableSpec(
    name: String,
    layer: String,
    primaryKey: Seq[String],
    columns: Seq[String],
    writeStrategy: String = "snapshot_replace", // snapshot_replace | upsert | append | rebuild
    businessKey: Seq[String] = Nil,
    temporal: Option[(String, String, String)] = None, // (validFrom, validTo, isCurrent)
    foreignKeys: Seq[(String, String, String)] = Nil)  // (childCol, parentTable, parentCol)

object TableSpec {

  /** P1 projection-to-declared-schema (reference reindex(columns=...)):
    * missing columns materialize as null, extras drop, order is fixed.
    */
  def conform(df: DataFrame, spec: TableSpec): DataFrame = {
    val present = df.columns.toSet
    df.select(spec.columns.map(c =>
      if (present(c)) col(c) else lit(null).cast("string").as(c)): _*)
  }

  /** Required-column check (schemas.py:89-99). */
  def missingColumns(df: DataFrame, spec: TableSpec): Seq[String] =
    spec.columns.filterNot(df.columns.toSet)

  /** Layer inference from the table-name prefix (schemas.py:68-76). */
  def inferLayer(name: String): String =
    if (name.startsWith("gold_")) "gold"
    else if (name.startsWith("control_")) "control"
    else "silver"
}

/** The reference's registry, re-declared (core tables; see
  * configs/oireachtas/tables.yml:5-273 and write_policies.yml:8-114).
  */
object TableRegistry {
  private def t(name: String, pk: Seq[String], cols: Seq[String],
                strategy: String = "snapshot_replace", bk: Seq[String] = Nil,
                temporal: Option[(String, String, String)] = None,
                fks: Seq[(String, String, String)] = Nil) =
    name -> TableSpec(name, TableSpec.inferLayer(name), pk, cols, strategy, bk, temporal, fks)

  val specs: Map[String, TableSpec] = Map(
    t("silver_members", Seq("member_code"),
      Seq("member_code", "member_uri", "full_name", "first_name", "last_name",
        "display_name", "gender", "member_key", "is_current_member",
        "latest_party_name", "latest_constituency_name", "latest_house_no",
        "source_endpoint", "snapshot_date", "source_hash"), "upsert"),
    t("silver_member_memberships", Seq("membership_id"),
      Seq("membership_id", "member_code", "house_uri", "house_no",
        "membership_start", "membership_end", "is_current", "snapshot_date"),
      "upsert", temporal = Some(("membership_start", "membership_end", "is_current")),
      fks = Seq(("member_code", "silver_members", "member_code"))),
    t("silver_member_parties", Seq("member_party_id"),
      Seq("member_party_id", "member_code", "party_uri", "party_name",
        "party_start", "party_end", "is_current", "snapshot_date"),
      "upsert", bk = Seq("member_code", "party_uri", "party_start", "party_end"),
      fks = Seq(("member_code", "silver_members", "member_code"))),
    t("silver_member_constituencies", Seq("member_constituency_id"),
      Seq("member_constituency_id", "member_code", "constituency_name",
        "represent_start", "represent_end", "is_current", "snapshot_date"), "upsert"),
    t("silver_member_offices", Seq("member_office_id"),
      Seq("member_office_id", "member_code", "office_name", "office_start",
        "office_end", "is_current", "snapshot_date"), "upsert"),
    t("silver_speeches", Seq("speech_id"),
      Seq("speech_id", "debate_id", "debate_section_id", "debate_date",
        "speech_order", "speaker_ref", "speaker_name", "speaker_member_code",
        "speaker_match_method", "speaker_match_confidence", "speech_text",
        "speech_text_hash", "word_count", "char_count", "language",
        "source_file_id", "xml_source_key", "snapshot_date"), "upsert"),
    t("silver_divisions", Seq("division_id"),
      Seq("division_id", "vote_id", "division_date", "chamber", "house_uri",
        "house_no", "committee_code", "subject", "outcome", "debate_id",
        "debate_section_id", "debate_show_as", "api_result_hash", "snapshot_date"), "upsert"),
    t("silver_member_votes", Seq("member_vote_id"),
      Seq("member_vote_id", "division_id", "vote_id", "division_date",
        "member_code", "member_name", "vote_code", "vote_label",
        "party_name_at_vote", "constituency_name_at_vote", "snapshot_date"), "upsert"),
    t("gold_current_members", Seq("member_code"),
      Seq("member_code", "full_name", "party_name", "constituency_name",
        "house_no", "office_name", "snapshot_date")),
    t("gold_member_activity_yearly", Seq("member_code", "year"),
      Seq("member_code", "year", "speech_count", "debate_day_count",
        "division_count", "votes_cast_count", "vote_participation_pct",
        "ta_count", "nil_count", "staon_count", "speech_rank",
        "vote_participation_rank", "snapshot_date")),
    t("gold_member_activity_monthly", Seq("member_code", "year_month"),
      Seq("member_code", "year_month", "speech_count", "debate_day_count",
        "votes_cast_count", "snapshot_date")),
    t("gold_constituency_activity_yearly", Seq("constituency_name", "year"),
      Seq("constituency_name", "year", "member_count", "speech_count",
        "votes_cast_count", "snapshot_date")),
    t("gold_content_fact_pool", Seq("fact_id"),
      Seq("fact_id", "fact_type", "entity_type", "entity_id", "period_start",
        "period_end", "headline", "metric_name", "metric_value",
        "source_table", "source_key", "snapshot_date")))
}
