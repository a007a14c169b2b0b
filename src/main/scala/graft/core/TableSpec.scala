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

/** The reference's FULL registry, re-declared: all 31 tables of
  * configs/oireachtas/tables.yml:5-273 (23 silver + 3 control + 5 gold),
  * columns verbatim, write strategy from write_policies.yml:8-114.
  */
object TableRegistry {
  private def t(name: String, pk: Seq[String], cols: Seq[String],
                strategy: String = "snapshot_replace", bk: Seq[String] = Nil,
                temporal: Option[(String, String, String)] = None,
                fks: Seq[(String, String, String)] = Nil) =
    name -> TableSpec(name, TableSpec.inferLayer(name), pk, cols, strategy, bk, temporal, fks)

  val specs: Map[String, TableSpec] = Map(
    // --- catalog dimensions (tables.yml:6-31) ---
    t("silver_houses", Seq("house_uri"),
      Seq("house_uri", "house_no", "house_code", "chamber", "show_as",
        "date_start", "date_end", "is_current", "source_endpoint",
        "snapshot_date", "source_hash"), "upsert",
      temporal = Some(("date_start", "date_end", "is_current"))),
    t("silver_constituencies", Seq("constituency_uri"),
      Seq("constituency_uri", "constituency_code", "constituency_name", "show_as",
        "house_uri", "house_no", "chamber", "date_start", "date_end", "is_current",
        "source_endpoint", "snapshot_date", "source_hash"), "upsert",
      temporal = Some(("date_start", "date_end", "is_current")),
      fks = Seq(("house_uri", "silver_houses", "house_uri"))),
    t("silver_parties", Seq("party_uri"),
      Seq("party_uri", "party_code", "party_name", "show_as", "date_start",
        "date_end", "is_current", "source_endpoint", "snapshot_date", "source_hash"),
      "upsert", temporal = Some(("date_start", "date_end", "is_current"))),
    // --- member family (tables.yml:33-76) ---
    t("silver_members", Seq("member_code"),
      Seq("member_code", "member_uri", "full_name", "first_name", "last_name",
        "display_name", "gender", "member_key", "is_current_member",
        "latest_party_name", "latest_constituency_name", "latest_house_no",
        "source_endpoint", "snapshot_date", "source_hash"), "upsert"),
    t("silver_member_memberships", Seq("membership_id"),
      Seq("membership_id", "member_code", "member_uri", "house_uri", "house_no",
        "house_code", "chamber", "membership_start", "membership_end",
        "is_current", "source_hash", "snapshot_date"),
      "upsert", temporal = Some(("membership_start", "membership_end", "is_current")),
      fks = Seq(("member_code", "silver_members", "member_code"))),
    t("silver_member_parties", Seq("member_party_id"),
      Seq("member_party_id", "membership_id", "member_code", "party_uri",
        "party_name", "party_start", "party_end", "is_current", "snapshot_date"),
      "upsert", bk = Seq("member_code", "party_uri", "party_start", "party_end"),
      fks = Seq(("member_code", "silver_members", "member_code"))),
    t("silver_member_constituencies", Seq("member_constituency_id"),
      Seq("member_constituency_id", "membership_id", "member_code",
        "constituency_uri", "constituency_name", "represent_start",
        "represent_end", "is_current", "snapshot_date"), "upsert",
      fks = Seq(("member_code", "silver_members", "member_code"))),
    t("silver_member_offices", Seq("member_office_id"),
      Seq("member_office_id", "membership_id", "member_code", "office_uri",
        "office_name", "office_start", "office_end", "is_current", "snapshot_date"),
      "upsert", fks = Seq(("member_code", "silver_members", "member_code"))),
    // --- debate family (tables.yml:78-109) ---
    t("silver_source_files", Seq("source_file_id"),
      Seq("source_file_id", "source_entity_type", "source_entity_id",
        "format_type", "format_uri", "format_url", "s3_key", "content_type",
        "download_status", "downloaded_at_utc", "byte_size", "etag_or_hash",
        "snapshot_date"), "upsert"),
    t("silver_debate_records", Seq("debate_id"),
      Seq("debate_id", "debate_uri", "context_date", "debate_date", "chamber",
        "house_uri", "house_no", "house_code", "show_as", "source_xml_uri",
        "source_xml_url", "source_pdf_uri", "source_pdf_url",
        "source_file_id_xml", "source_file_id_pdf", "api_result_hash",
        "snapshot_date"), "upsert"),
    t("silver_debate_sections", Seq("debate_section_id"),
      Seq("debate_section_id", "debate_id", "section_eid", "section_uri",
        "section_order", "heading", "show_as", "parent_section_id",
        "snapshot_date"), "upsert",
      fks = Seq(("debate_id", "silver_debate_records", "debate_id"))),
    t("silver_speeches", Seq("speech_id"),
      Seq("speech_id", "debate_id", "debate_section_id", "debate_date",
        "speech_order", "speaker_ref", "speaker_name", "speaker_member_code",
        "speaker_match_method", "speaker_match_confidence", "speech_text",
        "speech_text_hash", "word_count", "char_count", "language",
        "source_file_id", "xml_source_key", "snapshot_date"), "upsert"),
    // --- division family (tables.yml:111-136) ---
    t("silver_divisions", Seq("division_id"),
      Seq("division_id", "vote_id", "division_date", "chamber", "house_uri",
        "house_no", "committee_code", "subject", "outcome", "debate_id",
        "debate_section_id", "debate_show_as", "api_result_hash", "snapshot_date"), "upsert"),
    t("silver_division_tallies", Seq("division_tally_id"),
      Seq("division_tally_id", "division_id", "vote_code", "vote_label",
        "show_as", "member_count", "snapshot_date"), "upsert",
      fks = Seq(("division_id", "silver_divisions", "division_id"))),
    t("silver_member_votes", Seq("member_vote_id"),
      Seq("member_vote_id", "division_id", "vote_id", "division_date",
        "member_code", "member_name", "vote_code", "vote_label",
        "party_name_at_vote", "constituency_name_at_vote", "snapshot_date"), "upsert"),
    t("silver_questions", Seq("question_id"),
      Seq("question_id", "question_uri", "question_date", "question_no",
        "question_type", "question_text", "answer_text", "asked_by_member_code",
        "asked_by_name", "to_minister_or_department", "debate_section_id",
        "source_xml_uri", "source_xml_url", "source_pdf_uri", "source_pdf_url",
        "source_file_id_xml", "source_file_id_pdf", "snapshot_date", "source_hash"), "upsert"),
    // --- bill family (tables.yml:147-208) ---
    t("silver_bills", Seq("bill_id"),
      Seq("bill_id", "bill_uri", "bill_no", "bill_year", "title", "short_title",
        "origin_house_uri", "origin_house_name", "bill_type", "status",
        "introduced_date", "last_event_date", "source_endpoint",
        "snapshot_date", "source_hash"), "upsert"),
    t("silver_bill_versions", Seq("bill_version_id"),
      Seq("bill_version_id", "bill_id", "version_label", "version_date",
        "format_pdf_uri", "format_pdf_url", "format_xml_uri", "format_xml_url",
        "source_file_id_pdf", "source_file_id_xml", "s3_pdf_key", "s3_xml_key",
        "snapshot_date"), "upsert",
      fks = Seq(("bill_id", "silver_bills", "bill_id"))),
    t("silver_bill_stages", Seq("bill_stage_id"),
      Seq("bill_stage_id", "bill_id", "stage_name", "stage_date", "house_uri",
        "house_name", "stage_outcome", "order_in_bill", "snapshot_date"), "upsert",
      fks = Seq(("bill_id", "silver_bills", "bill_id"))),
    t("silver_bill_related_docs", Seq("related_doc_id"),
      Seq("related_doc_id", "bill_id", "related_doc_label", "related_doc_date",
        "doc_type", "language", "format_pdf_uri", "format_pdf_url",
        "format_xml_uri", "format_xml_url", "source_file_id_pdf",
        "source_file_id_xml", "s3_pdf_key", "s3_xml_key", "snapshot_date"), "upsert",
      fks = Seq(("bill_id", "silver_bills", "bill_id"))),
    t("silver_bill_sponsors", Seq("bill_sponsor_id"),
      Seq("bill_sponsor_id", "bill_id", "sponsor_uri", "sponsor_name",
        "sponsor_role_uri", "sponsor_role_name", "is_primary", "sponsor_order",
        "snapshot_date"), "upsert",
      fks = Seq(("bill_id", "silver_bills", "bill_id"))),
    t("silver_bill_debates", Seq("bill_debate_id"),
      Seq("bill_debate_id", "bill_id", "debate_id", "debate_uri", "debate_date",
        "debate_show_as", "debate_section_id", "chamber_uri", "chamber_name",
        "debate_order", "snapshot_date"), "upsert",
      fks = Seq(("bill_id", "silver_bills", "bill_id"))),
    t("silver_bill_events", Seq("bill_event_id"),
      Seq("bill_event_id", "bill_id", "event_uri", "event_type_uri",
        "event_name", "event_date", "chamber_uri", "chamber_name",
        "event_order", "snapshot_date"), "upsert",
      fks = Seq(("bill_id", "silver_bills", "bill_id"))),
    // --- control tables (tables.yml:210-232) ---
    t("control_pipeline_runs", Seq("run_id"),
      Seq("run_id", "workflow_run_id", "table_name", "mode", "cadence",
        "started_at_utc", "finished_at_utc", "status", "input_params_json",
        "raw_rows", "output_rows", "error_message", "manifest_s3_key"), "append"),
    t("control_table_manifests", Seq("table_name"),
      Seq("table_name", "latest_run_id", "latest_snapshot_date",
        "latest_parquet_key", "latest_csv_key", "row_count", "column_count",
        "schema_hash", "primary_key_unique", "dq_status", "updated_at_utc"), "upsert"),
    t("control_data_quality_results", Seq("dq_result_id"),
      Seq("dq_result_id", "run_id", "table_name", "check_name", "status",
        "metric_value", "threshold", "message", "created_at_utc"), "append"),
    // --- gold marts (tables.yml:234-273) ---
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
