package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.TableRegistry
import graft.functions.Fns

/** Validation-fix acceptance runner (reference
  * process/oireachtas_verify_validation_fixes.py): after a repair batch
  * rebuilds the five affected tables, cross-check the candidate against
  * production and the official source before flipping the pointer —
  * business-key uniqueness, current-value stability, key completeness
  * vs the official API frames, bill-debate business-row completeness,
  * and control-manifest row/schema integrity.
  *
  * The checks are pure dataflow over frames the repo already produces
  * (candidate/production table reads via TableIO, official frames via
  * the RestSource flatteners); this module is the missing driver. Every
  * check aggregates to a tiny verdict row — the frames themselves never
  * collect beyond the bounded samples (≤30, reference :195-200).
  */
object AcceptanceChecks {

  /** Tuple-join separator for value-set comparison: US (unit separator)
    * cannot appear in the civic text fields, keeping the join injective;
    * samples render it back as the reference's tuple separator.
    */
  private val Sep = "\u001f"

  /** business_duplicates (:61-62, pandas duplicated keep=False): EVERY
    * row of every business-key group with more than one member.
    */
  def businessDuplicates(df: DataFrame, columns: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(columns.map(col): _*)
    df.withColumn("_n", count(lit(1)).over(w)).filter(col("_n") > 1).drop("_n")
  }

  private def tupleCol(valueColumns: Seq[String]): Column =
    concat_ws(Sep, valueColumns.map(c => trim(coalesce(col(c).cast("string"), lit("")))): _*)

  private def currentSets(df: DataFrame, valueColumns: Seq[String]): DataFrame =
    df.filter(Fns.truthy(col("is_current")))
      .groupBy(col("member_code").cast("string").as("member_code"))
      .agg(array_sort(collect_set(tupleCol(valueColumns))).as("vals"))

  /** compare_current_values (:65-96): per member, the SET of current
    * value tuples must be identical between candidate and production;
    * differing members come back sorted with both sides' tuples
    * (rendered "a|b" like the reference's sample output).
    */
  def currentValueDifferences(candidate: DataFrame, production: DataFrame,
                              valueColumns: Seq[String]): DataFrame = {
    val l = currentSets(candidate, valueColumns).withColumnRenamed("vals", "candidate")
    val r = currentSets(production, valueColumns).withColumnRenamed("vals", "production")
    def rendered(c: Column): Column =
      transform(coalesce(c, array().cast("array<string>")),
        v => regexp_replace(v, Sep, "|"))
    l.join(r, Seq("member_code"), "full_outer")
      .filter(!(coalesce(col("candidate"), array().cast("array<string>")) <=>
        coalesce(col("production"), array().cast("array<string>"))))
      .select(col("member_code"), rendered(col("candidate")).as("candidate"),
        rendered(col("production")).as("production"))
      .orderBy("member_code")
  }

  /** key_completeness (:193-203): official keys (blank-stripped) the
    * candidate is missing; bounded samples.
    */
  final case class KeyCompleteness(officialRows: Long, candidateRows: Long,
                                   missingCount: Long, missingSamples: Seq[String])

  def keyCompleteness(candidate: DataFrame, official: DataFrame, key: String): KeyCompleteness = {
    def keys(df: DataFrame) =
      df.select(coalesce(col(key).cast("string"), lit("")).as("k")).distinct()
    val missing = keys(official).filter(col("k") =!= "")
      .except(keys(candidate))
    val missingCount = missing.count()
    KeyCompleteness(official.count(), candidate.count(), missingCount,
      missing.orderBy("k").limit(30).collect().map(_.getString(0)).toSeq)
  }

  /** bill_debate_business_completeness (:206-219): the official rows for
    * bills the candidate knows, keyed by the 6-field business join, that
    * the candidate lacks.
    */
  final case class BusinessCompleteness(officialRowsForCandidateBills: Long,
                                        candidateRows: Long,
                                        missingBusinessRows: Long,
                                        missingSamples: Seq[String])

  def billDebateBusinessCompleteness(candidate: DataFrame, official: DataFrame,
                                     liveBillIds: DataFrame): BusinessCompleteness = {
    val fields = Seq("bill_id", "debate_id", "debate_section_id",
      "debate_show_as", "debate_date", "chamber_uri")
    def bk(df: DataFrame): Column =
      concat_ws("|", fields.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    val live = liveBillIds.select(col(liveBillIds.columns.head).cast("string").as("bill_id")).distinct()
    val scoped = official.withColumn("bill_id", coalesce(col("bill_id").cast("string"), lit("")))
      .join(broadcast(live), Seq("bill_id"))
    val scopedKeys = scoped.select(bk(scoped).as("k")).distinct()
    val candidateKeys = candidate.select(bk(candidate).as("k")).distinct()
    val missing = scopedKeys.except(candidateKeys)
    BusinessCompleteness(scoped.count(), candidate.count(), missing.count(),
      missing.orderBy("k").limit(30).collect().map(_.getString(0)).toSeq)
  }

  /** validate_control_manifests (:225-270): each manifest row's stored
    * row_count / column_count / schema_hash vs the registry spec and
    * the candidate artifacts' ACTUAL row counts (csv + parquet, read
    * through the injected counter — TableIO at deploy time, a fixture
    * in tests). The expected schema hash is the reference's
    * stable_hash([table, pk_csv, columns_csv], 24).
    */
  final case class ManifestFailure(table: String, differences: Seq[String])
  final case class ManifestCheck(rowCount: Long, missingTables: Seq[String],
                                 failureCount: Int, failureSamples: Seq[ManifestFailure])

  def expectedSchemaHash(table: String): Option[String] =
    TableRegistry.specs.get(table).map { spec =>
      graft.sources.XmlDebateWalker.stableHash(
        Seq(table, spec.primaryKey.mkString(","), spec.columns.mkString(",")), 24)
    }

  def validateControlManifests(manifests: DataFrame,
                               actualCounts: String => (Long, Long)): ManifestCheck = {
    val rows = manifests.select(
        coalesce(col("table_name").cast("string"), lit("")).as("t"),
        coalesce(col("row_count").cast("string"), lit("")).as("rc"),
        coalesce(col("column_count").cast("string"), lit("")).as("cc"),
        coalesce(col("schema_hash").cast("string"), lit("")).as("sh"))
      .collect() // control manifests: one row per table, bounded by the registry
    val present = rows.map(_.getString(0)).toSet
    val missingTables = TableRegistry.specs.keys.filterNot(present).toSeq.sorted
    val failures = rows.toSeq.flatMap { r =>
      val table = r.getString(0)
      TableRegistry.specs.get(table).map { spec =>
        val expectedRows = r.getString(1).trim match {
          case "" => -1L
          case s => s.toDouble.toLong
        }
        val (actualCsv, actualParquet) = actualCounts(table)
        val diffs = Seq(
          if (expectedRows != actualCsv || expectedRows != actualParquet)
            Some(s"row_count: stored=$expectedRows actual_csv=$actualCsv actual_parquet=$actualParquet")
          else None,
          if (r.getString(2) != spec.columns.length.toString)
            Some(s"column_count: stored=${r.getString(2)} expected=${spec.columns.length}")
          else None,
          if (r.getString(3) != expectedSchemaHash(table).get)
            Some(s"schema_hash: stored=${r.getString(3)} expected=${expectedSchemaHash(table).get}")
          else None).flatten
        ManifestFailure(table, diffs)
      }
    }.filter(_.differences.nonEmpty)
    ManifestCheck(rows.length.toLong, missingTables, failures.length, failures.take(30))
  }

  /** check (:273-274) + the acceptance payload/report (:277-296). */
  final case class CheckResult(check: String, status: String, details: String)

  def check(name: String, passed: Boolean, details: String): CheckResult =
    CheckResult(name, if (passed) "pass" else "fail", details)

  final case class Acceptance(batchId: String, status: String, checks: Seq[CheckResult])

  def acceptance(batchId: String, checks: Seq[CheckResult]): Acceptance =
    Acceptance(batchId,
      if (checks.forall(_.status == "pass")) "pass" else "fail", checks)

  /** acceptance.md (:283-295): summary table, pipes escaped, details
    * clamped to 1500 chars.
    */
  def acceptanceMarkdown(a: Acceptance): String = {
    val header = Seq(
      "# Oireachtas validation-fixes candidate acceptance", "",
      s"- Batch: `${a.batchId}`",
      s"- Overall: **${a.status}**", "",
      "| Check | Status | Details |", "|---|---|---|")
    val rows = a.checks.map { c =>
      val details = c.details.replace("|", "\\|").take(1500)
      s"| ${c.check} | **${c.status}** | $details |"
    }
    (header ++ rows).mkString("\n") + "\n"
  }

  /** The five-table acceptance run (main :299-372) over injected
    * frames: candidate/production member-parties and constituencies,
    * the official recent frames, the candidate bill roster, and the
    * control manifests. HTTP fetch and S3 reads happen upstream
    * (RestSource / TableIO); here is only the gate logic.
    */
  def runAcceptance(batchId: String,
                    batchManifestStatus: String, batchManifestTableCount: Int,
                    batchManifestValidationIssues: Seq[String],
                    candidateParties: DataFrame, productionParties: DataFrame,
                    candidateConstituencies: DataFrame, productionConstituencies: DataFrame,
                    candidateSections: DataFrame, officialSections: DataFrame,
                    candidateQuestions: DataFrame, officialQuestions: DataFrame,
                    candidateVersions: DataFrame, officialVersions: DataFrame,
                    candidateBillDebates: DataFrame, officialBillDebates: DataFrame,
                    candidateBills: DataFrame,
                    candidateManifests: DataFrame,
                    actualCounts: String => (Long, Long),
                    officialSources: Map[String, String] = Map.empty): Acceptance = {
    val partyDups = businessDuplicates(candidateParties,
      Seq("member_code", "party_uri", "party_start", "party_end")).count()
    val conDups = businessDuplicates(candidateConstituencies,
      Seq("member_code", "constituency_uri", "represent_start", "represent_end")).count()
    // bounded difference samples ride the detail string (the reference
    // records changes[:20] — verify_validation_fixes.py:358-359 — so a
    // failing report names WHAT drifted, not just how much)
    def changeSamples(diffs: DataFrame): (Long, String) = {
      val rows = diffs.limit(21).collect()
      val n = if (rows.length > 20) diffs.count() else rows.length.toLong
      (n, rows.take(20).map(r =>
        s"${r.getString(0)}:${r.getSeq[String](1).mkString("+")}<>${r.getSeq[String](2).mkString("+")}")
        .mkString(","))
    }
    val (partyChanges, partySamples) = changeSamples(
      currentValueDifferences(candidateParties, productionParties,
        Seq("party_uri", "party_name")))
    val (conChanges, conSamples) = changeSamples(
      currentValueDifferences(candidateConstituencies, productionConstituencies,
        Seq("constituency_uri", "constituency_name")))

    val liveBills = candidateBills.select(col("bill_id"))
    val sectionCheck = keyCompleteness(candidateSections, officialSections, "debate_section_id")
    val questionCheck = keyCompleteness(candidateQuestions, officialQuestions, "question_id")
    val scopedVersions = officialVersions
      .withColumn("bill_id", coalesce(col("bill_id").cast("string"), lit("")))
      .join(broadcast(liveBills.select(col("bill_id").cast("string").as("bill_id")).distinct()),
        Seq("bill_id"))
    val versionCheck = keyCompleteness(candidateVersions, scopedVersions, "bill_version_id")
    val debateCheck = billDebateBusinessCompleteness(candidateBillDebates,
      officialBillDebates, liveBills)
    val controlCheck = validateControlManifests(candidateManifests, actualCounts)

    def kcDetails(k: KeyCompleteness, sourceKey: String): String =
      s"official_rows=${k.officialRows} candidate_rows=${k.candidateRows} " +
        s"missing_count=${k.missingCount} missing_samples=${k.missingSamples.mkString(",")} " +
        s"source=${officialSources.getOrElse(sourceKey, "")}"

    acceptance(batchId, Seq(
      check("batch_manifest_validated",
        batchManifestStatus == "validated" && batchManifestTableCount >= 31 &&
          batchManifestValidationIssues.isEmpty,
        s"status=$batchManifestStatus table_count=$batchManifestTableCount " +
          s"issues=${batchManifestValidationIssues.mkString(",")}"),
      check("member_party_business_keys_unique", partyDups == 0,
        s"duplicate_rows=$partyDups"),
      check("member_constituency_business_keys_unique", conDups == 0,
        s"duplicate_rows=$conDups"),
      check("current_party_values_unchanged", partyChanges == 0,
        s"difference_count=$partyChanges samples=$partySamples"),
      check("current_constituency_values_unchanged", conChanges == 0,
        s"difference_count=$conChanges samples=$conSamples"),
      check("recent_official_debate_sections_present",
        sectionCheck.missingCount == 0, kcDetails(sectionCheck, "debates")),
      check("recent_official_questions_present",
        questionCheck.missingCount == 0, kcDetails(questionCheck, "questions")),
      check("official_bill_versions_present",
        versionCheck.missingCount == 0, kcDetails(versionCheck, "legislation")),
      check("official_bill_debate_business_rows_present",
        debateCheck.missingBusinessRows == 0,
        s"official_rows_for_candidate_bills=${debateCheck.officialRowsForCandidateBills} " +
          s"candidate_rows=${debateCheck.candidateRows} " +
          s"missing_business_rows=${debateCheck.missingBusinessRows} " +
          s"missing_samples=${debateCheck.missingSamples.mkString(",")} " +
          s"source=${officialSources.getOrElse("legislation", "")}"),
      check("control_manifest_counts_and_schemas_match_candidate",
        controlCheck.missingTables.isEmpty && controlCheck.failureCount == 0,
        s"row_count=${controlCheck.rowCount} " +
          s"missing_tables=${controlCheck.missingTables.mkString(",")} " +
          s"failure_count=${controlCheck.failureCount}")))
  }
}
