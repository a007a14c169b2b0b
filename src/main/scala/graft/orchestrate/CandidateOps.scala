package graft.orchestrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.BatchStore

/** Candidate lifecycle orchestration (reference
  * process/oireachtas_seed_candidate.py:38-114,
  * process/oireachtas_reassemble_candidate.py:28-41,
  * process/oireachtas_consumer_smoke.py:49-108, plus the publishing guard
  * of extract/oireachtas/io_s3.py:37-83 and the compat-comparison
  * contracts of extract/oireachtas/contracts.py:157-176).
  */
object CandidateOps {

  /** Clone the current validated production batch into a new candidate:
    * copy every object to the destination batch prefix, rewrite each
    * entry with seeding provenance, reassemble + validate the manifest.
    */
  def seedCandidate(store: BatchStore, batchId: String): Map[String, Any] = {
    val id = BatchStore.validateBatchId(batchId)
    val pointer = store.readJsonIfExists(store.productionPointerKey)
      .getOrElse(throw new RuntimeException("Production pointer does not exist"))
    if (str(pointer.getOrElse("mode", BatchStore.BatchMode)) != BatchStore.BatchMode)
      throw new RuntimeException("Automatic candidate seeding requires a batch-mode production pointer")

    val sourceBatchId = BatchStore.validateBatchId(str(pointer.get("batch_id")))
    if (sourceBatchId == id)
      throw new IllegalArgumentException("destination batch_id must differ from the production batch_id")

    val sourceManifest = store.readJsonIfExists(store.batchManifestKey(sourceBatchId))
      .getOrElse(throw new RuntimeException(s"No manifest for batch $sourceBatchId"))
    if (str(sourceManifest.get("status")) != "validated")
      throw new RuntimeException(s"Production batch $sourceBatchId is not validated")

    var copiedObjects = 0
    var copiedEntries = 0
    seqOfMaps(sourceManifest.getOrElse("tables", Nil)).foreach { sourceEntry =>
      val table = str(sourceEntry.getOrElse("table", "")).trim
      if (table.isEmpty)
        throw new IllegalArgumentException("Production manifest contains an entry without a table name")

      val destObjects = seqOfMaps(sourceEntry.getOrElse("objects", Nil)).map { obj =>
        val logicalKey = str(obj.getOrElse("logical_key", "")).trim
        val sourceKey = str(obj.getOrElse("batch_key", "")).trim
        if (logicalKey.isEmpty || sourceKey.isEmpty)
          throw new IllegalArgumentException(s"Table $table contains an invalid object reference")
        val destKey = store.batchKeyForProductionKey(logicalKey, id)
        val size = store.copyObject(sourceKey, destKey)
        copiedObjects += 1
        Map[String, Any](
          "logical_key" -> logicalKey,
          "batch_key" -> destKey,
          "exists" -> true,
          "size" -> size,
          "etag" -> "",
          "version_id" -> null)
      }

      val entry = sourceEntry ++ Map[String, Any](
        "batch_id" -> id,
        "recorded_at_utc" -> store.timestamp(),
        "seeded_from_batch_id" -> sourceBatchId,
        "objects" -> destObjects)
      store.putJson(store.batchEntryKey(id, table), entry)
      copiedEntries += 1
    }

    val manifest = store.assembleBatchManifest(id,
      seqOfStrings(sourceManifest.getOrElse("required_tables", Nil)))
    if (str(manifest.get("status")) != "validated")
      throw new RuntimeException(s"Seeded candidate failed validation: ${manifest.get("validation")}")

    Map(
      "status" -> "seeded",
      "source_batch_id" -> sourceBatchId,
      "batch_id" -> id,
      "copied_entries" -> copiedEntries,
      "copied_objects" -> copiedObjects,
      "table_count" -> manifest.getOrElse("table_count", 0L))
  }

  /** Reassemble a candidate's manifest preserving (∪ extending) its
    * original required tables; returns the manifest — callers gate on its
    * status like the script's exit code.
    */
  def reassembleCandidate(store: BatchStore, batchId: String,
                          extraRequired: Seq[String] = Nil): Map[String, Any] = {
    val id = BatchStore.validateBatchId(batchId)
    val existing = store.readJsonIfExists(store.batchManifestKey(id))
      .getOrElse(throw new RuntimeException(s"No manifest for batch $id"))
    val required = (seqOfStrings(existing.getOrElse("required_tables", Nil)) ++ extraRequired)
      .distinct.sorted
    store.assembleBatchManifest(id, required)
  }

  // ---------------- publishing guard (io_s3.py:25-83) ----------------

  private val Truthy = Set("1", "true", "yes", "on")
  /** Relative-key production prefixes (the store root stands in for the
    * bucket + processed/oireachtas_unified/ prefix).
    */
  private val ProductionPrefixes = Seq("latest/", "compat/", "review/")

  def candidateWriteRequested(env: Map[String, String]): Boolean =
    Truthy(env.getOrElse("OIREACHTAS_PUBLISH_LATEST", "false").trim.toLowerCase)

  /** Default-deny: BOTH the repo switch and the candidate-write switch are
    * required (io_s3.py:41-43).
    */
  def productionPublishingEnabled(env: Map[String, String]): Boolean =
    Truthy(env.getOrElse("OIREACHTAS_PUBLISH_ENABLED", "false").trim.toLowerCase) &&
      candidateWriteRequested(env)

  def isProductionKey(key: String): Boolean = ProductionPrefixes.exists(key.startsWith)

  /** Guarded write (io_s3.py:74-83): mutable production keys are silently
    * dropped unless candidate writes are requested, in which case they
    * REDIRECT to the immutable batch prefix (OIREACHTAS_BATCH_ID
    * mandatory); non-production keys always write through.
    * Returns the key actually written, or None when suppressed.
    */
  def guardedPut(store: BatchStore, env: Map[String, String],
                 key: String, body: Array[Byte]): Option[String] = {
    val target =
      if (isProductionKey(key)) {
        if (!candidateWriteRequested(env)) return None
        val batchId = env.get("OIREACHTAS_BATCH_ID").map(_.trim).filter(_.nonEmpty)
          .getOrElse(throw new RuntimeException(
            "OIREACHTAS_BATCH_ID is required for every requested candidate write"))
        store.batchKeyForProductionKey(key, batchId)
      } else key
    store.putBytes(target, body)
    Some(target)
  }

  // ---------------- compat comparison contracts (contracts.py) ----------------

  final case class ComparisonThreshold(
      name: String,
      maxLegacyOnlyKeys: Int = 0,
      maxCompatOnlyKeys: Int = 0,
      maxRowDeltaPct: Double = 0.0,
      minimumCompatJoinCoveragePct: Double = 100.0)

  /** contracts.py:157-176 comparison_status — identical failure messages. */
  def comparisonStatus(row: Map[String, Any], threshold: ComparisonThreshold): (String, Seq[String]) = {
    def num(k: String): Double = row.get(k).map(String.valueOf).flatMap(s =>
      scala.util.Try(s.toDouble).toOption).getOrElse(0.0)
    val legacyOnly = num("legacy_only_key_count").toInt
    val compatOnly = num("compat_only_key_count").toInt
    val legacyRows = num("legacy_rows").toInt
    val compatRows = num("compat_rows").toInt
    val coverage = num("compat_join_coverage_pct")
    val denominator = math.max(legacyRows, 1)
    val rowDeltaPct = math.abs(compatRows - legacyRows).toDouble / denominator * 100.0
    val errors = Seq.newBuilder[String]
    if (compatRows <= 0) errors += "compat output is empty"
    if (legacyOnly > threshold.maxLegacyOnlyKeys)
      errors += s"legacy-only keys $legacyOnly exceed ${threshold.maxLegacyOnlyKeys}"
    if (compatOnly > threshold.maxCompatOnlyKeys)
      errors += s"compat-only keys $compatOnly exceed ${threshold.maxCompatOnlyKeys}"
    if (rowDeltaPct > threshold.maxRowDeltaPct)
      errors += f"row delta $rowDeltaPct%.2f%% exceeds ${threshold.maxRowDeltaPct}%.2f%%"
    if (coverage < threshold.minimumCompatJoinCoveragePct)
      errors += f"compat join coverage $coverage%.2f%% below ${threshold.minimumCompatJoinCoveragePct}%.2f%%"
    val es = errors.result()
    (if (es.nonEmpty) "fail" else "pass", es)
  }

  /** compat_comparison.py:159-176 _dq over the comparisons frame. */
  def comparisonDq(comparisons: DataFrame): Map[String, Any] = {
    val rowCount = comparisons.count()
    val cols = comparisons.columns.toSet
    val pkUnique = cols.contains("comparison_name") &&
      comparisons.groupBy("comparison_name").count().filter(col("count") > 1).isEmpty
    val failing =
      if (cols.contains("status"))
        comparisons.filter(col("status") === "fail")
          .select("comparison_name").collect().map(_.getString(0)).toSeq
      else Seq("missing_status")
    Map(
      "table" -> "control_compat_comparisons",
      "dq_status" -> (if (rowCount > 0 && pkUnique && failing.isEmpty) "pass" else "fail"),
      "row_count" -> rowCount,
      "primary_key" -> Seq("comparison_name"),
      "primary_key_unique" -> pkUnique,
      "failing" -> failing)
  }

  // ---------------- consumer smoke (oireachtas_consumer_smoke.py) ----------------

  /** Downstream-consumer smoke against one immutable batch: roster
    * completeness + pk uniqueness, metrics row/key-set parity, then the
    * renderer context built for the most common constituency. Throws on
    * any violated invariant; returns the pass report.
    */
  def consumerSmoke(members: DataFrame, metrics: DataFrame,
                    photos: DataFrame, summaries: DataFrame,
                    debateIssues: DataFrame, images: DataFrame,
                    batchId: String, targetYear: Int,
                    minMembers: Long = 150): Map[String, Any] = {
    val memberRows = members.count()
    if (memberRows < minMembers)
      throw new RuntimeException(s"Members consumer input is incomplete: $memberRows rows")
    if (members.groupBy("member_code").count().filter(col("count") > 1).limit(1).count() > 0)
      throw new RuntimeException("Members consumer input contains duplicate member_code values")

    val metricsRows = metrics.count()
    if (metricsRows != memberRows)
      throw new RuntimeException(s"Metrics/member row mismatch: metrics=$metricsRows members=$memberRows")
    val onlyInMetrics = metrics.select("member_code").except(members.select("member_code")).count()
    val onlyInMembers = members.select("member_code").except(metrics.select("member_code")).count()
    if (onlyInMetrics > 0 || onlyInMembers > 0)
      throw new RuntimeException("Metrics member_code set does not match candidate members")

    val constituency = members
      .select(trim(coalesce(col("constituency"), lit(""))).as("c"))
      .filter(col("c") =!= "").groupBy("c").count()
      .orderBy(col("count").desc, col("c").asc).limit(1)
      .collect().headOption.map(_.getString(0))
      .getOrElse(throw new RuntimeException("No non-blank constituency in members"))

    val context = graft.gold.RendererContext.buildPostContext(
      members, photos, summaries, debateIssues, images, constituency)

    Map(
      "status" -> "pass",
      "batch_id" -> batchId,
      "target_year" -> targetYear,
      "member_rows" -> memberRows,
      "metrics_rows" -> metricsRows,
      "constituency" -> constituency,
      "selected_member" -> context.member.fullName,
      "issue_count" -> context.issues.size.toLong)
  }

  // ---------------- helpers ----------------

  private def str(v: Any): String = v match {
    case Some(x) => String.valueOf(x)
    case None | null => null
    case x => String.valueOf(x)
  }
  private def seqOfMaps(v: Any): Seq[Map[String, Any]] = v match {
    case s: Seq[_] => s.collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }
    case _ => Nil
  }
  private def seqOfStrings(v: Any): Seq[String] = v match {
    case s: Seq[_] => s.map(String.valueOf)
    case _ => Nil
  }
}
