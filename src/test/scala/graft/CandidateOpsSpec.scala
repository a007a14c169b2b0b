package graft

import java.nio.file.Files

import graft.io.BatchStore
import graft.orchestrate.CandidateOps
import graft.orchestrate.CandidateOps.ComparisonThreshold

/** ScalaTest ports of the reference's candidate-lifecycle tests:
  * tests/test_oireachtas_seed_candidate.py (clone of a complete validated
  * production batch) and tests/test_oireachtas_repair_regressions.py
  * (publishing guard default-deny + suppression, comparison contracts).
  */
class CandidateOpsSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(): BatchStore = {
    val dir = Files.createTempDirectory("candidate-ops").toString
    BatchStore.local(dir, () => "2026-01-01T00:00:00Z")
  }

  test("seed_candidate clones a complete validated production batch") {
    val store = newStore()
    val sourceBatch = "production-1"
    val destinationBatch = "scheduled-weekly-2"
    val table = "silver_members"
    val logicalCsv = s"latest/csv/$table.csv"
    val logicalParquet = s"latest/parquet/$table.parquet"
    val sourceCsv = store.batchKeyForProductionKey(logicalCsv, sourceBatch)
    val sourceParquet = store.batchKeyForProductionKey(logicalParquet, sourceBatch)
    store.putBytes(sourceCsv, "member_code\nA\n".getBytes("UTF-8"))
    store.putBytes(sourceParquet, "parquet".getBytes("UTF-8"))

    val entry = Map[String, Any](
      "batch_id" -> sourceBatch,
      "table" -> table,
      "status" -> "validated",
      "dq_status" -> "pass",
      "objects" -> Seq(
        Map[String, Any]("logical_key" -> logicalCsv, "batch_key" -> sourceCsv, "exists" -> true),
        Map[String, Any]("logical_key" -> logicalParquet, "batch_key" -> sourceParquet, "exists" -> true)))
    store.putJson(store.batchEntryKey(sourceBatch, table), entry)
    store.putJson(store.batchManifestKey(sourceBatch), Map[String, Any](
      "batch_id" -> sourceBatch, "status" -> "validated",
      "required_tables" -> Seq(table), "table_count" -> 1L,
      "tables" -> Seq(entry),
      "validation" -> Map("missing_tables" -> Nil, "failed_tables" -> Nil,
        "missing_objects" -> Nil, "duplicate_tables" -> Nil)))
    store.putJson(store.productionPointerKey, Map[String, Any](
      "mode" -> "batch", "batch_id" -> sourceBatch))

    val result = CandidateOps.seedCandidate(store, destinationBatch)

    assert(result("status") == "seeded")
    assert(result("source_batch_id") == sourceBatch)
    assert(result("copied_entries") == 1)
    assert(result("copied_objects") == 2)
    val destCsv = store.batchKeyForProductionKey(logicalCsv, destinationBatch)
    val destParquet = store.batchKeyForProductionKey(logicalParquet, destinationBatch)
    assert(store.readBytes(destCsv).sameElements(store.readBytes(sourceCsv)))
    assert(store.readBytes(destParquet).sameElements(store.readBytes(sourceParquet)))
    val seededManifest = store.readJsonIfExists(store.batchManifestKey(destinationBatch)).get
    assert(seededManifest("status") == "validated")
    assert(String.valueOf(seededManifest("table_count")) == "1")
    // provenance recorded on the seeded entry
    val seededEntry = store.readJsonIfExists(store.batchEntryKey(destinationBatch, table)).get
    assert(seededEntry("seeded_from_batch_id") == sourceBatch)
  }

  test("seed_candidate guards: same id, legacy pointer, unvalidated source") {
    val store = newStore()
    intercept[RuntimeException](CandidateOps.seedCandidate(store, "b1")) // no pointer

    store.putJson(store.productionPointerKey, Map[String, Any]("mode" -> "legacy_direct"))
    val e1 = intercept[RuntimeException](CandidateOps.seedCandidate(store, "b1"))
    assert(e1.getMessage.contains("batch-mode production pointer"))

    store.putJson(store.productionPointerKey, Map[String, Any]("mode" -> "batch", "batch_id" -> "b1"))
    intercept[IllegalArgumentException](CandidateOps.seedCandidate(store, "b1"))

    store.putJson(store.batchManifestKey("b1"), Map[String, Any]("batch_id" -> "b1", "status" -> "failed"))
    val e2 = intercept[RuntimeException](CandidateOps.seedCandidate(store, "b2"))
    assert(e2.getMessage.contains("not validated"))
  }

  test("reassemble preserves and extends required tables") {
    val store = newStore()
    val table = "silver_members"
    store.putBytes(store.batchKeyForProductionKey(s"latest/csv/$table.csv", "b1"), "x".getBytes)
    store.recordBatchTable("b1", table, 10L, "pass", Seq("member_code"), Seq("member_code"),
      Seq(s"latest/csv/$table.csv"))
    store.assembleBatchManifest("b1", Seq(table))
    // extending required tables with a missing one flips validation
    val m = CandidateOps.reassembleCandidate(store, "b1", Seq("silver_divisions"))
    assert(m("status") == "failed")
    val ok = CandidateOps.reassembleCandidate(store, "b1")
    // original required tables preserved (union keeps silver_divisions from
    // the manifest written by the failed reassembly)
    assert(ok("status") == "failed")
  }

  test("production publish is default deny; both switches required") {
    assert(!CandidateOps.productionPublishingEnabled(Map.empty))
    assert(!CandidateOps.productionPublishingEnabled(Map("OIREACHTAS_PUBLISH_ENABLED" -> "true")))
    assert(!CandidateOps.productionPublishingEnabled(Map("OIREACHTAS_PUBLISH_LATEST" -> "true")))
    assert(CandidateOps.productionPublishingEnabled(Map(
      "OIREACHTAS_PUBLISH_ENABLED" -> "true", "OIREACHTAS_PUBLISH_LATEST" -> "true")))
  }

  test("guard suppresses mutable latest/compat writes, allows run-scoped") {
    val store = newStore()
    val env = Map.empty[String, String]
    assert(CandidateOps.guardedPut(store, env, "latest/csv/x.csv", "x".getBytes).isEmpty)
    assert(CandidateOps.guardedPut(store, env, "compat/x.csv", "x".getBytes).isEmpty)
    val written = CandidateOps.guardedPut(store, env, "silver/x/run_id=1/x.csv", "x".getBytes)
    assert(written.contains("silver/x/run_id=1/x.csv"))
    assert(store.exists("silver/x/run_id=1/x.csv"))
    assert(!store.exists("latest/csv/x.csv"))

    // requested candidate writes redirect into the batch prefix and demand
    // a batch id
    val envOn = Map("OIREACHTAS_PUBLISH_LATEST" -> "true")
    intercept[RuntimeException](CandidateOps.guardedPut(store, envOn, "latest/csv/x.csv", "x".getBytes))
    val redirected = CandidateOps.guardedPut(store,
      envOn + ("OIREACHTAS_BATCH_ID" -> "b9"), "latest/csv/x.csv", "x".getBytes)
    assert(redirected.contains("batches/b9/tables/x/csv/x.csv"))
  }

  test("compatibility fails when legacy member keys are missing") {
    val row = Map[String, Any](
      "legacy_rows" -> 176, "compat_rows" -> 98,
      "legacy_only_key_count" -> 78, "compat_only_key_count" -> 0,
      "compat_join_coverage_pct" -> 100.0)
    val threshold = ComparisonThreshold(
      name = "members_roster_compat",
      maxLegacyOnlyKeys = 0, maxCompatOnlyKeys = 0,
      maxRowDeltaPct = 2.0, minimumCompatJoinCoveragePct = 100.0)
    val (status, reasons) = CandidateOps.comparisonStatus(row, threshold)
    assert(status == "fail")
    assert(reasons.exists(_.contains("legacy-only keys 78")))

    val comparisons = Seq(("members_roster_compat", status, reasons.mkString("; ")))
      .toDF("comparison_name", "status", "failure_reasons")
    assert(CandidateOps.comparisonDq(comparisons)("dq_status") == "fail")
  }

  test("consumer smoke: parity checks + renderer context for top constituency") {
    val members = (1 to 160).map(i =>
        (s"m$i", s"Member $i", if (i <= 100) "Big Con" else "Small Con", "P"))
      .toDF("member_code", "full_name", "constituency", "party")
    val metrics = (1 to 160).map(i => (s"m$i", i)).toDF("member_code", "speeches")
    val issues = Seq(("Member 1", "Housing"), ("Member 1", "Housing"), ("Member 101", "Health"))
      .toDF("speaker_name", "issue")
    val empty = spark.emptyDataFrame
    val report = CandidateOps.consumerSmoke(members, metrics, empty, empty, issues, empty,
      batchId = "b1", targetYear = 2026)
    assert(report("status") == "pass")
    assert(report("constituency") == "Big Con")
    assert(report("selected_member") == "Member 1") // highest speech count in Big Con
    assert(report("member_rows") == 160L)

    val dupMembers = members.union(Seq(("m1", "Member 1", "Big Con", "P"))
      .toDF("member_code", "full_name", "constituency", "party"))
    val e = intercept[RuntimeException](CandidateOps.consumerSmoke(
      dupMembers, metrics, empty, empty, issues, empty, "b1", 2026))
    assert(e.getMessage.contains("duplicate member_code") || e.getMessage.contains("row mismatch"))
  }
}
