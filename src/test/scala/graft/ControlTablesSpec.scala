package graft

import graft.control.ControlTables
import graft.operators.MergeOps

/** Control-layer assembly + append-with-pk-dedupe write policy
  * (reference tables.yml:210-232, write_policies append path).
  */
class ControlTablesSpec extends SparkSpec {
  import spark.implicits._

  test("dq results carry stable ids and statuses; appends dedupe by pk") {
    val r1 = ControlTables.dqResults(spark, "run1", "silver_members",
      Seq(("pk_unique", true, "0"), ("min_rows", false, "0")), "2026-01-01T00:00:00+00:00")
    assert(r1.count() == 2)
    val byCheck = r1.collect().map(r => r.getAs[String]("check_name") -> r.getAs[String]("status")).toMap
    assert(byCheck == Map("pk_unique" -> "pass", "min_rows" -> "fail"))

    // same run re-recorded → append + pk dedupe keeps one row per check
    val again = ControlTables.dqResults(spark, "run1", "silver_members",
      Seq(("pk_unique", true, "0"), ("min_rows", true, "5")), "2026-01-02T00:00:00+00:00")
    val merged = MergeOps.append(r1.toDF(), again.toDF(), Seq("dq_result_id"))
    assert(merged.count() == 2)
    // incoming wins: min_rows now pass
    assert(merged.filter($"check_name" === "min_rows").collect().head
      .getAs[String]("status") == "pass")
  }

  test("manifest records are 1-per-table with schema hashes") {
    val m = ControlTables.tableManifests(spark, Seq(
      ControlTables.ManifestRecord("silver_members", "run1", "2026-01-01",
        "latest/parquet/silver_members.parquet", "latest/csv/silver_members.csv",
        "174", "15", ControlTables.schemaHash(Seq("member_code", "full_name")),
        "true", "pass", "2026-01-01T00:00:00+00:00")))
    assert(m.count() == 1)
    assert(m.collect().head.getAs[String]("schema_hash").length == 16)
  }

  test("candidate counts use merged objects; csv/parquet mismatch fails") {
    val dir = java.nio.file.Files.createTempDirectory("counts").toString
    val df3 = Seq("1", "2", "3").toDF("id")
    df3.coalesce(1).write.option("header", "true").mode("overwrite").csv(s"$dir/c3")
    df3.coalesce(1).write.mode("overwrite").parquet(s"$dir/p3")
    val ok = ControlTables.actualCandidateCounts(spark, s"$dir/c3", s"$dir/p3")
    assert(ok == Map("row_count" -> 3L, "csv_rows" -> 3L, "parquet_rows" -> 3L))

    Seq("1").toDF("id").coalesce(1).write.mode("overwrite").parquet(s"$dir/p1")
    val e = intercept[IllegalStateException] {
      ControlTables.actualCandidateCounts(spark, s"$dir/c3", s"$dir/p1")
    }
    assert(e.getMessage.contains("CSV/Parquet row mismatch"))
  }

  test("quoted embedded newlines count as one CSV record (pandas parity)") {
    val dir = java.nio.file.Files.createTempDirectory("counts_nl").toString
    // Spark's own CSV writer quotes the embedded newline; the default
    // line-split reader would see 4 lines and over-count
    val df = Seq(("1", "a speech\nwith a newline"), ("2", "plain")).toDF("id", "speech_text")
    df.coalesce(1).write.option("header", "true").mode("overwrite").csv(s"$dir/c")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/p")
    val ok = ControlTables.actualCandidateCounts(spark, s"$dir/c", s"$dir/p")
    assert(ok("row_count") == 2L)
  }

  test("self row uses final manifest row count without reading itself") {
    def rec(t: String) = ControlTables.ManifestRecord(t, "r1", "2026-01-01",
      s"$t.parquet", s"$t.csv", "old", "3", "h", "true", "pass", "now")
    val rows = Seq(rec("silver_members"), rec("control_table_manifests"))
    var calls = 0
    val (updated, errors) = ControlTables.populateActualCandidateRowCounts(rows,
      (csv, pq) => { calls += 1; assert(csv == "silver_members.csv" && pq == "silver_members.parquet")
        Map("row_count" -> 174L, "csv_rows" -> 174L, "parquet_rows" -> 174L) })
    assert(errors.isEmpty)
    assert(updated.find(_.table_name == "silver_members").get.row_count == "174")
    assert(updated.find(_.table_name == "control_table_manifests").get.row_count == "2")
    assert(calls == 1)

    // per-table failures collect, others still update
    val (u2, e2) = ControlTables.populateActualCandidateRowCounts(rows,
      (_, _) => throw new RuntimeException("boom"))
    assert(e2.exists(_.contains("silver_members: candidate row count")))
    assert(u2.find(_.table_name == "control_table_manifests").get.row_count == "2")
  }
}
