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
}
