package graft

import org.apache.spark.sql.functions._
import graft.operators.{DqOps, MergeOps}

/** ScalaTest ports of the reference's merge-kernel unit tests
  * (tests/test_oireachtas_write_semantics.py,
  * test_oireachtas_business_key_merge.py, test_oireachtas_history_dedupe.py).
  */
class MergeOpsSpec extends SparkSpec {
  import spark.implicits._

  private def members(rows: (String, String, String)*) =
    rows.toDF("member_code", "party", "snapshot_date")

  test("upsert preserves history and updates on pk collision (write_semantics:26-38)") {
    val existing = members(("m1", "FF", "2024-01-01"), ("m2", "FG", "2024-01-01"))
    val incoming = members(("m2", "SF", "2024-02-01"), ("m3", "LAB", "2024-02-01"))
    val out = MergeOps.upsert(existing, incoming, Seq("member_code"))
      .orderBy("member_code").collect()
    assert(out.length == 3)
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("m1", "FF"), ("m2", "SF"), ("m3", "LAB")))
  }

  test("upsert is idempotent: re-applying the same incoming changes nothing") {
    val existing = members(("m1", "FF", "2024-01-01"), ("m2", "FG", "2024-01-01"))
    val incoming = members(("m2", "SF", "2024-02-01"))
    val once = MergeOps.upsert(existing, incoming, Seq("member_code"))
    val twice = MergeOps.upsert(once, incoming, Seq("member_code"))
    assert(once.orderBy("member_code").collect().toSeq ==
      twice.orderBy("member_code").collect().toSeq)
  }

  test("snapshot replace drops rows missing from incoming (write_semantics:48-53)") {
    val incoming = members(("m1", "FF", "2024-02-01"))
    assert(MergeOps.snapshotReplace(incoming).count() == 1)
  }

  test("business-key merge keeps the incoming surrogate id (business_key_merge:12-70)") {
    val existing = Seq(("legacy_1", "m1", "FF", "2020-01-01", ""))
      .toDF("member_party_id", "member_code", "party_uri", "party_start", "party_end")
    val incoming = Seq(("stable_1", "m1", "FF", "2020-01-01", ""))
      .toDF("member_party_id", "member_code", "party_uri", "party_start", "party_end")
    val out = MergeOps.upsert(existing, incoming, Seq("member_party_id"),
      businessKey = Seq("member_code", "party_uri", "party_start", "party_end"))
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "stable_1")
  }

  test("business-key merge keeps distinct history rows") {
    val existing = Seq(
      ("id1", "m1", "FF", "2020-01-01", "2022-01-01"),
      ("id2", "m1", "FF", "2022-01-02", "")).toDF(
      "member_party_id", "member_code", "party_uri", "party_start", "party_end")
    val out = MergeOps.upsert(existing, existing.limit(0), Seq("member_party_id"),
      businessKey = Seq("member_code", "party_uri", "party_start", "party_end"))
    assert(out.count() == 2)
  }

  test("history dedupe collapses exact dups and reports conflicts (history_dedupe)") {
    val df = Seq(
      ("bk1", "v1"), ("bk1", "v1"),       // exact dup → collapsed, no conflict
      ("bk2", "a"), ("bk2", "b"),         // value conflict → reported
      ("bk3", "x")
    ).toDF("bk", "v")
    val (deduped, conflicts) = MergeOps.historyDedupe(df, Seq("bk"), Seq("v"))
    assert(deduped.count() == 3)
    val c = conflicts.collect()
    assert(c.length == 1 && c.head.getString(0) == "bk2" && c.head.getLong(1) == 2)
  }

  test("temporal integrity counts inverted ranges and future-current rows (write_semantics:60-75)") {
    val df = Seq(
      ("2024-01-01", "2024-06-01", "true"),
      ("2024-06-01", "2024-01-01", "false"), // inverted
      ("2030-01-01", "2031-01-01", "true")   // future start flagged current
    ).toDF("valid_from", "valid_to", "is_current")
      .select(to_date($"valid_from").as("valid_from"),
        to_date($"valid_to").as("valid_to"), $"is_current")
    val r = MergeOps.temporalIntegrity(df, "valid_from", "valid_to", "is_current",
      to_date(lit("2024-06-15"))).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 1L, 1L)))
  }

  test("fk orphans: nullable FKs dropped first (write_semantics:77-83)") {
    val child = Seq(("c1", "p1"), ("c2", "p9"), ("c3", null)).toDF("id", "fk")
    val parent = Seq("p1", "p2").toDF("pid")
    val orphans = MergeOps.fkOrphans(child, parent, "fk", "pid").collect()
    assert(orphans.length == 1 && orphans.head.getString(0) == "c2")
  }

  test("overlap counting per entity (write_semantics:85-90)") {
    val df = Seq(
      ("e1", "2024-01-01", "2024-03-01"),
      ("e1", "2024-02-01", "2024-04-01"), // overlaps previous
      ("e1", "2024-05-01", "2024-06-01"),
      ("e2", "2024-01-01", "2024-02-01")
    ).toDF("entity", "start", "end")
    val out = MergeOps.overlapCount(df, "entity", "start", "end")
      .orderBy("entity").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("e1", 1L), ("e2", 0L)))
  }

  test("latestPerGroup: current flag wins, then open-ended end date (members:259-277)") {
    val df = Seq(
      ("m1", "a", "2020-01-01", "2021-01-01", "false"),
      ("m1", "b", "2021-01-02", "", "true"),
      ("m2", "c", "2019-01-01", "", "false"),
      ("m2", "d", "2018-01-01", "2018-12-31", "false")
    ).toDF("member", "row", "start", "end", "is_current")
    val out = MergeOps.latestPerGroup(df, Seq("member"), Seq(
      graft.functions.Fns.truthy(col("is_current")).desc,
      coalesce(graft.functions.Fns.parseIsoDate(col("end")), to_date(lit("9999-12-31"))).desc,
      col("start").desc))
    assert(out.orderBy("member").collect().map(_.getString(1)).toSeq == Seq("b", "c"))
  }

  test("missingDelta picks only rows without non-blank output (llm_table_runner:361-400)") {
    val input = Seq("i1", "i2", "i3", "i4").toDF("id")
    val existing = Seq(("i1", "done"), ("i2", ""), ("i9", "done")).toDF("id", "out")
    val delta = MergeOps.missingDelta(input, existing, "id", "out")
      .orderBy("id").as[String].collect().toSeq
    assert(delta == Seq("i2", "i3", "i4"))
  }

  test("DQ summary counts pk duplicates and blanks in one pass") {
    val df = Seq(("k1", "x"), ("k1", "y"), ("", "z"), ("k2", "")).toDF("pk", "v")
    val r = DqOps.summary(df, Seq("pk"), Seq("v")).collect().head
    assert(r.getAs[Long]("row_count") == 4)
    assert(r.getAs[Long]("pk_duplicate_count") == 1)
    assert(r.getAs[Long]("pk_blank_count") == 1)
    assert(r.getAs[Long]("populated_v") == 3)
  }

  test("DQ contract validation flags missing columns and pk violations") {
    val df = Seq(("k1", "x"), ("k1", "y")).toDF("pk", "v")
    val checks = DqOps.validate(df, DqOps.Contract(
      minRows = 1, requiredCols = Seq("pk", "missing_col"), pk = Seq("pk")))
    val byName = checks.map(c => c._1 -> c._2).toMap
    assert(!byName("required_columns"))
    assert(byName("min_rows"))
    assert(!byName("pk_unique"))
    assert(byName("pk_nonblank"))
  }
}
