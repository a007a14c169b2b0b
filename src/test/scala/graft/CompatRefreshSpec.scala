package graft

import java.time.LocalDate

import graft.compat.CompatOps
import graft.compat.CompatOps.ComparisonThreshold
import graft.orchestrate.RefreshRun

/** Ports of compat-adapter, comparison-threshold and refresh-ordering
  * tests (tests/test_oireachtas_compat_adapters.py,
  * test_oireachtas_downstream_contracts.py, test_oireachtas_refresh_order.py,
  * test_oireachtas_refresh_orchestration.py).
  */
class CompatRefreshSpec extends SparkSpec {
  import spark.implicits._

  test("members compat maps columns; fallback is column-presence based") {
    // reference _first_col picks the first column that EXISTS (not the
    // first non-blank value): with party_name present-but-empty the
    // output is empty; latest_party_name is used only when party_name
    // is absent entirely
    val withCol = Seq(("m1", "Alice", "", "FF", "Dublin", "34", "2024-01-01"))
      .toDF("member_code", "full_name", "party_name", "latest_party_name",
        "constituency_name", "house_no", "snapshot_date")
    assert(CompatOps.membersCompat(withCol).collect().head.getAs[String]("party") == "")

    val withoutCol = Seq(("m1", "Alice", "FF", "Dublin", "34", "2024-01-01"))
      .toDF("member_code", "full_name", "latest_party_name",
        "constituency_name", "house_no", "snapshot_date")
    val out = CompatOps.membersCompat(withoutCol).collect().head
    assert(out.getAs[String]("party") == "FF")
    assert(out.getAs[String]("source") == "oireachtas_unified")
  }

  test("member votes compat coalesces unique_vote_id from division then vote id") {
    val mv = Seq(
      ("mv1", "m1", "Alice", "div1", "v1", "2024-01-01", "Tá", "FF", "Dublin", "2024-01-02"),
      ("mv2", "m2", "Bob", "", "v2", "2024-01-01", "Níl", "FG", "Cork", "2024-01-02"))
      .toDF("member_vote_id", "member_code", "member_name", "division_id", "vote_id",
        "division_date", "vote_label", "party_name_at_vote", "constituency_name_at_vote", "snapshot_date")
    val out = CompatOps.memberVotesCompat(mv).collect()
      .map(r => r.getAs[String]("memberCode") -> r.getAs[String]("unique_vote_id")).toMap
    assert(out == Map("m1" -> "div1", "m2" -> "v2"))
  }

  test("comparison thresholds: within tolerance passes, violations enumerate") {
    val legacy = (1 to 100).map(i => s"k$i").toDF("id")
    val compat = (3 to 100).map(i => s"k$i").toDF("memberCode")
    val ok = CompatOps.compare("roster", legacy, compat, "id", "memberCode",
      ComparisonThreshold(maxLegacyOnlyKeys = 2, maxCompatOnlyKeys = 0,
        maxRowDeltaPct = 2.0, minimumCompatJoinCoveragePct = 100.0))
    assert(ok.status == "pass")
    assert(ok.matchedKeyCount == 98 && ok.legacyOnlyKeyCount == 2)

    val strict = CompatOps.compare("roster", legacy, compat, "id", "memberCode",
      ComparisonThreshold(0, 0, 1.0, 100.0))
    assert(strict.status == "fail")
    assert(strict.failureReasons.exists(_.contains("legacy-only")))
    assert(strict.failureReasons.exists(_.contains("row delta")))
  }

  test("refresh normalization: control tables last, defaults, validation") {
    val known = Set("silver_members", "gold_current_members",
      "control_pipeline_runs", "control_table_manifests")
    val in = RefreshRun.normalize("weekly", known,
      Seq("control_pipeline_runs", "silver_members", "gold_current_members",
        "control_table_manifests"),
      asOf = LocalDate.parse("2026-08-12"))
    assert(in.tables == Seq("silver_members", "gold_current_members",
      "control_pipeline_runs", "control_table_manifests"))
    assert(in.mode == "incremental")
    assert(in.dateStart == "2026-07-08" && in.dateEnd == "2026-08-12") // trailing 35 days
    assert(in.pageSize == 100)

    intercept[IllegalArgumentException](RefreshRun.normalize("weekly", known,
      Seq("silver_members", "silver_members")))          // duplicates
    intercept[IllegalArgumentException](RefreshRun.normalize("weekly", known,
      Seq("nope_table")))                                // unknown
    intercept[IllegalArgumentException](RefreshRun.normalize("yearly", known,
      Seq("silver_members"), mode = "incremental"))      // invalid mode for yearly
  }

  test("refresh windows: monthly lead-in and previous full year") {
    val asOf = LocalDate.parse("2026-08-12")
    assert(RefreshRun.defaultWindow("monthly", asOf) ==
      (LocalDate.parse("2026-06-24"), LocalDate.parse("2026-07-31")))
    assert(RefreshRun.defaultWindow("yearly", asOf) ==
      (LocalDate.parse("2025-01-01"), LocalDate.parse("2025-12-31")))
  }

  test("execute runs builds in normalized order") {
    val known = Set("silver_members", "gold_current_members", "control_pipeline_runs")
    val in = RefreshRun.normalize("weekly", known,
      Seq("control_pipeline_runs", "silver_members", "gold_current_members"),
      asOf = LocalDate.parse("2026-08-12"))
    val order = RefreshRun.execute(in, identity).map(_._1)
    assert(order == Seq("silver_members", "gold_current_members", "control_pipeline_runs"))
  }

  test("executePar: input-order results under real concurrency; refuses control tables; propagates failures") {
    val tables = (1 to 8).map(i => s"t$i")
    val in = RefreshRun.RefreshInputs("weekly", "incremental", tables,
      "dail", "34", "2026-07-08", "2026-08-12", 100, 10)
    // builds finish in REVERSE submission order (later = shorter sleep):
    // the result sequence must still follow input order, and the pool
    // must genuinely overlap (peak concurrency > 1)
    val live = new java.util.concurrent.atomic.AtomicInteger(0)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    val out = RefreshRun.executePar(in, { t =>
      val n = live.incrementAndGet()
      peak.getAndUpdate(p => math.max(p, n))
      Thread.sleep(90 - 10 * t.drop(1).toInt)
      live.decrementAndGet()
      t.toUpperCase
    }, parallelism = 4)
    assert(out.map(_._1) == tables, "results must keep input order")
    assert(out.map(_._2) == tables.map(_.toUpperCase))
    assert(peak.get() > 1, "builds never overlapped")

    // control tables read the builds' results — the parallel phase
    // refuses them outright (the caller runs them after)
    intercept[IllegalArgumentException](RefreshRun.executePar(
      in.copy(tables = Seq("t1", RefreshRun.ControlTail.head)), identity[String] _))

    // a failing build propagates after the pool drains — no partial
    // silent success
    val boom = intercept[IllegalStateException](RefreshRun.executePar(in, { t =>
      if (t == "t5") throw new IllegalStateException("build t5 failed") else t
    }, parallelism = 3))
    assert(boom.getMessage.contains("t5"))
  }

  test("executePar fails fast: builds queued behind a failure never run (round-16 advice)") {
    // parallelism=1 makes ordering deterministic: t1 fails and flips
    // the shared flag BEFORE t2..t8 dequeue, so none of them may
    // execute its build (previously shutdown() still ran every queued
    // task — background writes continued after the caller saw the
    // exception)
    val tables = (1 to 8).map(i => s"t$i")
    val in = RefreshRun.RefreshInputs("weekly", "incremental", tables,
      "dail", "34", "2026-07-08", "2026-08-12", 100, 10)
    val ranAfterFailure = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    intercept[IllegalStateException](RefreshRun.executePar(in, { t =>
      if (t == "t1") throw new IllegalStateException("build t1 failed")
      ranAfterFailure.add(t); t
    }, parallelism = 1))
    // the cancelled stubs are trivial — give any straggler time to
    // surface before asserting none of the queued builds executed
    Thread.sleep(300)
    assert(ranAfterFailure.isEmpty,
      s"builds ran after the failure: ${ranAfterFailure.toArray.toSeq}")
  }
}
