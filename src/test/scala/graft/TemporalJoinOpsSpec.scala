package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoinOps

/** As-of and point-in-interval joins: exact equivalence with brute-force
  * formulations on fixtures that exercise ties, tolerance, unmatched
  * rows, inclusive boundaries, and overlapping intervals — plus plan
  * shape (the bucketed range join must not degrade to a nested loop).
  */
class TemporalJoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // right: per-key state changes; includes a duplicate timestamp on k=a
  private lazy val right = Seq(
    ("a", ts("2024-01-01 10:00:00"), 1L, "r1", 10.0),
    ("a", ts("2024-01-01 12:00:00"), 2L, "r2", 20.0),
    ("a", ts("2024-01-01 12:00:00"), 3L, "r3", 30.0), // tie on (key, time)
    ("b", ts("2024-01-01 11:00:00"), 4L, "r4", 40.0)
  ).toDF("k", "t", "rid", "label", "v")

  private lazy val left = Seq(
    ("a", ts("2024-01-01 09:00:00"), 100L), // before any right row → null
    ("a", ts("2024-01-01 10:30:00"), 101L), // matches r1
    ("a", ts("2024-01-01 12:00:00"), 102L), // equal time → inclusive, tie → max rid (r3)
    ("a", ts("2024-01-01 23:00:00"), 103L), // matches r3 (latest)
    ("b", ts("2024-01-01 11:00:01"), 104L), // matches r4
    ("c", ts("2024-01-01 11:00:00"), 105L)  // key with no right rows
  ).toDF("k", "t", "lid")

  test("backward as-of join: inclusive match, tie-break to max rid, unmatched null") {
    val out = TemporalJoinOps.asOfJoin(left, right, Seq("k"),
        "t", "t", Seq("label", "v"), tieBreak = Some("rid"))
      .orderBy("lid")
      .select("lid", "asof_label", "asof_v")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), Option(r.get(2))))
    assert(out.toSeq == Seq(
      (100L, None, None),
      (101L, Some("r1"), Some(10.0)),
      (102L, Some("r3"), Some(30.0)),
      (103L, Some("r3"), Some(30.0)),
      (104L, Some("r4"), Some(40.0)),
      (105L, None, None)))
  }

  test("as-of tolerance nulls out stale matches but keeps the row") {
    // 1 hour tolerance: lid=103 is 11h after r3 → discarded; lid=101 is
    // 30min after r1 → kept
    val out = TemporalJoinOps.asOfJoin(left, right, Seq("k"),
        "t", "t", Seq("label", "v"), tieBreak = Some("rid"),
        toleranceUs = Some(3600L * 1000000L))
      .orderBy("lid")
      .select("lid", "asof_label")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(out.toSeq == Seq(
      (100L, None), (101L, Some("r1")), (102L, Some("r3")),
      (103L, None), (104L, Some("r4")), (105L, None)))
    assert(out.length == left.count())
  }

  test("forward as-of join picks the earliest following row") {
    val out = TemporalJoinOps.asOfJoin(left, right, Seq("k"),
        "t", "t", Seq("label"), tieBreak = Some("rid"), direction = "forward")
      .orderBy("lid")
      .select("lid", "asof_label")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(out.toSeq == Seq(
      (100L, Some("r1")), // earliest following is r1 at 10:00
      (101L, Some("r3")), // next is the 12:00 tie → max rid wins
      (102L, Some("r3")), // equal time is inclusive
      (103L, None),       // nothing after 23:00
      (104L, None),       // r4 is 1s before, nothing after
      (105L, None)))
  }

  test("as-of join plans as one shuffle, no join operator") {
    val q = TemporalJoinOps.asOfJoin(left, right, Seq("k"),
      "t", "t", Seq("label", "v"), tieBreak = Some("rid"))
    q.collect()
    // the AQE string repeats the plan under "== Initial Plan ==" — audit
    // only the final section
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Join"), s"join appeared:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles:\n$plan")
  }

  test("as-of join equals a brute-force max-subquery on random data") {
    val r = new scala.util.Random(7)
    val rightBig = (1 to 400).map(i =>
      (s"k${r.nextInt(12)}", ts(f"2024-01-01 ${r.nextInt(24)}%02d:${r.nextInt(60)}%02d:00"), i.toLong, r.nextDouble()))
      .toDF("k", "t", "rid", "v")
    val leftBig = (1 to 300).map(i =>
      (s"k${r.nextInt(14)}", ts(f"2024-01-01 ${r.nextInt(24)}%02d:${r.nextInt(60)}%02d:${r.nextInt(60)}%02d"), i.toLong))
      .toDF("k", "t", "lid")
    val fast = TemporalJoinOps.asOfJoin(leftBig, rightBig, Seq("k"),
        "t", "t", Seq("v"), tieBreak = Some("rid"))
      .select("lid", "asof_t", "asof_v")
    // brute force: all candidate pairs, keep max (t, rid) per left row
    leftBig.createOrReplaceTempView("lb")
    rightBig.createOrReplaceTempView("rb")
    val brute = spark.sql(
      """SELECT l.lid, m.t AS asof_t, m.v AS asof_v
        |FROM lb l LEFT JOIN (
        |  SELECT l.lid AS mlid, r.t, r.rid, r.v,
        |    ROW_NUMBER() OVER (PARTITION BY l.lid ORDER BY r.t DESC, r.rid DESC) AS rn
        |  FROM lb l JOIN rb r ON l.k = r.k AND r.t <= l.t) m
        |ON l.lid = m.mlid AND m.rn = 1""".stripMargin)
    assert(fast.exceptAll(brute).count() == 0 && brute.exceptAll(fast).count() == 0)
  }

  private lazy val intervals = Seq(
    (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
    (2L, ts("2024-01-01 10:30:00"), ts("2024-01-01 12:30:00")), // overlaps 1 and 3
    (3L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:10:00")), // sub-bucket span
    (4L, ts("2024-01-02 00:00:00"), ts("2024-01-02 08:00:00"))  // many buckets
  ).toDF("iid", "s", "e")

  private lazy val points = Seq(
    (10L, ts("2024-01-01 10:00:00")), // exactly at interval-1 start (inclusive)
    (11L, ts("2024-01-01 11:00:00")), // at 1's end and inside 2
    (12L, ts("2024-01-01 12:05:00")), // inside 2 and 3
    (13L, ts("2024-01-01 13:00:00")), // matches nothing
    (14L, ts("2024-01-02 07:59:59"))  // deep in the long interval
  ).toDF("pid", "pt")

  test("point-in-interval join equals the naive range join, boundaries inclusive") {
    val fast = TemporalJoinOps.pointInIntervalJoin(points, intervals,
        "pt", "s", "e", bucketSeconds = 900)
      .select("pid", "iid")
    val naive = points.join(intervals, col("pt") >= col("s") && col("pt") <= col("e"))
      .select("pid", "iid")
    assert(fast.exceptAll(naive).count() == 0 && naive.exceptAll(fast).count() == 0)
    val pairs = fast.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 1L), (11L, 1L), (11L, 2L), (12L, 2L), (12L, 3L), (14L, 4L)))
  }

  test("bucketed range join plans as an equi join, not a nested loop") {
    val plan = TemporalJoinOps.pointInIntervalJoin(points, intervals,
        "pt", "s", "e", bucketSeconds = 900)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    // the naive formulation without an equi key does nested-loop
    val naivePlan = points.join(intervals, col("pt") >= col("s") && col("pt") <= col("e"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") || naivePlan.contains("CartesianProduct"))
  }

  test("range join rejects colliding column names") {
    intercept[IllegalArgumentException] {
      TemporalJoinOps.pointInIntervalJoin(
        points.withColumnRenamed("pt", "s"), intervals, "s", "s", "e", 900)
    }
  }
}
