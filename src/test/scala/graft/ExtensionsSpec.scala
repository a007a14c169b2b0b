package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GraftExtensions / RewriteMultiDistinctCounts: the injected optimizer
  * rule must remove the Expand from multi-COUNT(DISTINCT) aggregates
  * (rewriting to joined single-distinct legs) while producing exactly
  * the results Spark's native Expand plan produces — including null
  * group keys, null counted values, global aggregates, and the
  * conservative fallbacks where the rule must NOT fire.
  *
  * The shared spec session is built with spark.sql.extensions set
  * (Tables.sessionConfs), same as Verify/Bench — so every other suite
  * and all 59 oracle queries also run under the rule.
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Some("g1"), Some("a1"), Some("b1"), 1.0),
    (Some("g1"), Some("a1"), Some("b2"), 2.0),
    (Some("g1"), Some("a2"), None, 3.0),
    (Some("g2"), None, Some("b1"), 4.0),
    (Some("g2"), Some("a3"), Some("b1"), 5.0),
    (None, Some("a1"), Some("b3"), 6.0),
    (None, Some("a1"), Some("b3"), 7.0)
  ).toDF("k", "a", "b", "v")

  private def physical(q: DataFrame): String = {
    q.collect() // AQE finalizes the plan only after execution
    q.queryExecution.executedPlan.toString
  }

  test("two COUNT(DISTINCT) plan: no Expand, results match hand-computed truth") {
    val q = df.groupBy("k").agg(
      countDistinct(col("a")).as("nd_a"),
      countDistinct(col("b")).as("nd_b"),
      count(lit(1)).as("n"),
      sum(col("v")).as("t"))
    val plan = physical(q)
    assert(!plan.contains("Expand"), s"Expand survived:\n$plan")
    val got = q.orderBy(asc_nulls_first("k")).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // COUNT(DISTINCT) skips nulls; null group key is its own group
    assert(got.toSeq == Seq(
      (None, 1L, 1L, 2L, 13.0),
      (Some("g1"), 2L, 2L, 3L, 6.0),
      (Some("g2"), 1L, 1L, 2L, 9.0)))
  }

  test("distinct-only aggregate (no plain aggs) and three distinct groups") {
    val q = df.groupBy("k").agg(
      countDistinct(col("a")).as("nd_a"),
      countDistinct(col("b")).as("nd_b"),
      countDistinct(col("a"), col("b")).as("nd_ab"))
    val plan = physical(q)
    assert(!plan.contains("Expand"), s"Expand survived:\n$plan")
    val got = q.orderBy(asc_nulls_first("k")).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3)))
    // COUNT(DISTINCT a,b) skips rows where ANY argument is null
    assert(got.toSeq == Seq(
      (None, 1L, 1L, 1L),
      (Some("g1"), 2L, 2L, 2L),
      (Some("g2"), 1L, 1L, 1L)))
  }

  test("global multi-distinct (no grouping) cross-joins single-row legs") {
    val q = df.agg(
      countDistinct(col("a")).as("nd_a"),
      countDistinct(col("b")).as("nd_b"))
    val plan = physical(q)
    assert(!plan.contains("Expand"), s"Expand survived:\n$plan")
    val Array(row) = q.collect()
    assert((row.getLong(0), row.getLong(1)) == (3L, 3L))
  }

  test("rule leaves non-Count distinct aggregates to Spark (still correct)") {
    val q = df.groupBy("k").agg(
      sum_distinct(col("v")).as("sd"),
      countDistinct(col("a")).as("nd_a"))
    // not all distinct aggs are Counts → no rewrite claim; correctness only
    val got = q.orderBy(asc_nulls_first("k")).collect()
      .map(r => (Option(r.getString(0)), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (None, 13.0, 1L), (Some("g1"), 6.0, 2L), (Some("g2"), 9.0, 1L)))
  }

  test("single distinct group is left alone (native plan has no Expand anyway)") {
    val q = df.groupBy("k").agg(countDistinct(col("a")).as("nd_a"), count(lit(1)).as("n"))
    val plan = physical(q)
    assert(!plan.contains("Expand"))
    val got = q.orderBy(asc_nulls_first("k")).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((None, 1L, 2L), (Some("g1"), 2L, 3L), (Some("g2"), 1L, 2L)))
  }

  test("counting a grouping attribute itself stays correct") {
    val q = df.groupBy("k").agg(
      countDistinct(col("k")).as("nd_k"),
      countDistinct(col("a")).as("nd_a"))
    val got = q.orderBy(asc_nulls_first("k")).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((None, 0L, 1L), (Some("g1"), 1L, 2L), (Some("g2"), 1L, 1L)))
  }

  test("downstream operators over the rewritten aggregate resolve (ExprId stability)") {
    val q = df.groupBy("k").agg(
        countDistinct(col("a")).as("nd_a"),
        countDistinct(col("b")).as("nd_b"))
      .filter(col("nd_a") >= 1)
      .withColumn("both", col("nd_a") + col("nd_b"))
      .join(Seq(("g1", "x")).toDF("k", "tag"), Seq("k"), "left")
    val got = q.orderBy(asc_nulls_first("k"))
      .select("k", "both", "tag").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), Option(r.getString(2))))
    assert(got.toSeq == Seq(
      (None, 2L, None), (Some("g1"), 4L, Some("x")), (Some("g2"), 2L, None)))
  }

  test("normalize_name is injected as a session built-in") {
    val got = spark.sql("SELECT normalize_name('  JosÉ   Ó  Briain ') AS n")
      .collect().head.getString(0)
    assert(got == graft.functions.Udfs.normalizeNameFn("  JosÉ   Ó  Briain "))
  }

  test("expression-valued distinct children (not just attributes) rewrite correctly") {
    val q = df.groupBy("k").agg(
      countDistinct(upper(col("a"))).as("nd_ua"),
      countDistinct(length(col("b"))).as("nd_lb"))
    val plan = physical(q)
    assert(!plan.contains("Expand"), s"Expand survived:\n$plan")
    val got = q.orderBy(asc_nulls_first("k")).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((None, 1L, 1L), (Some("g1"), 2L, 1L), (Some("g2"), 1L, 1L)))
  }
}
