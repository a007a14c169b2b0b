package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by the per-theme objects under graft.queries.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.MergeSemantics.queries ++
      graft.queries.Scalar.queries ++
      graft.queries.LlmPipeline.queries ++
      graft.queries.Streaming.queries ++
      graft.queries.Advanced.queries ++
      graft.queries.SilverFlatten.queries ++
      graft.queries.Temporal.queries ++
      graft.queries.Analytic.queries ++
      graft.queries.GoldActivity.queries ++
      graft.queries.Parity.queries ++
      graft.queries.IoParity.queries ++
      graft.queries.Retrieval.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.MergeSemantics.oracles ++
      graft.queries.Scalar.oracles ++
      graft.queries.LlmPipeline.oracles ++
      graft.queries.Streaming.oracles ++
      graft.queries.Advanced.oracles ++
      graft.queries.SilverFlatten.oracles ++
      graft.queries.Temporal.oracles ++
      graft.queries.Analytic.oracles ++
      graft.queries.GoldActivity.oracles ++
      graft.queries.Parity.oracles ++
      graft.queries.IoParity.oracles ++
      graft.queries.Retrieval.oracles
}
