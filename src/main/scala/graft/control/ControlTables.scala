package graft.control

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Control-layer tables (SURVEY §1, reference tables.yml:210-232 +
  * table_control_*.py): run audit log, per-table manifest pointers, and
  * DQ result records — small append-mostly frames assembled from build
  * results, with the reference's append + pk-dedupe write policy.
  */
object ControlTables {

  final case class RunRecord(
      run_id: String, workflow_run_id: String, table_name: String,
      mode: String, cadence: String, started_at_utc: String,
      finished_at_utc: String, status: String, input_params_json: String,
      raw_rows: String, output_rows: String, error_message: String,
      manifest_s3_key: String)

  final case class ManifestRecord(
      table_name: String, latest_run_id: String, latest_snapshot_date: String,
      latest_parquet_key: String, latest_csv_key: String, row_count: String,
      column_count: String, schema_hash: String, primary_key_unique: String,
      dq_status: String, updated_at_utc: String)

  final case class DqRecord(
      dq_result_id: String, run_id: String, table_name: String,
      check_name: String, status: String, metric_value: String,
      threshold: String, message: String, created_at_utc: String)

  def pipelineRuns(spark: SparkSession, records: Seq[RunRecord]): DataFrame = {
    import spark.implicits._
    records.toDF()
  }

  def tableManifests(spark: SparkSession, records: Seq[ManifestRecord]): DataFrame = {
    import spark.implicits._
    records.toDF()
  }

  /** DQ results from check tuples; dq_result_id is the reference's stable
    * hash of (run, table, check).
    */
  def dqResults(spark: SparkSession, runId: String, tableName: String,
                checks: Seq[(String, Boolean, String)], now: String): DataFrame = {
    import spark.implicits._
    checks.map { case (name, passed, detail) =>
      DqRecord(
        dq_result_id = graft.sources.XmlDebateWalker.stableHash(Seq(runId, tableName, name), 16),
        run_id = runId, table_name = tableName, check_name = name,
        status = if (passed) "pass" else "fail",
        metric_value = detail, threshold = "", message = "",
        created_at_utc = now)
    }.toDF()
  }

  /** Actual row counts of a table's merged candidate CSV/Parquet pair —
    * both objects must agree or the reconciliation fails
    * (table_control_table_manifests.py:181-199).
    */
  def actualCandidateCounts(spark: SparkSession, csvPath: String,
                            parquetPath: String): Map[String, Long] = {
    // multiLine + escape: Spark's CSV writer quotes embedded newlines
    // (speech_text), and the default line-split reader would over-count;
    // the reference's pandas read_csv handles quoted newlines natively
    val csvRows = spark.read.option("header", "true")
      .option("multiLine", "true").option("escape", "\"").csv(csvPath).count()
    val parquetRows = spark.read.parquet(parquetPath).count()
    if (csvRows != parquetRows)
      throw new IllegalStateException(
        s"CSV/Parquet row mismatch: csv=$csvRows parquet=$parquetRows")
    Map("row_count" -> csvRows, "csv_rows" -> csvRows, "parquet_rows" -> parquetRows)
  }

  /** Replace manifest output counts with actual candidate object counts
    * (table_control_table_manifests.py:154-178). The control-manifest
    * table cannot read its own candidate object before it exists — its
    * row count is one row per table in the batch; every other table is
    * read from its merged CSV/Parquet pair, with per-table errors
    * collected rather than aborting the sweep.
    */
  def populateActualCandidateRowCounts(
      rows: Seq[ManifestRecord],
      counts: (String, String) => Map[String, Long]): (Seq[ManifestRecord], Seq[String]) = {
    val selfRowCount = rows.size
    val errors = Seq.newBuilder[String]
    val updated = rows.map { row =>
      if (row.table_name == "control_table_manifests")
        row.copy(row_count = selfRowCount.toString)
      else
        try row.copy(row_count =
          counts(row.latest_csv_key, row.latest_parquet_key)("row_count").toString)
        catch {
          case e: Exception =>
            errors += s"${row.table_name}: candidate row count: ${e.getClass.getSimpleName}: ${e.getMessage}"
            row
        }
    }
    (updated, errors.result())
  }

  /** Schema hash for manifest records: stable hash of the column list. */
  def schemaHash(columns: Seq[String]): String =
    graft.sources.XmlDebateWalker.stableHash(columns, 16)
}
