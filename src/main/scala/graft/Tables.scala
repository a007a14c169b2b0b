package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Catalog shim: logical table name → parquet path under a scale-factor
  * dir. At cluster scale this is where a real catalog (metastore / batch
  * pointer, SURVEY §2.1 S10) plugs in; locally it resolves the driver's
  * synthetic tables.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts has shipped as two physical types across driver testdata
    // generations: parquet TIMESTAMP(NANOS) — which Spark reads only as a
    // nanos long (spark.sql.legacy.parquet.nanosAsLong=true, set by our
    // session builders) — and plain timestamp[us], which Spark reads as
    // TIMESTAMP_NTZ. Normalize both to a session-TZ (UTC) timestamp, the
    // same value DuckDB sees casting either to TIMESTAMP.
    if (name == "events")
      df.schema("ts").dataType match {
        case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    else df
  }

  /** Session configs every graft entry point needs for reference parity:
    * non-ANSI casts (bad values coerce to null like the reference's
    * errors="coerce"), UTC, nanos-parquet tolerance.
    */
  val sessionConfs: Map[String, String] = Map(
    "spark.sql.ansi.enabled" -> "false",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    // engine Catalyst extensions (multi-distinct Expand elimination);
    // every entry point and spec session runs with them active
    "spark.sql.extensions" -> "graft.plans.GraftExtensions")
}
