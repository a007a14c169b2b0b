package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog shim: logical table name → parquet path under a scale-factor
  * dir. At cluster scale this is where a real catalog (metastore / batch
  * pointer, SURVEY §2.1 S10) plugs in; locally it resolves the driver's
  * synthetic tables.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
