package graft

import org.apache.spark.sql.functions._

import graft.gold.PublishQueue
import graft.io.TableIO

/** Review-gated publish queue (ports the gate rules of
  * process/instagram_build_publish_queue.py) and the column-drop
  * schema-evolution utility (process/delete_s3_column.py).
  */
class PublishQueueSpec extends SparkSpec {
  import spark.implicits._

  private def copyPack = Seq(
    // slug, publish_ready, review_status, safety_notes
    ("ok-1", "yes", "approved", ""),
    ("ok-2", "TRUE", "ready_to_publish", "  "),      // truthy casing + blank notes
    ("not-ready", "no", "approved", ""),
    ("not-approved", "yes", "needs_review", ""),
    ("blocked-notes", "yes", "approved", "check quote"),
    ("all-wrong", "", "", "flagged"))
    .toDF("slug", "publish_ready", "review_status", "safety_notes")
    .withColumn("full_name", concat(lit("Name "), col("slug")))
    .withColumn("caption", lit("caption text"))

  test("queue admits only ready+approved+clean rows; blocked carries reasons") {
    val (queue, blocked) = PublishQueue.buildPublishQueue(copyPack)
    assert(queue.select("slug").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("ok-1", "ok-2"))
    val reasons = blocked.select("slug", "blocked_reasons").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(reasons("not-ready") == "publish_ready is not yes")
    assert(reasons("not-approved") == "review_status is not approved/ready")
    assert(reasons("blocked-notes") == "safety_notes is not empty")
    // reasons compose in the reference's order
    assert(reasons("all-wrong") ==
      "publish_ready is not yes; review_status is not approved/ready; safety_notes is not empty")
    // defaults mirror row.get semantics
    val defaults = blocked.filter(col("slug") === "all-wrong").collect().head
    assert(defaults.getAs[String]("publish_ready") == "no")
    assert(defaults.getAs[String]("review_status") == "needs_review")
  }

  test("missing input columns read as blank, fixture runs queue nothing") {
    // generated review tables default to needs_review/publish_ready=no →
    // an un-reviewed fixture produces an EMPTY queue (reference note)
    val bare = Seq("a", "b").toDF("slug")
    val (queue, blocked) = PublishQueue.buildPublishQueue(bare)
    assert(queue.count() == 0)
    assert(blocked.count() == 2)
  }

  test("manifest carries counts and gate rules as stable json") {
    val m = PublishQueue.manifest(2, 4, "copy/captions.csv", "queue", "2026-01-01T00:00:00+00:00")
    assert(m.contains("\"queued_count\":2") && m.contains("\"blocked_count\":4"))
    assert(m.contains("\"review_status\":[\"approved\",\"publish_ready\",\"ready\",\"ready_to_publish\"]"))
    // the reference's three fixed advisory notes
    // (instagram_build_publish_queue.py:92-96)
    assert(m.contains("\"notes\":[\"This creates a queue file only; it does not publish posts.\""))
    assert(m.contains("Publishing must remain a separate explicit step after manual review."))
  }

  test("dropColumn rewrites both objects; strict fails when absent") {
    val dir = java.nio.file.Files.createTempDirectory("dropcol").toString
    val df = Seq(("1", "keep", "drop-me"), ("2", "keep2", "x")).toDF("id", "a", "legacy")
    TableIO.writeCsv(df, s"$dir/t.csv")
    TableIO.writeParquet(df, s"$dir/t.parquet")

    val (c1, p1) = TableIO.dropColumn(spark, s"$dir/t.csv", s"$dir/t.parquet", "legacy")
    assert(c1 && p1)
    val csvCols = spark.read.option("header", "true").csv(s"$dir/t.csv").columns.toSeq
    val pqCols = spark.read.parquet(s"$dir/t.parquet").columns.toSeq
    assert(csvCols == Seq("id", "a") && pqCols == Seq("id", "a"))
    assert(spark.read.parquet(s"$dir/t.parquet").count() == 2)

    // second drop: column gone → no-op flags; strict → failure naming both
    val (c2, p2) = TableIO.dropColumn(spark, s"$dir/t.csv", s"$dir/t.parquet", "legacy")
    assert(!c2 && !p2)
    val e = intercept[IllegalStateException] {
      TableIO.dropColumn(spark, s"$dir/t.csv", s"$dir/t.parquet", "legacy", strict = true)
    }
    assert(e.getMessage.contains("CSV") && e.getMessage.contains("PARQUET"))
  }
}
