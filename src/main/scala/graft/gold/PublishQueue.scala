package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Review-gated publish queue (reference
  * process/instagram_build_publish_queue.py:17-100): rows pass to the
  * queue only when publish_ready is truthy AND review_status is in the
  * approved set AND safety_notes is empty; everything else lands in the
  * blocked table with a "; "-joined reasons string in the reference's
  * wording and order. Publishing itself stays a separate explicit step.
  */
object PublishQueue {

  val ApprovedStatuses: Seq[String] =
    Seq("approved", "ready", "ready_to_publish", "publish_ready")

  private val itemColumns = Seq("slug", "full_name", "output_file_rel",
    "caption_file", "alt_text_file", "caption", "alt_text", "hashtags",
    "publish_ready", "review_status", "safety_notes")

  private def clean(c: Column, default: String = ""): Column = {
    val t = trim(coalesce(c.cast("string"), lit("")))
    when(t === "", lit(default)).otherwise(t)
  }

  private def isYes(c: Column): Column =
    lower(clean(c)).isin("yes", "y", "true", "1")

  private def isApproved(c: Column): Column =
    lower(clean(c)).isin(ApprovedStatuses: _*)

  /** Split the copy-pack table into (queue, blocked). Missing input
    * columns read as blank (the reference's row.get semantics), and
    * defaults mirror it: publish_ready → "no", review_status →
    * "needs_review".
    */
  def buildPublishQueue(copy: DataFrame): (DataFrame, DataFrame) = {
    val have = copy.columns.toSet
    def in(name: String): Column =
      if (have(name)) col(name) else lit(null).cast("string")
    val items = copy.select(itemColumns.map {
      case "publish_ready" => clean(in("publish_ready"), "no").as("publish_ready")
      case "review_status" => clean(in("review_status"), "needs_review").as("review_status")
      case n => clean(in(n)).as(n)
    }: _*)
      .withColumn("_ready", isYes(col("publish_ready")))
      .withColumn("_approved", isApproved(col("review_status")))
      .withColumn("_blocking_notes", col("safety_notes") =!= "")
    val queue = items.filter(col("_ready") && col("_approved") && !col("_blocking_notes"))
      .drop("_ready", "_approved", "_blocking_notes")
    val blocked = items.filter(!(col("_ready") && col("_approved") && !col("_blocking_notes")))
      .withColumn("blocked_reasons", array_join(filter(array(
        when(!col("_ready"), lit("publish_ready is not yes")),
        when(!col("_approved"), lit("review_status is not approved/ready")),
        when(col("_blocking_notes"), lit("safety_notes is not empty"))),
        r => r.isNotNull), "; "))
      .drop("_ready", "_approved", "_blocking_notes")
    (queue, blocked)
  }

  /** The run manifest (build_publish_queue's return payload), as a
    * stable-JSON string via the engine's manifest conventions.
    */
  def manifest(queuedCount: Long, blockedCount: Long, copyCsv: String,
               queueDir: String, now: String): String =
    graft.io.StableJson.write(Map(
      "success" -> true,
      "created_at" -> now,
      "copy_csv" -> copyCsv,
      "queue_dir" -> queueDir,
      "publish_queue_csv" -> s"$queueDir/publish_queue.csv",
      "blocked_items_csv" -> s"$queueDir/blocked_items.csv",
      "queued_count" -> queuedCount,
      "blocked_count" -> blockedCount,
      "gate_rules" -> Map(
        "publish_ready" -> "must equal yes/true/1",
        "review_status" -> ApprovedStatuses.sorted,
        "safety_notes" -> "must be empty"),
      // fixed advisory notes the reference embeds in every manifest
      // (instagram_build_publish_queue.py:92-96)
      "notes" -> Seq(
        "This creates a queue file only; it does not publish posts.",
        "Fixture runs should normally produce an empty publish queue because generated review tables default to needs_review and publish_ready=no.",
        "Publishing must remain a separate explicit step after manual review.")))
}
