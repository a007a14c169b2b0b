package graft

import org.apache.spark.sql.functions._

import graft.io.ShardExport

/** Shard export: greedy packing bounds, JSONL round-trip, determinism. */
class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  private val capacity = 100L
  private lazy val docs = (1L to 200L)
    .map(i => (i, s"doc-$i", 10L + (i * 13) % 40))
    .toDF("doc_id", "text", "tokens")

  test("assignShards packs greedily: every bin full before its last doc") {
    val assigned = ShardExport.assignShards(docs, "tokens", "doc_id",
      numShards = 4, capacity = capacity)
    // the greedy invariant: total minus the LAST doc's tokens < capacity
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard", "bin").orderBy(col("doc_id").desc)
    val bad = assigned
      .withColumn("rn", row_number().over(w))
      .groupBy("shard", "bin")
      .agg(sum("tokens").as("total"),
        max(when(col("rn") === 1, col("tokens"))).as("last_tokens"))
      .filter(col("total") - col("last_tokens") >= capacity)
    assert(bad.count() == 0)
    // bins are consecutive from 0 within each shard
    val gaps = assigned.groupBy("shard")
      .agg(min("bin").as("lo"), max("bin").as("hi"), countDistinct("bin").as("n"))
      .filter(col("lo") =!= 0 || col("n") =!= col("hi") + 1)
    assert(gaps.count() == 0)
  }

  test("oversized docs do not leave bin-index gaps") {
    // doc 4 (shard 0) carries 5x capacity: the raw floor(offset/capacity)
    // would jump from bin 0 to bin 5; dense renumbering keeps bins
    // consecutive (0, 1, 2, ...)
    val spiky = Seq((4L, 30L), (8L, 500L), (12L, 30L), (16L, 60L), (20L, 30L))
      .toDF("doc_id", "tokens")
    val assigned = ShardExport.assignShards(spiky, "tokens", "doc_id",
        numShards = 4, capacity = capacity)
      .orderBy("doc_id").select("doc_id", "bin")
      .as[(Long, Long)].collect().toSeq
    assert(assigned == Seq((4L, 0L), (8L, 0L), (12L, 1L), (16L, 1L), (20L, 2L)))
  }

  test("writeJsonlShards round-trips content through the partitioned tree") {
    val dir = java.nio.file.Files.createTempDirectory("shard-export").toString
    val assigned = ShardExport.assignShards(docs, "tokens", "doc_id",
      numShards = 4, capacity = capacity)
    ShardExport.writeJsonlShards(assigned, dir)

    val back = spark.read.text(dir)
      .select(from_json(col("value"),
        org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING, tokens LONG")).as("r"))
      .select("r.*")
    assert(back.count() == 200)
    assert(back.join(docs, Seq("doc_id", "text", "tokens")).count() == 200)

    // partition dirs exist per (shard, bin) and re-running is stable
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("shard=")))
    val again = ShardExport.assignShards(docs, "tokens", "doc_id", 4, capacity)
      .select("doc_id", "shard", "bin").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val first = assigned.select("doc_id", "shard", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(again.toSeq == first.toSeq)
  }
}
