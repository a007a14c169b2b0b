package graft

import graft.operators.DedupOps

/** Incremental ingestion dedup: exact-vs-corpus, exact-vs-batch,
  * near-dup-vs-corpus, near-dup-vs-earlier-new, kept — with the greedy
  * keep-first (smallest id) match attribution.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (10L, "the quick brown fox jumps over the lazy dog tonight"),
    (20L, "pack my box with five dozen liquor jugs right now"),
    (30L, "completely unrelated corpus document about spark engines")).toDF("doc_id", "text")

  private val newBatch = Seq(
    // exact dup of corpus 10 (case/space normalize)
    (100L, "  The QUICK brown fox jumps over the lazy dog tonight "),
    // near dup of corpus 20 (one word changed, 3-gram jaccard >= 0.5)
    (101L, "pack my box with five dozen liquor jugs right away"),
    // fresh
    (102L, "entirely new material never seen in the corpus before"),
    // exact dup of new 102
    (103L, "entirely new material never seen in the corpus before"),
    // near dup of new 102 (one word changed)
    (104L, "entirely new material never seen in the corpus today before"))
    .toDF("doc_id", "text")

  test("statuses and smallest-id match attribution") {
    val out = DedupOps.incrementalDedup(newBatch, corpus, "text", "doc_id")
      .orderBy("new_id").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(out.toSeq == Seq(
      (100L, "exact_dup", 10L),
      (101L, "near_dup", 20L),
      (102L, "kept", -1L),
      (103L, "exact_dup", 102L),
      (104L, "near_dup", 102L)))
  }

  test("prepared-index path (parquet round trip) matches the in-session wrapper") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_spec").toFile
    try {
      val idx0 = DedupOps.buildCorpusDedupIndex(corpus, "text", "doc_id")
      idx0.fingerprints.write.parquet(new java.io.File(dir, "fp").getPath)
      idx0.shingles.write.parquet(new java.io.File(dir, "sh").getPath)
      idx0.bands.write.parquet(new java.io.File(dir, "bd").getPath)
      val idx = DedupOps.CorpusDedupIndex(
        spark.read.parquet(new java.io.File(dir, "fp").getPath),
        spark.read.parquet(new java.io.File(dir, "sh").getPath),
        spark.read.parquet(new java.io.File(dir, "bd").getPath))
      val prepared = DedupOps.incrementalDedupPrepared(newBatch, idx, "text", "doc_id")
        .orderBy("new_id").collect()
        .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      assert(prepared.toSeq == Seq(
        (100L, "exact_dup", 10L),
        (101L, "near_dup", 20L),
        (102L, "kept", -1L),
        (103L, "exact_dup", 102L),
        (104L, "near_dup", 102L)))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("an empty new batch and an empty corpus are both fine") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(DedupOps.incrementalDedup(empty, corpus, "text", "doc_id").count() == 0)
    val out = DedupOps.incrementalDedup(newBatch, empty, "text", "doc_id")
      .orderBy("new_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // without a corpus, only the in-batch relations remain
    assert(out.toSeq == Seq(
      (100L, "kept"), (101L, "kept"), (102L, "kept"),
      (103L, "exact_dup"), (104L, "near_dup")))
  }
}
