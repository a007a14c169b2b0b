package graft

import org.apache.spark.sql.functions._

import graft.operators.{MultimodalOps, SimilarityOps}

/** Multimodal plumbing: decode → metadata, frame sampling, resize, and
  * feature extraction feeding the ANN operators. Codecs are deterministic
  * stubs (no media libraries in this environment); the Spark-side shapes —
  * mapPartitions batching, schemas, explode fan-out, Array[Float]
  * embedding columns — are the real surface under test.
  */
class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "abcdef".getBytes("UTF-8")),
    (2L, "a somewhat longer payload 123".getBytes("UTF-8")),
    (3L, Array.empty[Byte])).toDF("media_id", "payload")

  test("decode emits one typed metadata row per payload") {
    val rows = MultimodalOps.decodeMetadata(media, "media_id", "payload")
      .collect().sortBy(_.media_id)
    assert(rows.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(rows.forall(r => r.width >= 64 && r.height >= 64 && r.n_frames >= 1))
    assert(rows(0).n_bytes == 6 && rows(1).n_bytes == 29 && rows(2).n_bytes == 0)
    // deterministic: same payload → same metadata
    val again = MultimodalOps.decodeMetadata(media, "media_id", "payload")
      .collect().sortBy(_.media_id)
    assert(rows.toSeq == again.toSeq)
  }

  test("frame sampling fans out every k-th frame with ceil(n/k) rows") {
    val meta = MultimodalOps.decodeMetadata(media, "media_id", "payload")
      .collect().map(m => m.media_id -> m.n_frames).toMap
    val frames = MultimodalOps.sampleFrames(media, "media_id", "payload", everyK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    meta.foreach { case (id, n) =>
      val expected = (0L until n by 3L).toSeq
      assert(frames.filter(_._1 == id).map(_._2).sorted.toSeq == expected, s"media $id")
    }
  }

  test("resize emits the target byte budget per payload") {
    val out = MultimodalOps.resize(media, "media_id", "payload", 8, 4)
      .collect().sortBy(_.media_id)
    assert(out.forall(r => r.payload.length == 32 && r.width == 8 && r.height == 4))
    // stub scaler repeats source bytes; empty payload → zeroed buffer
    assert(out(0).payload.take(6).toSeq == "abcdef".getBytes("UTF-8").toSeq)
    assert(out(2).payload.forall(_ == 0))
  }

  test("feature extraction composes with ANN: embeddings feed multiProbeTopK") {
    val corpus = (1L to 40L).map(i =>
      (i, s"document payload number $i with shared prefix".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val emb = MultimodalOps.featureExtract(corpus, "media_id", "payload", dim = 16).toDF()
    assert(emb.count() == 40)
    assert(emb.select(size(col("embedding"))).distinct().collect().map(_.getInt(0)).toSeq == Seq(16))
    val topk = SimilarityOps.multiProbeTopK(emb, "media_id", "embedding",
      numPlanes = 4, dim = 16, probes = 4, k = 3)
    val rows = topk.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) <= 3))
  }
}
