package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark side — schema, partitioning, batch shape, the mapPartitions
  * pipeline — is real and tested. The codec itself is a clearly-marked
  * deterministic STUB (no image/audio libraries in this environment):
  * it derives metadata arithmetically from the payload bytes, standing in
  * for a libjpeg/ffmpeg call that would otherwise run per batch.
  */
object MultimodalOps {

  final case class MediaMeta(
      media_id: Long,
      format: String,
      width: Long,
      height: Long,
      n_frames: Long,
      n_bytes: Long)

  /** STUB decode: deterministic fake metadata from the byte payload.
    * Replace with a real codec (libjpeg-turbo / ffmpeg via JNI) in
    * production; signature and batching stay identical.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    MediaMeta(
      media_id = id,
      format = if (n % 2 == 0) "png" else "jpeg",
      width = 64 + (n % 448),
      height = 64 + ((n * 7) % 448),
      n_frames = 1 + (n % 16),
      n_bytes = n)
  }

  /** Decode a (id, payload) binary table into typed metadata via
    * mapPartitions — one decoder instance per partition (the real-codec
    * pattern: init once, stream the batch through it).
    */
  def decodeMetadata(media: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    implicit val enc = Encoders.product[MediaMeta]
    media.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        // real pattern: val codec = Codec.init() here, once per partition
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Frame-sampling plumbing: every k-th "frame" of a video payload as its
    * own row — the explode shape a real decoder feeds downstream (dedupe,
    * embedding, captioning). Frame payload is a STUB slice of the source
    * bytes.
    */
  def sampleFrames(media: DataFrame, idCol: String, binCol: String, everyK: Int): DataFrame = {
    val meta = decodeMetadata(media, idCol, binCol)
    meta.toDF()
      .withColumn("frame_idx", explode(sequence(lit(0L), col("n_frames") - 1, lit(everyK.toLong))))
      .select(col("media_id"), col("frame_idx"),
        col("width"), col("height"), col("format"))
  }

  final case class MediaEmbedding(media_id: Long, embedding: Array[Float])

  /** Feature-extraction plumbing: payload → fixed-dim Array[Float]
    * embedding, one encoder instance per partition — the column shape the
    * ANN operators (SimilarityOps) consume directly. The encoder is a
    * deterministic STUB (byte sampling) standing in for a vision/audio
    * model; batching, schema, and downstream composition are real.
    */
  def featureExtract(media: DataFrame, idCol: String, binCol: String,
                     dim: Int): Dataset[MediaEmbedding] = {
    implicit val enc = Encoders.product[MediaEmbedding]
    media.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        // real pattern: val model = Encoder.load() here, once per partition
        it.map { case (id, bytes) =>
          val n = bytes.length
          val v = Array.tabulate(dim) { i =>
            if (n == 0) 0f
            else ((bytes(((i * 31) + 7) % n) & 0xff) / 255.0f) - 0.5f
          }
          MediaEmbedding(id, v)
        }
      }
  }

  final case class ResizedMedia(media_id: Long, width: Long, height: Long,
                                payload: Array[Byte])

  /** Resize plumbing: payload → payload at target dimensions, scaler
    * initialized once per partition. STUB scaler truncates/repeats bytes to
    * the target byte budget; a real implementation swaps only the lambda
    * body (libvips/swscale call).
    */
  def resize(media: DataFrame, idCol: String, binCol: String,
             targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    implicit val enc = Encoders.product[ResizedMedia]
    val budget = targetW * targetH
    media.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val out = new Array[Byte](budget)
          if (bytes.nonEmpty) {
            var i = 0
            while (i < budget) { out(i) = bytes(i % bytes.length); i += 1 }
          }
          ResizedMedia(id, targetW.toLong, targetH.toLong, out)
        }
      }
  }
}
