package graft.mm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.5 #67).
  *
  * Media (image/audio/video) are opaque `binary` payloads + a typed
  * metadata struct; decode/feature-extraction runs batched inside
  * `mapPartitions` so a real codec would amortize per-batch setup (model
  * load, JNI init) across a partition — the Spark-side shape (schema,
  * partitioning, batch iteration, output schema) is real; only the codec
  * itself is a deterministic stub (this container ships no media
  * libraries).
  *
  * At 100 TB: payloads stay columnar binary (parquet keeps them
  * page-compressed, scans prune them unless selected), per-row work is
  * embarrassingly parallel, and frame sampling bounds output size.
  */
object Multimodal {

  /** Attach an opaque binary payload + metadata struct to documents —
    * stands in for (image_bytes, {mime,width,...}) columns. */
  def packBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(lit("text/plain").as("mime"), col("lang").as("lang"),
        col("source").as("source")).as("meta"))

  /** Batched "decode": per-partition iteration over raw payload bytes.
    * A real implementation would replace [[decodeStub]] with the codec
    * call; everything around it stays identical. */
  def describe(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec setup would go here (once per batch)
        it.map { case (id, bytes) => (id, decodeStub(bytes)) }
      }
      .toDF("doc_id", "n_bytes")
  }

  /** Feature extraction: payload → fixed-width float vector. The stub is
    * a deterministic byte-histogram projection — a real model replaces
    * [[featuresStub]]; the output schema (array<float>[dim]) is exactly
    * what the similarity layer (graft.sim) consumes. */
  def extractFeatures(packed: DataFrame, dim: Int = 16): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, featuresStub(bytes, dim))
      })
      .toDF("doc_id", "embedding")
  }

  /** "Resize": transform the payload to a bounded-size representation
    * (for images this is the decoded-thumbnail path; the stub truncates
    * deterministically, preserving the binary-in/binary-out shape). */
  def resize(packed: DataFrame, maxBytes: Int): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, bytes.take(maxBytes)) })
      .toDF("doc_id", "payload")
  }

  /** Frame sampling: one payload → every `stride`-th fixed-size frame,
    * exploded to (doc_id, frame_no, frame) rows — the video path. */
  def sampleFrames(packed: DataFrame, frameBytes: Int,
                   stride: Int): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        bytes.grouped(frameBytes).zipWithIndex.collect {
          case (frame, i) if i % stride == 0 => (id, i.toLong, frame)
        }
      })
      .toDF("doc_id", "frame_no", "frame")
  }

  /** Deterministic stand-in for a media decoder: byte length (a real
    * decoder returns width/height/duration/frames). */
  private def decodeStub(payload: Array[Byte]): Long = payload.length.toLong

  /** Deterministic stand-in for an embedding model: normalized byte
    * histogram folded to `dim` buckets. */
  private def featuresStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      acc((payload(i) & 0xff) % dim) += 1f
      i += 1
    }
    val n = math.max(payload.length, 1).toFloat
    acc.map(_ / n)
  }
}
