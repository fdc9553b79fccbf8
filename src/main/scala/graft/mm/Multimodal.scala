package graft.mm

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.5 #67).
  *
  * Media (image/audio/video) are opaque `binary` payloads + a typed
  * metadata struct; decode/feature-extraction runs batched inside
  * `mapPartitions` so a real codec would amortize per-batch setup (model
  * load, JNI init) across a partition — the Spark-side shape (schema,
  * partitioning, batch iteration) is real; only the codec itself is a
  * deterministic stub (this container ships no media libraries).
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
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    val out = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    packed.select("doc_id", "payload").as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        // per-partition codec setup would go here (once per ~128MB batch)
        it.map { case (id, bytes) => (id, decodeStub(bytes)) }
      }(out)
      .toDF("doc_id", "n_bytes")
  }

  /** Deterministic stand-in for a media decoder: byte length (a real
    * decoder returns width/height/duration/frames). */
  private def decodeStub(payload: Array[Byte]): Long = payload.length.toLong
}
