package graft.mm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.5 #67) with a REAL image codec.
  *
  * Media are opaque `binary` payloads + a typed metadata struct;
  * decode/feature-extraction runs batched inside `mapPartitions` so codec
  * setup amortizes across a partition. The image path is real end-to-end:
  * payloads are genuine PNGs (encoded with `javax.imageio` — JDK-public,
  * zero external deps), and decode/features/thumbnail run the actual
  * PNG decoder on every row. Because PNG is lossless and the synthetic
  * pixel content is a closed-form function of doc_id, the decoded pixel
  * statistics are INDEPENDENTLY recomputable by the SQL oracle — the
  * encode→decode→stat path is hash-checked, not just shape-checked.
  *
  * At 100 TB: payloads stay columnar binary (parquet keeps them
  * page-compressed, scans prune them unless selected), per-row decode is
  * embarrassingly parallel behind a repartition, and thumbnail/frame
  * sampling bound output size. Video stays a byte-chunking shape
  * ([[sampleFrames]]) — the JDK ships no video codec.
  */
object Multimodal {

  /** Attach an opaque binary payload + metadata struct to documents —
    * the text-modality packing (bytes are the UTF-8 text itself). */
  def packBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(lit("text/plain").as("mime"), col("lang").as("lang"),
        col("source").as("source")).as("meta"))

  /** Byte-length metadata over any packed modality (no decode). */
  def describe(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, bytes.length.toLong) })
      .toDF("doc_id", "n_bytes")
  }

  // ---- image modality: real PNG encode/decode via javax.imageio ----

  /** Deterministic synthetic image dims/content seed for a doc_id: the
    * closed form the SQL oracle re-evaluates. Channel values are taken
    * mod 256, so any engine can recompute the exact pixel sums. */
  private[graft] def imgW(docId: Long): Int = 16 + (docId % 13).toInt
  private[graft] def imgH(docId: Long): Int = 16 + (docId % 11).toInt
  private[graft] def imgSeed(docId: Long): Int = (docId % 251).toInt
  private[graft] def pixel(d: Int, x: Int, y: Int): (Int, Int, Int) =
    ((x * 7 + y * 11 + d * 3) % 256,
     (x * 5 + y * 3 + d * 7) % 256,
     (x * 13 + y + d) % 256)

  /** Encode the synthetic image for one doc as a real PNG. */
  private[graft] def synthPng(docId: Long): Array[Byte] = {
    val (w, h, d) = (imgW(docId), imgH(docId), imgSeed(docId))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pixel(d, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** docs → (doc_id, payload: REAL PNG bytes, meta). Batched per
    * partition (ImageIO's file cache off — pure in-memory encode). */
  def packImage(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id").as[Long]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map(id => (id, synthPng(id)))
      }
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit("image/png").as("mime")).as("meta"))
  }

  private def decodeRgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val (w, h) = (img.getWidth, img.getHeight)
    (w, h, img.getRGB(0, 0, w, h, null, 0, w))
  }

  /** REAL decode: run the PNG decoder on every payload, return the
    * image metadata + exact per-channel pixel sums (integers — no
    * float drift between engines). */
  def decodeImage(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val (w, h, px) = decodeRgb(bytes)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var i = 0
          while (i < px.length) {
            val p = px(i)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            i += 1
          }
          (id, w.toLong, h.toLong, sr, sg, sb)
        }
      }
      .toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")
  }

  /** Feature extraction over DECODED pixels: normalized luminance
    * histogram folded to `dim` buckets — the output schema
    * (array<float>[dim], L1 = 1) is exactly what graft.sim consumes. */
  def imageFeatures(packed: DataFrame, dim: Int = 16): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val (_, _, px) = decodeRgb(bytes)
          val acc = new Array[Float](dim)
          var i = 0
          while (i < px.length) {
            val p = px(i)
            // integer luminance (BT.601 weights ×1000) — deterministic
            val lum = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
              (p & 0xff) * 114) / 1000
            acc(lum * dim / 256) += 1f
            i += 1
          }
          val n = math.max(px.length, 1).toFloat
          (id, acc.map(_ / n))
        }
      }
      .toDF("doc_id", "embedding")
  }

  /** REAL resize: decode → area-scaled redraw to fit `maxDim` → PNG
    * re-encode (the thumbnail path of an image pipeline). */
  def thumbnail(packed: DataFrame, maxDim: Int): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          val scale = math.min(1.0,
            maxDim.toDouble / math.max(img.getWidth, img.getHeight))
          val (tw, th) = (math.max(1, (img.getWidth * scale).toInt),
            math.max(1, (img.getHeight * scale).toInt))
          val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.drawImage(img, 0, 0, tw, th, null)
          g.dispose()
          val bos = new ByteArrayOutputStream()
          ImageIO.write(out, "png", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Frame sampling: one payload → every `stride`-th fixed-size frame,
    * exploded to (doc_id, frame_no, frame) rows — the video path (byte
    * chunking only; the JDK has no video codec). */
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
}
