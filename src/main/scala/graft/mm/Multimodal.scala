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
  * The audio path is equally real: payloads are genuine WAV files
  * (RIFF container written and parsed by `javax.sound.sampled` — also
  * JDK-public), with closed-form integer PCM content so decoded sample
  * statistics hash-match an independent SQL oracle too.
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
  private[graft] def synthPng(docId: Long): Array[Byte] =
    encodePng(imgW(docId), imgH(docId), imgSeed(docId))

  private def encodePng(w: Int, h: Int, d: Int): Array[Byte] = {
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

  /** Perceptual dHash (#67f) over the REAL decode — the LAION-style
    * image-dedup primitive: integer grayscale → 9×8 block-mean
    * downsample → 64 horizontal-gradient bits packed into one BIGINT.
    * Every step is integer math on exactly-recoverable pixels (PNG is
    * lossless), so the hash is bit-reproducible from the closed-form
    * content and the SQL oracle recomputes it without any codec —
    * the decode→downsample→hash path gets a full hash gate, unlike
    * float perceptual hashes (pHash's DCT) which carry engine drift.
    *
    * Conventions pinned for cross-engine equality: gray =
    * (299r + 587g + 114b) div 1000; block (i,j) covers
    * x ∈ [iw div 9, (i+1)w div 9) × y ∈ [jh div 8, (j+1)h div 8)
    * (floor boundaries); mean = sum div area; bit j·8+i set iff
    * mean(i,j) > mean(i+1,j). Bit 63 makes the value negative in
    * two's complement — identically in both engines, and a sum of
    * DISTINCT bit values cannot overflow en route (positives total
    * < 2^63; the sign bit only moves the total back down). */
  def dhashImage(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val (w, h, px) = decodeRgb(bytes)
          def gray(x: Int, y: Int): Long = {
            val p = px(y * w + x)
            (299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
              114L * (p & 0xff)) / 1000L
          }
          val m = Array.ofDim[Long](9, 8)
          var i = 0
          while (i < 9) {
            val x0 = i * w / 9; val x1 = (i + 1) * w / 9
            var j = 0
            while (j < 8) {
              val y0 = j * h / 8; val y1 = (j + 1) * h / 8
              var s = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) { s += gray(x, y); x += 1 }
                y += 1
              }
              m(i)(j) = s / ((x1 - x0).toLong * (y1 - y0))
              j += 1
            }
            i += 1
          }
          var hash = 0L
          var j = 0
          while (j < 8) {
            i = 0
            while (i < 8) {
              if (m(i)(j) > m(i + 1)(j)) hash |= (1L << (j * 8 + i))
              i += 1
            }
            j += 1
          }
          (id, w.toLong, h.toLong, hash)
        }
      }
      .toDF("doc_id", "width", "height", "dhash")
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

  // ---- audio modality: real WAV encode/decode via javax.sound.sampled ----

  /** Deterministic synthetic PCM content for a doc_id — the closed form
    * the SQL oracle re-evaluates. 16-bit signed mono at 8 kHz; every
    * intermediate fits comfortably in Int, so any engine reproduces the
    * exact samples with integer arithmetic only. */
  private[graft] def wavN(docId: Long): Int = 800 + (docId % 37).toInt * 16
  private[graft] def wavSeed(docId: Long): Int = (docId % 997).toInt
  private[graft] def sample(d: Int, i: Int): Int =
    ((i * 31 + d * 17) * 73 + d) % 65536 - 32768

  private val WavFormat = new javax.sound.sampled.AudioFormat(
    8000f, 16, 1, true, false) // 8 kHz, 16-bit, mono, signed, LE

  /** Encode the synthetic signal for one doc as a real WAV file
    * (RIFF container written by `javax.sound.sampled.AudioSystem`). */
  private[graft] def synthWav(docId: Long): Array[Byte] = {
    val (n, d) = (wavN(docId), wavSeed(docId))
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sample(d, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), WavFormat, n.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** docs → (doc_id, payload: REAL WAV bytes, meta). */
  def packAudio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id").as[Long]
      .mapPartitions(_.map(id => (id, synthWav(id))))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit("audio/wav").as("mime")).as("meta"))
  }

  /** REAL decode: parse the RIFF header + PCM frames with the JDK's
    * WAV codec, returning (sampleRate, channels, samples). */
  private def decodePcm(bytes: Array[Byte]): (Float, Int, Array[Int]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
      s"expected 16-bit LE PCM, got $fmt")
    val data = ais.readAllBytes()
    val out = new Array[Int](data.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = (data(2 * i) & 0xff) | (data(2 * i + 1).toInt << 8)
      i += 1
    }
    (fmt.getSampleRate, fmt.getChannels, out)
  }

  /** Exact integer statistics over DECODED samples — the audio twin of
    * [[decodeImage]]: rate/length from the real WAV header, sum and
    * energy (sum of squares) over the real decoded PCM, all integers so
    * the SQL oracle hash-matches bit-for-bit. */
  def decodeAudio(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (rate, channels, xs) = decodePcm(bytes)
        var (s, sq, mx) = (0L, 0L, 0L)
        var i = 0
        while (i < xs.length) {
          val v = xs(i)
          s += v; sq += v.toLong * v; mx = math.max(mx, math.abs(v.toLong))
          i += 1
        }
        (id, rate.toLong, channels.toLong, xs.length.toLong, s, sq, mx)
      })
      .toDF("doc_id", "sample_rate", "channels", "n_samples",
        "sum_s", "sum_sq", "max_abs")
  }

  /** Feature extraction over DECODED samples: L1-normalized energy per
    * `dim` equal time bands — same output contract as [[imageFeatures]]
    * (array<float>[dim]), so the ANN stage consumes it unchanged. */
  def audioFeatures(packed: DataFrame, dim: Int = 16): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (_, _, xs) = decodePcm(bytes)
        val acc = new Array[Double](dim)
        var i = 0
        while (i < xs.length) {
          val v = xs(i).toDouble
          acc(math.min(dim - 1, i * dim / xs.length)) += v * v
          i += 1
        }
        val total = math.max(acc.sum, 1e-12)
        (id, acc.map(e => (e / total).toFloat))
      })
      .toDF("doc_id", "embedding")
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

  // ---- video modality: container of real PNG frames (M-JPEG shape) --

  /** Synthetic video geometry: 3–6 frames per doc, image-modality
    * dims, a frame-varying seed — every value a closed form of
    * (doc_id, frame_no) so the SQL oracle recomputes the exact pixel
    * sums of every sampled frame. */
  private[graft] def vidFrames(docId: Long): Int = 3 + (docId % 4).toInt
  private[graft] def frameSeed(docId: Long, f: Int): Int =
    ((docId + f.toLong * 7919L) % 251).toInt

  /** docs → (doc_id, payload: concatenated REAL PNG frames, meta with
    * per-frame byte lengths). The JDK ships no video codec, so the
    * container is the M-JPEG shape — independently decodable
    * intra-frames back to back, the index in metadata; every frame is
    * a genuine PNG through `javax.imageio`. At 100 TB the payload
    * stays one opaque parquet binary cell per doc; the frame index
    * rides in the typed meta struct so samplers can slice without
    * decoding. */
  def packVideo(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id").as[Long]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { id =>
          val frames = (0 until vidFrames(id)).map(f =>
            encodePng(imgW(id), imgH(id), frameSeed(id, f)))
          (id, frames.toArray.flatten, frames.map(_.length).toArray)
        }
      }
      .toDF("doc_id", "payload", "frame_bytes")
      .select(col("doc_id"), col("payload"),
        struct(lit("video/x-png-frames").as("mime"),
          col("frame_bytes").as("frame_bytes")).as("meta"))
  }

  /** REAL frame-sampled decode: slice the payload at the meta frame
    * index, run the PNG decoder on every `stride`-th frame, return
    * exact integer pixel sums over the sampled frames (the
    * frame-sampling shape of video feature extraction — decode cost
    * divides by `stride`, untouched frames are never parsed). */
  def decodeVideo(packed: DataFrame, stride: Int = 2): DataFrame = {
    require(stride > 0, "stride must be positive")
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col("doc_id"), col("payload"),
        col("meta.frame_bytes").as("fb"))
      .as[(Long, Array[Byte], Array[Int])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, bytes, lens) =>
          var off = 0
          var (sr, sg, sb) = (0L, 0L, 0L)
          var ns = 0L
          var w = 0; var h = 0
          var f = 0
          while (f < lens.length) {
            if (f % stride == 0) {
              val (fw, fh, px) = decodeRgb(
                java.util.Arrays.copyOfRange(bytes, off, off + lens(f)))
              w = fw; h = fh
              var i = 0
              while (i < px.length) {
                val p = px(i)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff
                sb += p & 0xff
                i += 1
              }
              ns += 1
            }
            off += lens(f)
            f += 1
          }
          (id, lens.length.toLong, ns, w.toLong, h.toLong, sr, sg, sb)
        }
      }
      .toDF("doc_id", "n_frames", "n_sampled", "width", "height",
        "sum_r", "sum_g", "sum_b")
  }
}
