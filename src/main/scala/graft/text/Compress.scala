package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal (#64f) — the Gopher/RefinedWeb
  * compressibility filter: highly repetitive machine-generated text
  * (template farms, keyword stuffing, boilerplate) deflates far below
  * natural prose, so `deflate(text).length / text.length` is a cheap
  * one-pass junk detector that needs no model and no vocabulary.
  *
  * DEFLATE via `java.util.zip.Deflater` (JDK-public, same codec-realism
  * stance as the `javax.imageio`/`javax.sound` modality paths). The
  * ratio is a JVM artifact — zlib's emitted byte count is deterministic
  * for a fixed level but NOT something DuckDB can recompute — so the
  * operator is rows-only, gated by CompressSpec: bit-determinism across
  * partitionings, a planted repetitive-vs-prose separation, and range
  * sanity.
  *
  * Scale shape: `mapPartitions` with ONE `Deflater` reset per row (the
  * batched-stateful-resource idiom the multimodal decoders use —
  * allocating a Deflater per row would dominate). Pure per-row map:
  * zero shuffle, scan speed, embarrassingly parallel at any corpus
  * size.
  */
object Compress {
  /** Per-doc (doc_id, n_bytes, n_deflate, ratio), deflate level 6. */
  def ratios(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val ds: Dataset[(Long, String)] =
      docs.select(col("doc_id"), col("text")).as[(Long, String)]
    ds.mapPartitions { it =>
      val d = new java.util.zip.Deflater(6)
      val buf = new Array[Byte](64 * 1024)
      it.map { case (id, text) =>
        val in = text.getBytes("UTF-8")
        d.reset()
        d.setInput(in)
        d.finish()
        var n = 0L
        while (!d.finished()) n += d.deflate(buf)
        (id, in.length.toLong, n)
      }
    }.toDF("doc_id", "n_bytes", "n_deflate")
      .withColumn("ratio",
        col("n_deflate").cast("double") / col("n_bytes").cast("double"))
  }
}
