package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.types._

/** Structured Streaming twins (SURVEY §2.6). Each transform is written
  * against a plain DataFrame so the SAME code serves `spark.read`
  * (batch verification against the DuckDB oracle) and `spark.readStream`
  * (production). Streaming-only concerns (watermarks) switch on
  * `df.isStreaming`.
  */
object Streams {
  private val D4 = DecimalType(18, 4)

  /** Tumbling 1-hour rollup per event type. Streaming: 2h watermark
    * bounds state; append mode emits finalized windows. */
  def hourlyRollup(events: DataFrame): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", "2 hours")
      else events
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(D4)).cast("double").as("sv"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sv"))
  }

  /** Stream-static enrichment: events against a broadcast dimension. */
  def enrich(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(broadcast(customer),
      col("user_id") === col("c_custkey"))

  /** The events table as a REAL file-source stream (replay): same
    * nanos→µs conversion as the batch loader, so the identical
    * transforms run on both. Streaming file sources need an explicit
    * schema. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // The file stream source wants a directory; expose the single events
    // file through a temp dir of symlinks (testdata is read-only).
    val streamDir = java.nio.file.Files.createTempDirectory("graft_evstream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    spark.readStream.schema(schema).parquet(streamDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  case class KV(k: Long, v: Double)
  case class KTotal(k: Long, total: Double)

  /** The streaming twin of `lfold` (SURVEY §2.6 #70): a per-key running
    * fold whose state survives across micro-batches — the reference's
    * resumable-fold semantics, distributed per key and bounded by key
    * cardinality. */
  def runningTotal(ds: Dataset[KV])(implicit
      ke: Encoder[Long], se: Encoder[Double],
      oe: Encoder[KTotal]): Dataset[KTotal] =
    ds.groupByKey(_.k).mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
      (k: Long, it: Iterator[KV], state: org.apache.spark.sql.streaming.GroupState[Double]) =>
        val s = state.getOption.getOrElse(0.0) + it.map(_.v).sum
        state.update(s)
        KTotal(k, s)
    }

  /** Streaming dedup within a watermark (#72). */
  def dedupedStream(df: DataFrame, keys: Seq[String],
                    watermarkCol: String, delay: String): DataFrame =
    df.withWatermark(watermarkCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}
