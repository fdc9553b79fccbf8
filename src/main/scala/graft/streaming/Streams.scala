package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
}
