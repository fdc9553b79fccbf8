package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Structured Streaming twins run as REAL streams (SURVEY §2.6): the
  * same transforms the batch oracle checks, driven through MemoryStream
  * micro-batches. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourlyRollup over a stream equals the batch result (#68/#69)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:55:00"), "click", 2.0),
      (ts("2024-01-01 11:05:00"), "view", 3.0),
      (ts("2024-01-01 12:20:00"), "click", 4.0))
    val ms = MemoryStream[(Timestamp, String, Double)]
    val q = Streams.hourlyRollup(
        ms.toDF().toDF("ts", "event_type", "value"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("rollup_out").start()
    ms.addData(rows.take(2))
    q.processAllAvailable()
    ms.addData(rows.drop(2))
    q.processAllAvailable()
    val streamed = spark.table("rollup_out")
      .orderBy("hour", "event_type")
      .select("hour", "event_type", "n", "sv")
      .collect().map(_.toSeq).toSeq
    q.stop()
    val batch = Streams.hourlyRollup(
        rows.toDF("ts", "event_type", "value"))
      .orderBy("hour", "event_type")
      .select("hour", "event_type", "n", "sv")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch && streamed.size == 3)
  }

  test("runningTotal keeps per-key state across micro-batches (#70)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Streams.KV]
    val q = Streams.runningTotal(ms.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("totals_out").start()
    ms.addData(Streams.KV(1L, 10.0), Streams.KV(2L, 1.0))
    q.processAllAvailable()
    ms.addData(Streams.KV(1L, 5.0))
    q.processAllAvailable()
    val last = spark.table("totals_out").groupBy("k")
      .agg(max("total").as("total"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    q.stop()
    assert(last == Map(1L -> 15.0, 2L -> 1.0)) // 10 then 10+5: resumed state
  }

  test("streaming sessionization closes islands across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Streams.Ev]
    val q = Streams.sessionizeStream(ms.toDS(), gapS = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    ms.addData(Streams.Ev(1L, ts("2024-01-01 10:00:00"), 1),
               Streams.Ev(1L, ts("2024-01-01 10:05:00"), 2))
    q.processAllAvailable()
    // 90 min later: previous session closes, new one opens
    ms.addData(Streams.Ev(1L, ts("2024-01-01 11:35:00"), 3))
    q.processAllAvailable()
    val sessions = spark.table("sessions_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    q.stop()
    assert(sessions.toSeq == Seq((1L, 1L, 2L, 300L)))
  }

  test("streaming dedup drops repeats within the watermark (#72)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val q = Streams.dedupedStream(ms.toDF().toDF("ts", "id"),
        Seq("id"), "ts", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    ms.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:01:00"), 1L),
               (ts("2024-01-01 10:02:00"), 2L))
    q.processAllAvailable()
    ms.addData((ts("2024-01-01 10:03:00"), 1L)) // still a dup
    q.processAllAvailable()
    val n = spark.table("dedup_out").count()
    q.stop()
    assert(n == 2) // ids 1 and 2 once each
  }
}
