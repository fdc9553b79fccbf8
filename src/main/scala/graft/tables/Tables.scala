package graft.tables

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Typed loaders for the driver's test schema (TESTDATA.md). Plain
  * parquet scans — Catalyst prunes columns and pushes filters into them,
  * which is the whole 100 TB story for the read side: every graft query
  * should show `PushedFilters`/narrow `ReadSchema` in `.explain`.
  *
  * Loaders are memoized per (session, dir, table): `spark.read.parquet`
  * lists the directory and reads footers to infer the schema on every
  * call, which at one call per table per query added up to a visible
  * slice of the benchmark's fixed per-query overhead. The cached value
  * is only the immutable logical plan — no data is pinned.
  */
final case class Tables(spark: SparkSession, dir: String) {
  // get/putIfAbsent, not computeIfAbsent: the events loader memoizes a
  // frame derived from another memoized entry, and CHM forbids nested
  // updates inside a mapping function ("Recursive update").
  // Assumes table dirs are immutable for the session (true for the
  // driver's generated testdata): the memoized plan snapshots the file
  // listing. Bounded: plans are small but sessions come and go in test
  // suites — evict stopped sessions' entries (never the live ones)
  // when the map grows.
  private def memo(name: String)(mk: => DataFrame): DataFrame = {
    if (Tables.memo.size > 512) {
      Tables.memo.keySet.removeIf(_._1.sparkContext.isStopped)
      if (Tables.memo.size > 512) Tables.memo.clear() // hard cap regardless
    }
    val k = (spark, dir, name)
    val hit = Tables.memo.get(k)
    if (hit != null) hit
    else { val v = mk; Tables.memo.putIfAbsent(k, v); v }
  }

  private def t(name: String): DataFrame =
    memo(name)(spark.read.parquet(s"$dir/$name.parquet"))

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  /** events.ts normalized to a session-zone TIMESTAMP regardless of how
    * the driver generated the file — the physical type has changed across
    * testdata generations (TIMESTAMP(NANOS), which Spark's vectorized
    * reader only accepts as long via `nanosAsLong`; later int64;
    * currently TIMESTAMP(MICROS), which arrives as TIMESTAMP_NTZ).
    * Adapt by the schema actually read, not by assumption:
    * long ⇒ nanos→micros conversion; any timestamp flavor ⇒ cast to
    * TimestampType (value-identical under the repo's UTC session zone). */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    memo("events:conv") {
      val raw = t("events")
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampType => raw
        case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
      }
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  private val memo =
    new ConcurrentHashMap[(SparkSession, String, String), DataFrame]()
}
