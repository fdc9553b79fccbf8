package graft.tables

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

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
  /** The driver's events.parquet carries TIMESTAMP(NANOS), which Spark's
    * vectorized parquet reader rejects; read nanos as long and convert to
    * a (micros) timestamp — the data itself is µs-precision. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    memo("events:conv")(
      t("events").withColumn("ts", timestamp_micros(expr("ts div 1000"))))
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  private val memo =
    new ConcurrentHashMap[(SparkSession, String, String), DataFrame]()
}
