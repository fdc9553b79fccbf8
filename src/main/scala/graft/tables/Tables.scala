package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Typed loaders for the driver's test schema (TESTDATA.md). Plain
  * parquet scans — Catalyst prunes columns and pushes filters into them,
  * which is the whole 100 TB story for the read side: every graft query
  * should show `PushedFilters`/narrow `ReadSchema` in `.explain`.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
    t("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
