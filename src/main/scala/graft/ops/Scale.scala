package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Scale mechanics that don't change query semantics (SURVEY §5):
  * SQL-surface registration, skew-salted joins, bucketed co-located
  * joins. Each is proven by a spec that checks the PLAN property
  * (no Exchange for bucketed joins; identical results for salted). */
object Scale {

  /** Register every test table as a temp view so the engine accepts
    * plain SQL (`spark.sql(...)`) over the same data. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    val t = Tables(spark, dir)
    Seq("region" -> t.region, "nation" -> t.nation,
      "customer" -> t.customer, "supplier" -> t.supplier,
      "part" -> t.part, "orders" -> t.orders, "lineitem" -> t.lineitem,
      "events" -> t.events, "documents" -> t.documents,
      "embeddings" -> t.embeddings)
      .foreach { case (n, df) => df.createOrReplaceTempView(n) }
  }

  /** Skew-safe equi-join: the big side's hot keys are spread across
    * `salts` shuffle partitions (deterministic rand), the small side is
    * replicated once per salt. Result is exactly the plain join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val b = big.withColumn("__salt", (rand(42) * salts).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Write a DataFrame as a bucketed+sorted table: joins between tables
    * bucketed on the same key skip the shuffle entirely. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
}
