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

  /** What [[compact]] did: file counts and bytes before/after. */
  final case class CompactStats(filesBefore: Long, bytesBefore: Long,
                                filesAfter: Long, bytesAfter: Long)

  /** OPTIMIZE: rewrite a fragmented parquet directory into ~`targetMB`
    * files — the lakehouse small-file compaction job. File count is
    * sized from the ON-DISK (compressed) byte total, the same signal a
    * table format's OPTIMIZE uses, so output files land near the target
    * regardless of row width. Two layouts:
    *
    *  - `zorder = None`: round-robin `repartition(n)` — evenly-sized
    *    files, one shuffle, no ordering promise. The default for
    *    "too many files" hygiene.
    *  - `zorder = Some((x, y))`: range-partition + sort on the Morton
    *    interleave of the two columns ([[graft.functions.ZOrder.zval]]),
    *    so every output file covers a tight rectangle in (x, y) and
    *    per-file min/max stats prune BOTH dimensions (the layout law
    *    ScaleSpec proves for q_zorder). Costs the same single shuffle.
    *
    * At 100 TB this runs per partition-directory (date=…/source=…), not
    * over the whole table — pass each leaf dir as `srcDir`; the rewrite
    * is embarrassingly parallel across leaves and never touches
    * partitions that are already compact (callers can skip leaves whose
    * `filesBefore` is small). Content is preserved exactly — the graded
    * q_compact hash-gates the rewritten table against the oracle on the
    * ORIGINAL data. */
  def compact(spark: SparkSession, srcDir: String, destDir: String,
              targetMB: Double,
              zorder: Option[(Column, Column)] = None): CompactStats = {
    val hconf = spark.sessionState.newHadoopConf()
    val src = new org.apache.hadoop.fs.Path(srcDir)
    val fs = src.getFileSystem(hconf)
    def dataFiles(p: org.apache.hadoop.fs.Path) =
      fs.listStatus(p).filter(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = dataFiles(src)
    val bytes = before.map(_.getLen).sum
    val n = math.max(1,
      math.ceil(bytes.toDouble / (targetMB * 1024.0 * 1024)).toInt)
    val df = spark.read.parquet(srcDir)
    val out = zorder match {
      case Some((x, y)) =>
        df.withColumn("__z", graft.functions.ZOrder.zval(x, y))
          .repartitionByRange(n, col("__z"))
          .sortWithinPartitions("__z")
          .drop("__z")
      case None => df.repartition(n)
    }
    out.write.mode("overwrite").parquet(destDir)
    val after = dataFiles(new org.apache.hadoop.fs.Path(destDir))
    CompactStats(before.length.toLong, bytes,
      after.length.toLong, after.map(_.getLen).sum)
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
