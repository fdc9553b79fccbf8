package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scale

/** Copy-on-write DML (#42g): DELETE/UPDATE rewrite ONLY the files the
  * predicate touches — the untouched files are byte-copies — and the
  * logical result equals the plain filter / CASE projection. */
class CowDmlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def md5(f: java.io.File): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(java.nio.file.Files.readAllBytes(f.toPath))
      .map("%02x".format(_)).mkString
  }

  test("deleteWhere rewrites only hit files; result == WHERE NOT") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cow_spec")
    val src = base.resolve("src").toString
    val dest = base.resolve("del").toString
    // k in 0..3, one file per k: the predicate k = 2 must touch 1 of 4
    val df = (1 to 4000).map(i => (i.toLong, i.toLong % 4, s"v$i"))
      .toDF("id", "k", "v")
    df.repartition(4, col("k")).write.parquet(src)
    val stats = Scale.deleteWhere(spark, src, dest, col("k") === 2)
    // 4 key values hash into ≤4 partitions (collisions allowed), but
    // k=2's rows land in exactly ONE file — the only one rewritten
    assert(stats.filesTotal >= 2 && stats.filesRewritten == 1,
      s"expected a single-file rewrite, got $stats")
    assert(stats.rowsBefore == 4000 && stats.rowsAfter == 3000)
    val got = spark.read.parquet(dest)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = df.where(col("k") =!= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exp)
    // untouched files are byte-identical copies
    def parts(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f)
    val srcParts = parts(src).toMap
    val copied = parts(dest).filter { case (n, f) =>
      srcParts.contains(n) && md5(f) == md5(srcParts(n)) }
    assert(copied.length == (stats.filesTotal - stats.filesRewritten),
      "every non-hit file must be a byte-copy")
    // UPDATE twin: matched rows get the new value, others untouched
    val upd = base.resolve("upd").toString
    val us = Scale.updateWhere(spark, src, upd, col("k") === 2,
      Seq("v" -> lit("X")))
    assert(us.filesRewritten == stats.filesRewritten &&
      us.rowsAfter == 4000)
    val uv = spark.read.parquet(upd)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert((1 to 4000).forall(i =>
      uv(i.toLong) == (if (i % 4 == 2) "X" else s"v$i")))
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(): Unit
    }
    rm(base.toFile)
  }

  test("deleteWhere keeps NULL-predicate rows regardless of file") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cow_null")
    val src = base.resolve("src").toString
    val dest = base.resolve("del").toString
    // NULL v rows land in BOTH files: one shares a file with TRUE
    // hits (k=1), one does not (k=0). SQL DELETE removes only rows
    // where the predicate IS TRUE — the r9 advice defect dropped
    // NULL rows that happened to share a file with a hit.
    val df = Seq(
      (1L, 0L, Option(5.0)), (2L, 0L, None),
      (3L, 1L, Option(99.0)), (4L, 1L, None), (5L, 1L, Option(1.0))
    ).toDF("id", "k", "v")
    df.repartition(2, col("k")).write.parquet(src)
    val stats = Scale.deleteWhere(spark, src, dest, col("v") > 50.0)
    assert(stats.rowsAfter == 4,
      s"only the v>50 row may be deleted, got $stats")
    val kept = spark.read.parquet(dest)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L, 5L),
      "NULL-predicate rows must survive in hit AND untouched files")
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(): Unit
    }
    rm(base.toFile)
  }
}
