package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scale

/** File-skipping (#55x): the per-file min/max stats index + the
  * predicate → may-contain translation must (a) never change query
  * results, (b) actually skip files on a clustered layout, (c)
  * degrade soundly on unsupported predicate shapes. */
class FilePruneSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rm(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(rm)
    f.delete(): Unit
  }

  test("pruned read == plain filtered read; skips on clustered layout") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_prune")
    val dir = base.resolve("t").toString
    // range-clustered on x: 8 files, each a tight x-interval
    (1 to 8000).map(i => (i.toLong, (i % 100).toLong, s"p$i"))
      .toDF("x", "y", "p")
      .repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.parquet(dir)
    val stats = Scale.fileStats(spark, dir, Seq("x", "y"))
    assert(stats.count() == 8)
    def check(cond: String, expectSkip: Boolean): Unit = {
      val (pruned, ps) = Scale.readPruned(spark, dir, cond, stats)
      val plain = spark.read.parquet(dir).where(expr(cond))
      assert(pruned.collect().map(_.toSeq).toSet ==
        plain.collect().map(_.toSeq).toSet, s"results diverged: $cond")
      if (expectSkip)
        assert(ps.filesRead < ps.filesTotal,
          s"no skipping for selective $cond: $ps")
      else assert(ps.filesRead == ps.filesTotal, s"unsound skip? $cond")
    }
    check("x >= 2000 AND x < 3000", expectSkip = true)   // range
    check("x = 4321", expectSkip = true)                 // point
    check("x IN (17, 6033)", expectSkip = true)          // in-list
    check("x < 500 OR x > 7900", expectSkip = true)      // disjunct
    check("1000 <= x AND x <= 1100", expectSkip = true)  // flipped sides
    // y is uniform per file → nothing prunable on y, but sound
    check("y = 5", expectSkip = false)
    // unsupported shapes degrade to full read inside AND / at root
    check("x % 2 = 0", expectSkip = false)
    val (_, psMixed) = Scale.readPruned(spark, dir,
      "x < 1000 AND p LIKE 'p%'", stats)
    assert(psMixed.filesRead < psMixed.filesTotal,
      "the supported AND-sibling must still prune")
    // contradiction prunes everything but still answers (empty)
    val (none, psNone) = Scale.readPruned(spark, dir, "x > 99999", stats)
    assert(psNone.filesRead == 0 && none.count() == 0)
    rm(base.toFile)
  }

  test("bloom index prunes point lookups the range stats cannot") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_prune_b")
    val dir = base.resolve("t").toString
    // clustered on x; id is a PERMUTATION (coprime multiplier mod
    // 8000) so every file's id-range spans ~the whole domain —
    // min/max can't prune id
    (1 to 8000).map(i => (i.toLong, (i.toLong * 7919L) % 8000L, s"p$i"))
      .toDF("x", "id", "p")
      .repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.parquet(dir)
    val stats = Scale.fileStats(spark, dir, Seq("x", "id"))
    val (_, psStats) = Scale.readPruned(spark, dir, "id = 7900", stats)
    assert(psStats.filesRead == psStats.filesTotal,
      "range stats must be useless on the scattered column")
    val bloom = Scale.fileBloom(spark, dir, "id", estPerFile = 10000L)
    assert(bloom.count() == 8)
    // a present key lives in exactly one file (i=100 → id=7900)
    val (hit, psHit) = Scale.readPrunedPoint(spark, dir, "id",
      lit(7900L), bloom)
    assert(hit.collect().map(_.getString(2)).toSeq == Seq("p100"))
    assert(psHit.filesRead < psHit.filesTotal,
      s"bloom failed to prune: $psHit")
    // an absent key prunes everything (no false negatives, empty ok)
    val (miss, psMiss) = Scale.readPrunedPoint(spark, dir, "id",
      lit(12345L), bloom)
    assert(miss.count() == 0 && psMiss.filesRead <= 1,
      s"absent key should prune ~all files: $psMiss")
    // equality == the full-scan filter on a multi-file key too
    val plain = spark.read.parquet(dir).where(col("id") === 7900L)
    assert(hit.collect().map(_.toSeq).toSet ==
      plain.collect().map(_.toSeq).toSet)
    rm(base.toFile)
  }

  test("all-null column stats prune soundly") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_prune_n")
    val dir = base.resolve("t").toString
    // file 0: x all null; file 1: x = 1..100
    Seq.fill(100)(Option.empty[Long]).zipWithIndex
      .map { case (x, i) => (x, i.toLong) }.toDF("x", "id")
      .coalesce(1).write.parquet(dir)
    (1 to 100).map(i => (Option(i.toLong), 1000L + i)).toDF("x", "id")
      .coalesce(1).write.mode("append").parquet(dir)
    val stats = Scale.fileStats(spark, dir, Seq("x"))
    val (got, ps) = Scale.readPruned(spark, dir, "x = 50", stats)
    // the all-null file satisfies no comparison → sound to skip
    assert(ps.filesRead == 1 && got.count() == 1)
    rm(base.toFile)
  }
}
