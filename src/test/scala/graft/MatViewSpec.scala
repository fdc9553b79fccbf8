package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MatViews

/** The MV rollup rewrite (#50d): a coarser GROUP BY over the
  * registered source must answer from the summary table (plan reads
  * the MV path, not the source), with values identical to the
  * un-rewritten aggregate; anything the MV can't answer is left
  * untouched. */
class MatViewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("rollup rewrite answers from the MV; values identical (#50d)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_mv_spec")
    val src = base.resolve("src").toString
    val mv = base.resolve("mv").toString
    try {
      (1 to 10000).map(i => (s"g${i % 7}", s"h${i % 3}", i.toLong,
          BigDecimal(i) / 100))
        .toDF("g", "h", "v", "m")
        .select(col("g"), col("h"), col("v"),
          col("m").cast("decimal(18,2)").as("m"))
        .write.parquet(src)
      val direct = spark.read.parquet(src).groupBy("g")
        .agg(sum("v").as("sv"), sum("m").as("sm"),
          count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDecimal(2), r.getLong(3))).toSet
      MatViews.install(spark)
      MatViews.create(spark, src, Seq("g", "h"), Seq("v", "m"), mv)
      val q = spark.read.parquet(src).groupBy("g")
        .agg(sum("v").as("sv"), sum("m").as("sm"),
          count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("mv") && !plan.contains("src"),
        s"expected an MV scan:\n$plan")
      val got = q.collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2), r.getLong(3))).toSet
      assert(got == direct)
      // a finer / uncovered query is untouched: filter present
      val f = spark.read.parquet(src).where(col("v") > 5000)
        .groupBy("g").agg(count(lit(1)).as("n"))
      assert(f.queryExecution.executedPlan.toString.contains("src"),
        "filtered agg must NOT use the MV")
      assert(f.collect().map(_.getLong(1)).sum == 5000L)
      // sum of a column the MV doesn't carry: untouched
      val u = spark.read.parquet(src).groupBy("g")
        .agg(avg("v").as("a"))
      assert(u.queryExecution.executedPlan.toString.contains("src"),
        "avg (undecomposable here) must NOT use the MV")
    } finally {
      MatViews.drop(spark, src)
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(base.toFile)
    }
  }

  test("rewrite fires under a grouping-col filter; not a measure filter") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_mvf_spec")
    val src = base.resolve("src").toString
    val mv = base.resolve("mv").toString
    try {
      (1 to 10000).map(i => (s"g${i % 7}", s"h${i % 3}", i.toLong))
        .toDF("g", "h", "v").write.parquet(src)
      // direct answers computed BEFORE registration
      val direct = spark.read.parquet(src).where(col("h") === "h1")
        .groupBy("g").agg(sum("v").as("sv"), count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      MatViews.install(spark)
      MatViews.create(spark, src, Seq("g", "h"), Seq("v"), mv)
      // grouping-column filter (g' ⊆ G): pushes onto the MV scan
      val q = spark.read.parquet(src).where(col("h") === "h1")
        .groupBy("g").agg(sum("v").as("sv"), count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("mv") && !plan.contains("src"),
        s"grouping-col filter must rewrite onto the MV:\n$plan")
      val got = q.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == direct)
      // compound grouping-col predicate also fires
      val q2 = spark.read.parquet(src)
        .where(col("h").isin("h0", "h1") && col("g") =!= "g3")
        .groupBy("g").agg(sum("v").as("sv"))
      assert(q2.queryExecution.executedPlan.toString.contains("mv"),
        "compound grouping-col predicate must rewrite")
      // measure filter must NOT fire (covered above too, re-checked
      // here against the filter-capable scanInfo)
      val f = spark.read.parquet(src).where(col("v") > 5000)
        .groupBy("g").agg(count(lit(1)).as("n"))
      assert(f.queryExecution.executedPlan.toString.contains("src"),
        "measure filter must NOT use the MV")
      // a NON-DETERMINISTIC predicate has an EMPTY reference set —
      // vacuously "all grouping columns" — but sampling MV rows
      // keeps/drops whole pre-aggregated groups instead of base rows
      // (r10 review fix): it must NOT fire
      val nd = spark.read.parquet(src).where(rand(7) < lit(0.5))
        .groupBy("g").agg(count(lit(1)).as("n"))
      assert(nd.queryExecution.executedPlan.toString.contains("src"),
        "non-deterministic filter must NOT use the MV")
    } finally {
      MatViews.drop(spark, src)
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(base.toFile)
    }
  }

  test("refresh rescans the source; empty-source global count is 0") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_mvr_spec")
    val src = base.resolve("src").toString
    try {
      (1 to 100).map(i => (s"g${i % 4}", i.toLong)).toDF("g", "v")
        .write.parquet(src)
      MatViews.install(spark)
      MatViews.create(spark, src, Seq("g"), Seq("v"),
        base.resolve("mv1").toString)
      // the source grows; a REFRESH must rescan it — the r9 advice
      // defect rewrote the refresh's own build aggregate onto the
      // stale MV, reproducing the old summary forever
      (101 to 200).map(i => (s"g${i % 4}", i.toLong)).toDF("g", "v")
        .write.mode("append").parquet(src)
      val key = MatViews.create(spark, src, Seq("g"), Seq("v"),
        base.resolve("mv2").toString)
      val q = spark.read.parquet(src).groupBy("g")
        .agg(sum("v").as("sv"), count(lit(1)).as("n"))
      assert(q.queryExecution.executedPlan.toString.contains("mv2"))
      val viaMv = q.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      MatViews.unregister(key)
      val direct = spark.read.parquet(src).groupBy("g")
        .agg(sum("v").as("sv"), count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(viaMv == direct,
        "refreshed MV must reflect the appended rows")
      assert(direct.toSeq.map(_._3).sum == 200L)
      // empty source: global count(1) must rewrite to 0, not NULL
      val src2 = base.resolve("src2").toString
      spark.range(0).select(concat(lit("g"), col("id")).as("g"),
        col("id").as("v")).write.parquet(src2)
      MatViews.create(spark, src2, Seq("g"), Seq("v"),
        base.resolve("mv3").toString)
      val cq = spark.read.parquet(src2).agg(count(lit(1)).as("n"))
      assert(cq.queryExecution.executedPlan.toString.contains("mv3"),
        "global count must answer from the MV")
      assert(cq.head().getLong(0) == 0L,
        "empty-source global count must be 0, never NULL")
      MatViews.drop(spark, src2)
    } finally {
      MatViews.drop(spark, src)
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(base.toFile)
    }
  }
}
