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
}
