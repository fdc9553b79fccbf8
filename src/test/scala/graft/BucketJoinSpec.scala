package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The #40b bucketed-join claim, machine-checked: with broadcast off,
  * joining two tables bucketed on the join key runs with NO shuffle
  * Exchange on either side — the scans themselves satisfy the join's
  * required HashPartitioning — and the result equals the plain join. */
class BucketJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bucketed scan-join has no ShuffleExchange; equals plain join (#40b)") {
    import spark.implicits._
    // scope the broadcast kill to this test: the suite JVM shares one
    // SparkSession and other suites plan-assert WITH broadcast on
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val base = java.nio.file.Files.createTempDirectory("graft_bkt_spec")
    val db = ("gbs_" + base.getFileName.toString
      .replaceAll("[^a-zA-Z0-9]", "")).toLowerCase
    spark.sql(s"CREATE DATABASE $db LOCATION '${base.toUri}'")
    try {
      val fact = (1 to 5000).map(i => (i.toLong % 701, i.toLong))
        .toDF("k", "v")
      val dim = (0 to 700).map(i => (i.toLong, s"d$i")).toDF("k", "name")
      fact.write.bucketBy(8, "k").sortBy("k")
        .option("path", s"${base.toUri}/fact_b")
        .saveAsTable(s"$db.fact_b")
      dim.write.bucketBy(8, "k").sortBy("k")
        .option("path", s"${base.toUri}/dim_b")
        .saveAsTable(s"$db.dim_b")
      val j = spark.table(s"$db.fact_b")
        .join(spark.table(s"$db.dim_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") &&
        !plan.contains("Exchange hashpartitioning"),
        s"bucketed join shuffled:\n$plan")
      val got = j.groupBy("name").agg(sum("v").as("sv"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val exp = fact.join(dim, "k").groupBy("name")
        .agg(sum("v").as("sv"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == exp)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(base.toFile)
    }
  }
}
