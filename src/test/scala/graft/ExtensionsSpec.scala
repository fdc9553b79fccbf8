package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** vec_dot is available through the SparkSessionExtensions plugin path
  * (cluster-wide config), not just per-session registration. */
class ExtensionsSpec extends AnyFunSuite {
  test("GraftExtensions injects vec_dot for SQL use") {
    // getOrCreate reuses any active session and would skip extensions —
    // retire it first (suites run sequentially; the next suite's lazy
    // getOrCreate simply builds a fresh one)
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      val got = spark.sql(
        "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect()(0).getDouble(0)
      assert(got == 11.0)
    } finally spark.stop()
  }
}
