package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SortedIntersectCount

/** The merge-scan intersect count must equal the built-in
  * size(array_intersect) on every sorted-distinct input. */
class SortedIntersectSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("sorted_intersect_count == size(array_intersect) (property)") {
    import spark.implicits._
    SortedIntersectCount.register(spark)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15),
      Prop.forAll { (a0: List[Long], b0: List[Long]) =>
        val a = a0.distinct.sorted
        val b = b0.distinct.sorted
        val df = Seq((a, b)).toDF("a", "b")
        val row = df.select(
          expr("sorted_intersect_count(a, b)"),
          size(array_intersect(col("a"), col("b"))).cast("long")).collect()(0)
        row.getLong(0) == row.getLong(1)
      })
    assert(res.passed, res.toString)
  }
}
