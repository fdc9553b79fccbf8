package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorDot
import graft.sim.Similarity

/** The codegen'd VectorDot must be bit-identical to the fold-based dot
  * (same sequential summation order) — that identity is what keeps the
  * DuckDB oracle valid after the fast path swap. */
class VectorDotSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("vec_dot equals the HOF fold bit-for-bit on random vectors") {
    import spark.implicits._
    VectorDot.register(spark)
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() * 2 - 1),
        Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val both = df.select(
      expr("vec_dot(a, b)").as("fast"),
      Similarity.dot(col("a"), col("b")).as("slow"))
    val mismatches = both.where(col("fast") =!= col("slow")).count()
    assert(mismatches == 0)
  }

  test("vec_dot survives whole-stage codegen in a join pipeline") {
    import spark.implicits._
    VectorDot.register(spark)
    val df = Seq((1L, Array(1.0, 2.0)), (2L, Array(3.0, 4.0)))
      .toDF("id", "v")
    val a = df.select(col("id").as("ia"), col("v").as("va"))
    val b = df.select(col("id").as("ib"), col("v").as("vb"))
    val got = a.crossJoin(b).where(col("ia") < col("ib"))
      .select(expr("vec_dot(va, vb)")).as[Double].collect()
    assert(got.toSeq == Seq(1.0 * 3.0 + 2.0 * 4.0))
  }
}
