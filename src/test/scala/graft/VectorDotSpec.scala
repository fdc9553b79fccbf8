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

  test("vec_dot edge semantics mirror the zip_with fold: ragged/null -> NULL") {
    // plain session (no rewrite rule): the fold side stays interpreted
    VectorDot.register(spark)
    val rows = spark.sql(
      """SELECT vec_dot(a, b) <=>
        |  aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D,
        |            (acc, v) -> acc + v) AS same,
        |  vec_dot(a, b) AS vd FROM VALUES
        |  (array(1.0D, 2.0D), array(3.0D, 4.0D)),
        |  (array(1.0D), array(5.0D, 6.0D)),
        |  (array(1.0D, NULL), array(2.0D, 3.0D)),
        |  (cast(array() as array<double>), cast(array() as array<double>)),
        |  (NULL, array(1.0D))
        |AS t(a, b)""".stripMargin).collect()
    assert(rows.forall(_.getBoolean(0)))
    assert(rows.count(_.isNullAt(1)) == 3) // ragged, null-elem, null array
  }

  test("vec_normalize: unit length, and scale-invariant direction") {
    import spark.implicits._
    graft.functions.VecNormalize.register(spark)
    val rnd = new scala.util.Random(7)
    val df = (0 until 100).map(i =>
        (i.toLong, Array.fill(32)(rnd.nextFloat() * 4 - 2)))
      .toDF("id", "v")
    VectorDot.register(spark)
    val bad = df.select(expr("vec_dot(vec_normalize(v), vec_normalize(v))")
        .as("n2")).where(abs(col("n2") - 1.0) > 1e-12)
    assert(bad.count() == 0)
    // null elements: no defined direction/sign pattern -> NULL result
    graft.functions.HyperplaneLsh.register(spark)
    val nulls = spark.sql(
      """SELECT vec_normalize(a) AS vn, hyperplane_lsh(a, 4, 4) AS hl
        |FROM VALUES (array(1.0D, NULL)) AS t(a)""".stripMargin).collect()(0)
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("hyperplane_lsh: deterministic, bucket-ranged, sign-scale-invariant") {
    import spark.implicits._
    graft.functions.HyperplaneLsh.register(spark)
    graft.functions.VecNormalize.register(spark)
    val rnd = new scala.util.Random(11)
    val df = (0 until 100).map(i =>
        (i.toLong, Array.fill(16)(rnd.nextDouble() * 2 - 1)))
      .toDF("id", "v")
    val out = df.select(col("id"),
      expr("hyperplane_lsh(v, 8, 6)").as("a"),
      expr("hyperplane_lsh(v, 8, 6)").as("b"),
      // positive scaling never changes any sign ⇒ identical buckets
      expr("hyperplane_lsh(transform(v, x -> x * 3.0), 8, 6)").as("c"))
    assert(out.where(expr("a <> b or a <> c")).count() == 0)
    assert(out.where(expr(
      "size(a) <> 8 or exists(a, x -> x < 0 or x >= 64)")).count() == 0)
    // optional seed arg accepts a plain int literal (boxed Integer) and
    // actually changes the planes
    val seeded = df.select(
      expr("hyperplane_lsh(v, 8, 6, 7)").as("s7"),
      expr("hyperplane_lsh(v, 8, 6)").as("s42"))
    assert(seeded.where(expr("s7 <> s42")).count() > 0)
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
