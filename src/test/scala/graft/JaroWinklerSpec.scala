package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JaroWinklerSim

/** The native jaro_winkler expression vs DuckDB 1.x
  * `jaro_winkler_similarity` — the cross-engine oracle gate rests on
  * bit-compatibility for ASCII inputs, so the probe values below are
  * EXACT doubles captured from DuckDB (not rounded expectations).
  * Covers: classic textbook pairs, floored transpositions, the
  * prefix-4 cap, the 0.7 boost threshold (applied and suppressed),
  * empty/equal/disjoint inputs, and the jaro==0.7-with-prefix edge. */
class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def jw(a: String, b: String): Double =
    JaroWinklerSim.sim(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  test("matches DuckDB jaro_winkler_similarity bit-for-bit on probes") {
    // each expected value is DuckDB 1.0.0's exact double output
    val probes = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111), // 1 transposition
      ("DIXON", "DICKSONX", 0.8133333333333332), // prefix 2, uneven len
      ("abc", "abc", 1.0),
      ("", "abc", 0.0), // empty side → 0, not 1
      ("", "", 0.0),
      ("ab", "ba", 0.0), // window 0: no matches at len 2
      ("CRATE", "TRACE", 0.7333333333333334), // no common prefix
      ("abcdefgh", "abcdefgh!!", 0.96), // prefix capped at 4
      ("JONES", "JOHNSON", 0.8323809523809523),
      ("abcvwxyz", "cabvwxyz", 0.9583333333333334), // t = floor(3/2)
      ("aXXXXX", "aYYYYY", 0.4444444444444444), // boost suppressed ≤0.7
      ("abcde", "acbedXXXXX", 0.7300000000000001), // jaro ≈ 0.7 edge
      ("a", "a", 1.0), // window clamps at 0
      ("ab", "abcdXXXX", 0.8),
      ("Customer#000000123", "Customer#000000132", 0.9888888888888889))
    for ((a, b, exp) <- probes)
      assert(jw(a, b) == exp, s"jw('$a','$b')")
  }

  test("symmetric and within [0,1] on random ASCII strings") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val a = (0 until rnd.nextInt(12)).map(_ =>
        ('a' + rnd.nextInt(4)).toChar).mkString
      val b = (0 until rnd.nextInt(12)).map(_ =>
        ('a' + rnd.nextInt(4)).toChar).mkString
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"range: '$a' '$b'")
      assert(s == jw(b, a), s"symmetry: '$a' '$b'")
      if (a == b && a.nonEmpty) assert(s == 1.0)
    }
  }

  test("SQL registration + codegen path equals the static function") {
    JaroWinklerSim.register(spark)
    val got = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS s, " +
        "jaro_winkler(cast(null as string), 'x') AS n").collect()(0)
    assert(got.getDouble(0) == 0.9611111111111111)
    assert(got.isNullAt(1))
    // through a projection over rows (whole-stage codegen, not eval)
    import spark.implicits._
    val df = Seq(("DWAYNE", "DUANE"), ("DIXON", "DICKSONX"))
      .toDF("a", "b")
    val rows = df.selectExpr("jaro_winkler(a, b) AS s")
      .collect().map(_.getDouble(0)).toSeq
    assert(rows == Seq(jw("DWAYNE", "DUANE"), 0.8133333333333332))
  }
}
