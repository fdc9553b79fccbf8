package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ArrayCountIn

/** `array_count_in` vs its interpreted lambda ground truth
  * (`size(filter(toks, t -> t IN (...)))`), plus the null/multiplicity
  * contract documented on the expression and both eval paths. */
class ArrayCountInSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val words = "array('the','a','of')"

  private def count1(arrSql: String): Any = {
    ArrayCountIn.register(spark)
    spark.sql(s"SELECT array_count_in($arrSql, $words) AS c").collect()(0).get(0)
  }

  test("null array yields null; empty array yields 0") {
    assert(count1("cast(null as array<string>)") == null)
    assert(count1("cast(array() as array<string>)") == 0L)
  }

  test("null elements never count; multiplicity is preserved") {
    // 'the' twice + null + misses: null must not count (the lambda form's
    // IN over null is null ⇒ filter drops it), dups must count twice
    assert(count1("array('the', null, 'x', 'the', 'a')") == 3L)
  }

  test("matches the interpreted filter+isin lambda on random arrays (property)") {
    ArrayCountIn.register(spark)
    import spark.implicits._
    val tok = Gen.oneOf(Gen.const("the"), Gen.const("a"), Gen.const("of"),
      Gen.const(null: String), Gen.alphaStr)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20),
      Prop.forAll(Gen.listOf(tok)) { toks =>
        val df = Seq(Tuple1(toks)).toDF("toks")
        val row = df.selectExpr(
          s"array_count_in(toks, $words) AS native",
          s"cast(size(filter(toks, t -> t IN ('the','a','of'))) as bigint) AS oracle"
        ).collect()(0)
        row.getLong(0) == row.getLong(1)
      })
    assert(res.passed, res.toString)
  }

  test("codegen and interpreted paths agree") {
    ArrayCountIn.register(spark)
    import spark.implicits._
    val df = Seq(
      Tuple1(Seq("the", "the", "a", null, "zz")),
      Tuple1(Seq.empty[String]),
      Tuple1(null: Seq[String])).toDF("toks")
    def run(): Seq[Any] =
      df.selectExpr(s"array_count_in(toks, $words)").collect().toSeq.map(_.get(0))
    val modeKey = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(modeKey, "FALLBACK")
    val gen = try { spark.conf.set(modeKey, "CODEGEN_ONLY"); run() }
      finally spark.conf.set(modeKey, prev)
    val interp = try { spark.conf.set(modeKey, "NO_CODEGEN"); run() }
      finally spark.conf.set(modeKey, prev)
    assert(gen == Seq(3L, 0L, null) && interp == gen)
  }
}
