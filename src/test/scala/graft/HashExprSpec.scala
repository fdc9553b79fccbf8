package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHashSig, SimHash60}

/** Native hash expressions vs their SQL-fold definitions. */
class HashExprSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The oracle-documented SQL fold for simhash (kept as ground truth). */
  private val sqlSimhash =
    """aggregate(
      |  zip_with(
      |    aggregate(
      |      transform(toks, t ->
      |        cast(conv(substr(md5(concat('0#', t)), 1, 15), 16, 10)
      |          as bigint)),
      |      array_repeat(0, 60), (acc, h) ->
      |      zip_with(acc,
      |        transform(sequence(0, 59), k ->
      |          IF((shiftright(h, k) & 1) = 1, 1, -1)),
      |        (x, y) -> x + y)),
      |    transform(sequence(0, 59), k -> shiftleft(cast(1 as bigint), k)),
      |    (sb, p) -> IF(sb > 0, p, cast(0 as bigint))),
      |  cast(0 as bigint), (acc, x) -> acc + x)""".stripMargin

  test("simhash60 is bit-identical to the SQL md5 fold (property)") {
    import spark.implicits._
    SimHash60.register(spark)
    val tok = Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12),
      Prop.forAll(tok) { toks =>
        val df = Seq(Tuple1(toks)).toDF("toks")
        val row = df.selectExpr("simhash60(toks)", sqlSimhash).collect()(0)
        row.getLong(0) == row.getLong(1)
      })
    assert(res.passed, res.toString)
  }

  test("minhash_sig: 64 mins, sensitive to content, stable across calls") {
    import spark.implicits._
    MinHashSig.register(spark)
    val df = Seq(
      Tuple1(Seq("a b c", "b c d", "c d e")),
      Tuple1(Seq("a b c", "b c d", "c d e")),
      Tuple1(Seq("x y z"))).toDF("sh")
    val sigs = df.selectExpr("minhash_sig(sh)").collect()
      .map(_.getSeq[Long](0))
    assert(sigs(0).size == 64)
    assert(sigs(0) == sigs(1)) // deterministic
    assert(sigs(0) != sigs(2)) // content-sensitive
    // min over a superset can only stay or decrease per component
    val sup = Seq(Tuple1(Seq("a b c", "b c d", "c d e", "x y z"))).toDF("sh")
      .selectExpr("minhash_sig(sh)").collect()(0).getSeq[Long](0)
    assert(sup.zip(sigs(0)).forall { case (s, o) => s <= o })
  }

  test("nfc_normalize: codegen == interpreted == java.text.Normalizer") {
    import spark.implicits._
    graft.functions.NfcNormalize.register(spark)
    val marks = graft.ops.Queries.combiningMarks
    val rows = Seq("e" + "\u0301", "a\u0300b\u0301q\u0308", "plain",
      "", marks, null)
    val df = rows.map(Tuple1(_)).toDF("s")
    def run(): Seq[Any] =
      df.selectExpr("nfc_normalize(s)").collect().toSeq.map(_.get(0))
    val modeKey = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(modeKey, "FALLBACK")
    val gen = try { spark.conf.set(modeKey, "CODEGEN_ONLY"); run() }
      finally spark.conf.set(modeKey, prev)
    val interp = try { spark.conf.set(modeKey, "NO_CODEGEN"); run() }
      finally spark.conf.set(modeKey, prev)
    val want = rows.map(r => if (r == null) null
      else java.text.Normalizer.normalize(r, java.text.Normalizer.Form.NFC))
    assert(gen.map(v => if (v == null) null else v.toString) == want)
    assert(interp == gen)
    // the composed form really is shorter: e + combining acute -> 1 char
    assert(want.head.length == 1)
  }

  test("strip_accents: codegen == interpreted == NFD+drop-Mn") {
    import spark.implicits._
    graft.functions.StripAccents.register(spark)
    val rows = Seq("caf\u00e9", "cafe\u0301", "plain", "",
      graft.ops.Queries.acuteVowels, null)
    val df = rows.map(Tuple1(_)).toDF("s")
    def run(): Seq[Any] =
      df.selectExpr("strip_accents(s)").collect().toSeq.map(_.get(0))
    val modeKey = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(modeKey, "FALLBACK")
    val gen = try { spark.conf.set(modeKey, "CODEGEN_ONLY"); run() }
      finally spark.conf.set(modeKey, prev)
    val interp = try { spark.conf.set(modeKey, "NO_CODEGEN"); run() }
      finally spark.conf.set(modeKey, prev)
    val want = rows.map(r =>
      if (r == null) null else graft.functions.StripAccents.strip(r))
    assert(gen.map(v => if (v == null) null else v.toString) == want)
    assert(interp == gen)
    // both encodings of cafe-acute land on the same key
    assert(want(0) == "cafe" && want(1) == "cafe" &&
      want(4) == "aeiou")
  }
}
