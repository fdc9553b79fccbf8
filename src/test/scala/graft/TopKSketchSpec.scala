package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKSketch

/** Misra–Gries guarantees (exactness under capacity, the n/(k+1) error
  * bound through merges) and top-k agreement of the sketched bigram
  * query with its exact twin. */
class TopKSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("exact when capacity >= distinct keys, through partial merges") {
    import spark.implicits._
    // 8 partitions force real partial-aggregate merges
    val data = (0 until 5000).map(i => s"k${i % 37}")
    val df = spark.createDataset(data).repartition(8).toDF("x")
    val got = df.agg(TopKSketch.udafFor(64)(col("x")).as("sk"))
      .select(explode(col("sk"))).as[(String, Long)].collect().toMap
    val exact = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == exact)
  }

  test("undercount bounded by n/(capacity+1); heavy keys always survive") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // zipf-ish: heavy keys h0..h4 plus a long uniform tail
    val data = (0 until 20000).map { _ =>
      val r = rnd.nextInt(100)
      if (r < 40) s"h${r % 5}" else s"t${rnd.nextInt(2000)}"
    }
    val n = data.size.toLong
    val cap = 128
    val exact = data.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val got = spark.createDataset(data).repartition(8).toDF("x")
      .agg(TopKSketch.udafFor(cap)(col("x")).as("sk"))
      .select(explode(col("sk"))).as[(String, Long)].collect().toMap
    val bound = n / (cap + 1)
    // every estimate is an undercount within the bound
    assert(got.forall { case (k, c) => c <= exact(k) && exact(k) - c <= bound })
    // every key heavier than the bound is present
    val heavy = exact.filter(_._2 > bound).keySet
    assert(heavy.subsetOf(got.keySet),
      s"missing heavy keys: ${heavy -- got.keySet}")
  }

  test("error bound survives any merge grouping (property)") {
    // MG's guarantee must be independent of HOW partials merge: group
    // the same stream into random partition counts and re-check the
    // undercount bound each time
    import spark.implicits._
    val agg = new TopKSketch(32)
    val rnd = new scala.util.Random(5)
    val data = (0 until 4000).map { _ =>
      if (rnd.nextInt(10) < 4) s"h${rnd.nextInt(3)}" else s"t${rnd.nextInt(400)}"
    }
    val exact = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bound = data.size.toLong / 33
    for (parts <- Seq(1, 3, 8, 17)) {
      val got = spark.createDataset(data).repartition(parts).toDF("x")
        .agg(TopKSketch.udafFor(32)(col("x")).as("sk"))
        .select(explode(col("sk"))).as[(String, Long)].collect().toMap
      assert(got.forall { case (k, c) =>
        c <= exact(k) && exact(k) - c <= bound }, s"parts=$parts")
      val heavy = exact.filter(_._2 > bound).keySet
      assert(heavy.subsetOf(got.keySet), s"parts=$parts lost ${heavy -- got.keySet}")
    }
  }

  test("sketched bigram top-20 equals the exact query at sf0.001") {
    // sf0.001 has ~900 distinct bigrams < 4096 capacity: the summary is
    // exact there, so the two queries must agree bit-for-bit
    val dir = "/root/testdata/sf0.001"
    val exact = graft.ops.Queries.qNgramTop(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val sk = graft.ops.Queries.qNgramTopSketch(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(exact.nonEmpty)
    assert(sk == exact)
  }

  test("sketched top-20 overlaps exact heavily at sf0.01") {
    // the generator's vocabulary is closed (~930 distinct bigrams at
    // every graded SF), so the summary is exact on real data too; the
    // over-capacity regime is exercised by the synthetic bound test
    // above. Keep the assertion at >=0.8 overlap so it stays valid if
    // the driver's corpus generator ever opens the vocabulary.
    val dir = "/root/testdata/sf0.01"
    val exact = graft.ops.Queries.qNgramTop(spark, dir).collect()
      .map(_.getString(0)).toSet
    val sk = graft.ops.Queries.qNgramTopSketch(spark, dir).collect()
      .map(_.getString(0)).toSet
    val overlap = (exact & sk).size.toDouble / exact.size
    assert(overlap >= 0.8, s"overlap $overlap; sk=$sk exact=$exact")
  }

  test("count-min estimates: est >= true, est <= true + eps*N, deterministic") {
    // the CMS contract at the fixed seed: one-sided error (never an
    // undercount), bounded overcount (eps = 0.001 of total bigram
    // mass), and bit-identical output across runs
    val dir = "/root/testdata/sf0.001"
    val rows = graft.ops.Queries.qNgramFreqCms(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.size == 20)
    val n = graft.tables.Tables(spark, dir).documents
      .selectExpr(s"${graft.dedup.Dedup.toksExpr} AS toks")
      .selectExpr("greatest(size(toks) - 1, 0) AS nb")
      .agg(org.apache.spark.sql.functions.sum("nb")).collect()(0).getLong(0)
    rows.foreach { case (b, exact, est) =>
      assert(est >= exact, s"$b: CMS undercounted ($est < $exact)")
      assert(est <= exact + (0.001 * n).toLong + 1,
        s"$b: overcount past eps*N ($est vs $exact + ${0.001 * n})")
    }
    val again = graft.ops.Queries.qNgramFreqCms(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(again == rows)
  }
}
