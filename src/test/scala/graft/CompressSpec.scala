package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Compress

/** Gates for the compression-ratio signal (#64f): determinism across
  * partitionings, planted repetitive-vs-prose separation, and range
  * sanity — the rows-only contract, since zlib's byte count is a JVM
  * artifact no SQL oracle recomputes. */
class CompressSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("ratios are bit-identical across partitionings (#64f)") {
    val docs = graft.tables.Tables(spark, "/root/testdata/sf0.001")
      .documents
    val a = Compress.ratios(docs.repartition(2))
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = Compress.ratios(docs.repartition(7))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }

  test("planted separation: template spam deflates far below prose (#64f)") {
    val rnd = new scala.util.Random(17)
    val prose = (0 until 400).map(_ =>
      rnd.alphanumeric.take(3 + rnd.nextInt(7)).mkString).mkString(" ")
    val spam = Seq.fill(100)("click here best price buy now").mkString(" ")
    val df = Seq((1L, prose), (2L, spam)).toDF("doc_id", "text")
    val r = Compress.ratios(df).orderBy("doc_id")
      .select("ratio").collect().map(_.getDouble(0))
    assert(r(0) > 2 * r(1),
      s"prose ${r(0)} should compress far worse than spam ${r(1)}")
  }

  test("range sanity on the corpus (#64f)") {
    val r = Compress.ratios(graft.tables.Tables(spark,
        "/root/testdata/sf0.001").documents)
      .agg(min("ratio"), max("ratio"), count(lit(1))).head
    assert(r.getDouble(0) > 0.0 && r.getDouble(1) < 1.2 &&
      r.getLong(2) == 500)
  }
}
