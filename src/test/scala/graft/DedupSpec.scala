package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.text.TextFunctions

/** Dedup family on planted near-duplicates (SURVEY §2.5 #56–59). */
class DedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again", "en"),
      (1L, "the quick brown fox jumps over the lazy dog again and again!", "en"), // near-dup of 0
      (2L, "completely different text about spark catalyst optimizer rules here", "en"),
      (3L, "THE  quick   brown fox jumps over the lazy dog again and again", "en"), // exact dup of 0 after norm? (punct diff vs 1)
      (4L, "unrelated short words salad table window merge join filter scan", "en")
    ).toDF("doc_id", "text", "lang")
  }

  test("exact dedup: normalization collapses case/whitespace variants") {
    val fps = docs.select(col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fp"))
    val groups = fps.groupBy("fp").agg(min("doc_id").as("keep"),
      count(lit(1)).as("n")).where(col("n") > 1)
      .select("keep", "n").collect()
    assert(groups.length == 1 && groups(0).getLong(0) == 0L
      && groups(0).getLong(1) == 2L) // docs 0 and 3 collapse
  }

  test("minhash LSH finds the planted near-dup pair and nothing else") {
    val pairs = Dedup.minhashPairs(docs, k = 64, bands = 16, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 3L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("simhash: near-dups at small hamming distance, strangers far") {
    val sh = Dedup.simhashed(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(sh(a) ^ sh(b))
    assert(dist(0L, 3L) == 0)               // identical token multisets
    // one-token diff on a tiny doc is noisy, but still closer than a
    // completely unrelated doc
    assert(dist(0L, 1L) < dist(0L, 2L))
    assert(dist(0L, 2L) > 10)               // unrelated
  }

  test("ngram jaccard: hand-checked value") {
    import spark.implicits._
    val two = Seq(
      (0L, "a b c d", "en"),   // shingles: {a b c, b c d}
      (1L, "a b c e", "en")    // shingles: {a b c, b c e} → J = 1/3
    ).toDF("doc_id", "text", "lang")
    val got = Dedup.ngramJaccardPairs(two, "lang", 0.0)
      .select("j").as[Double].collect()
    assert(got.length == 1 && math.abs(got(0) - 1.0 / 3.0) < 1e-15)
  }
}
