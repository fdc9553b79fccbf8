package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-pruned blocklist gates: the registered sketch pair has no
  * false negatives (the property the two-branch plan's correctness
  * rests on), the pruned operator equals the plain anti join it
  * optimizes, and the empty-blocklist edge keeps everything. */
class BloomSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("no false negatives: every inserted key probes true") {
    import spark.implicits._
    graft.functions.BloomFunctions.register(spark)
    val keys = spark.createDataset((0 until 5000).map(i => s"k$i")).toDF("k")
      .repartition(8) // force partial sketches + merge
    val bf = keys.agg(expr("bloom_filter_agg(xxhash64(k), 256L)").as("bf"))
      .head.getAs[Array[Byte]]("bf")
    // 5000 keys through a 256-item-sized sketch: heavy overload, still
    // zero misses allowed (bloom guarantees no false negatives)
    val misses = keys
      .where(!call_function("might_contain", lit(bf), xxhash64(col("k"))))
      .count()
    assert(misses == 0)
  }

  test("q_blocklist == the plain anti join it prunes for") {
    import graft.text.TextFunctions.fingerprint
    val docs = graft.tables.Tables(spark, sf).documents
      .withColumn("fp", fingerprint(col("text")))
    val plain = docs.where(col("source") =!= "src0")
      .join(docs.where(col("source") === "src0").select("fp"),
        Seq("fp"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
      .orderBy("lang").collect().toSeq
    val pruned = ops.Queries.qBlocklist(spark, sf).collect().toSeq
    assert(pruned == plain && pruned.nonEmpty)
  }

  test("empty blocklist keeps the whole corpus") {
    import spark.implicits._
    graft.functions.BloomFunctions.register(spark)
    // null sketch (empty aggregate input) → cand=false for every row
    val empty = spark.createDataset(Seq.empty[String]).toDF("bfp")
    val bf = empty.agg(expr("bloom_filter_agg(xxhash64(bfp), 64L)").as("bf"))
      .head.getAs[Array[Byte]]("bf")
    assert(bf == null)
  }
}
