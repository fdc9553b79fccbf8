package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke-level invariants over the full driver contract at sf0.001 (the
  * value-level correctness gate is Verify + the DuckDB oracle; this spec
  * guards the contract's shape). */
class QueriesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("every oracle key has a query and vice versa (minus approximate ops)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    assert((q -- o) == Set("q_knn_lsh", "q_knn_ivf", "q_approx_distinct",
        "q_mm_pipeline", "q_ngram_top_sketch", "q_percentile_approx",
        "q_tokens_bpe"),
      s"unexpected rows-only: ${q -- o}")
  }

  test("approx_count_distinct lands within 5% of exact") {
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sf)
      .collect()(0)
    val exact = graft.tables.Tables(spark, sf).lineitem
      .selectExpr("count(distinct l_partkey)", "count(distinct l_orderkey)")
      .collect()(0)
    def close(a: Long, e: Long) = math.abs(a - e).toDouble / e < 0.05
    assert(close(approx.getLong(0), exact.getLong(0)))
    assert(close(approx.getLong(1), exact.getLong(1)))
  }

  test("approx percentiles land within 2% of the exact interpolated rewrite") {
    // approx_percentile returns an actual data value (no interpolation)
    // with rank error <= n/accuracy; at these group sizes the value gap
    // to the interpolated exact form is well inside 2% relative
    val exact = graft.ops.Queries.qPercentile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = graft.ops.Queries.qPercentileApprox(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    def close(a: Double, e: Double) = math.abs(a - e) / math.abs(e) < 0.02
    approx.foreach { case (k, (a50, a90)) =>
      val (e50, e90) = exact(k)
      assert(close(a50, e50) && close(a90, e90),
        s"$k: approx=($a50,$a90) exact=($e50,$e90)")
    }
  }

  test("TextFunctions.langId/qualityScore are bit-equal to the query rewrites") {
    // the library combinators and the graded queries must never drift:
    // same tokenization, same native membership counts, same arithmetic
    import org.apache.spark.sql.functions._
    graft.functions.ArrayCountIn.register(spark)
    val docs = graft.tables.Tables(spark, sf).documents
    val lib = docs.select(col("doc_id"),
      graft.text.TextFunctions.langId(col("text")).as("lib_lang"),
      graft.text.TextFunctions.qualityScore(col("text")).as("lib_score"))
    val qLang = graft.ops.Queries.qLangId(spark, sf)
      .select(col("doc_id"), col("lang_pred"))
    val qScore = graft.ops.Queries.qQuality(spark, sf)
      .select(col("doc_id"), col("score"))
    val diff = lib.join(qLang, "doc_id").join(qScore, "doc_id")
      .where(col("lib_lang") =!= col("lang_pred") ||
             !(col("lib_score") <=> col("score")))
    assert(diff.count() == 0)
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries run and are non-degenerate at sf0.001") {
    val allowEmpty = Set("q_antijoin", "q_dedup_embed") // legitimately 0 at tiny SF
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0)
      if (!allowEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
