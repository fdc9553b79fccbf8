package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL surface for Spark's built-in bloom-filter sketch pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the expressions
  * behind AQE's runtime filters — spark/sql/catalyst/expressions/
  * BloomFilterMightContain.scala). Spark keeps them internal because
  * the optimizer injects them itself, but ANTI-join pruning — the
  * blocklist shape — is exactly the case the optimizer can NOT inject
  * a runtime filter for (a bloom miss proves a row KEPT, which only an
  * explicit two-branch plan can exploit), so graft registers them for
  * explicit use:
  *
  *   bloom_filter_agg(xxhash64(key)[, est_items[, num_bits]])  → binary
  *   might_contain(bloom, xxhash64(key))                       → boolean
  *
  * The aggregate is partial-merge capable (each task builds a local
  * sketch, merge ORs the bitsets), so building the filter over an
  * N-row blocklist is one map-side-combined pass; the probe is a
  * per-row hash lookup against the broadcast sketch — no false
  * negatives, tunable false-positive rate via est_items/num_bits. */
object BloomFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_filter_agg",
      exprs => exprs match {
        case Seq(c) => new BloomFilterAggregate(c)
        case Seq(c, n) => new BloomFilterAggregate(c, n)
        case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
        case _ => throw new IllegalArgumentException(
          "bloom_filter_agg(child[, est_items[, num_bits]])")
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }
}
