package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All `tables` random-hyperplane LSH bucket ids of a double vector in
  * one native pass: bucket_t bit i = sign(v · h_{t,i}), `bits` bits per
  * table.
  *
  * Hyperplane coordinates are derived on the fly from a SplitMix64
  * stream keyed by (table, bit, dim) — deterministic across executors
  * and sessions, no driver-side literal arrays in the plan (the literal
  * form put tables×bits 64-element array literals into the expression
  * tree; analysis + codegen of that plan cost more than the scan).
  * Buckets are sign patterns, so any uniform symmetric coordinate
  * distribution works; correctness always comes from the exact
  * verify/rerank downstream (internals only — no cross-engine oracle).
  *
  * Scale shape: per-row column math, O(tables·bits·dim) flops, no
  * shuffle; the caller joins on (table, bucket) so candidates stay
  * bucket-local. */
case class HyperplaneLsh(child: Expression, tables: Int, bits: Int,
                         seed: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_lsh expects array<double>, got ${t.simpleString}")
  }

  override def nullable: Boolean = true // null element ⇒ null result

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val dim = x.numElements()
    // registered SQL fn, arbitrary arrays: a null element has no
    // defined sign pattern — yield NULL rather than reading garbage
    var j = 0
    while (j < dim) { if (x.isNullAt(j)) return null; j += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var i = 0
      while (i < bits) {
        var dot = 0.0
        var d = 0
        while (d < dim) {
          dot += x.getDouble(d) * HyperplaneLsh.coord(seed, t, i, d)
          d += 1
        }
        if (dot > 0.0) bucket |= (1L << i)
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneLsh =
    copy(child = c)
}

object HyperplaneLsh {
  /** Deterministic hyperplane coordinate in [-1, 1). */
  private[functions] def coord(seed: Long, t: Int, i: Int, d: Int): Double = {
    val z = MinHashSig.mix(
      seed ^ (t.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xC2B2AE3D27D4EB4FL
        + d.toLong + 1L))
    ((z >>> 11) * (1.0 / (1L << 53))) * 2.0 - 1.0
  }

  /** Numeric-literal args arrive as whatever box the SQL parser chose
    * (Integer for `7`, Long for `7L`) — unbox tolerantly, don't cast. */
  private def num(e: Expression): Long = e.eval() match {
    case n: java.lang.Number => n.longValue()
    case other => throw new IllegalArgumentException(
      s"hyperplane_lsh expects literal numeric args, got $other")
  }

  /** Shared builder for the session registry and the extensions plugin.
    * Validates here (it's a session-registered SQL function fed arbitrary
    * user input): bits > 64 would silently alias bucket bits through
    * `1L << i` wraparound (shift count mod 64 — bit 64 collides with
    * bit 0; shifts 0..63 are all distinct, the sign bit included), and
    * non-positive tables/bits yield degenerate all-zero or empty bucket
    * arrays. */
  val fromExprs: Seq[Expression] => HyperplaneLsh = { exprs =>
    val tables = num(exprs(1)).toInt
    val bits = num(exprs(2)).toInt
    if (tables <= 0) throw new IllegalArgumentException(
      s"hyperplane_lsh: tables must be positive, got $tables")
    if (bits <= 0 || bits > 64) throw new IllegalArgumentException(
      s"hyperplane_lsh: bits must be in [1, 64] (bucket ids are one long " +
        s"per table; a 65th bit would alias bit 0 via shift wraparound), " +
        s"got $bits")
    HyperplaneLsh(exprs.head, tables, bits,
      if (exprs.length > 3) num(exprs(3)) else 42L)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_lsh", fromExprs, "built-in")
}
