package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** k=64 MinHash signature of a shingle array in one native pass.
  *
  * Each shingle is string-hashed ONCE; the 64 hash-family members are
  * derived by mixing that base with a per-seed constant (a
  * SplitMix64-style finalizer) — the standard one-hash MinHash
  * construction. Internals only: LSH candidates just need to be a
  * superset, the exact-Jaccard verify supplies correctness, so no
  * cross-engine hash parity is required (unlike [[SimHash60]]). */
case class MinHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val sh = v.asInstanceOf[ArrayData]
    val sig = Array.fill(MinHashSig.K)(Long.MaxValue)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      val s = sh.getUTF8String(i)
      if (s != null) { // skip nulls: registered SQL fn, arbitrary arrays
        val base = Murmur3_x86_32.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes(), 42).toLong
        var k = 0
        while (k < MinHashSig.K) {
          val h = MinHashSig.mix(base + MinHashSig.seeds(k))
          if (h < sig(k)) sig(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

object MinHashSig {
  val K = 64
  private[functions] val seeds: Array[Long] =
    Array.tabulate(K)(i => 0x9E3779B97F4A7C15L * (i + 1))

  /** SplitMix64 finalizer — full-avalanche 64-bit mix. */
  private[functions] def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs.head), "built-in")
}
