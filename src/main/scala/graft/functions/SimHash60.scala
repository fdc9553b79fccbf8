package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 60-bit frequency-weighted SimHash of a token array in one native
  * pass — bit-identical to the SQL formulation
  * `cast(conv(substr(md5(concat('0#', t)), 1, 15), 16, 10) as bigint)`
  * per token + ±1 bit votes, which is what the cross-engine oracle
  * reproduces. The SQL-fold version walks 60 interpreted lambda adds per
  * token; this is one md5 and one 60-iteration primitive loop per token.
  *
  * CodegenFallback: the body is JVM-native (MessageDigest) — falling out
  * of whole-stage codegen for this single projection costs far less than
  * the interpreted higher-order folds it replaces. */
case class SimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](60)
    val md = MessageDigest.getInstance("MD5")
    val n = toks.numElements()
    // Frequency-weighted simhash only needs one digest per DISTINCT
    // token: count multiplicities first, then add ±count votes per bit.
    // Natural-language token streams repeat heavily (stopwords), so this
    // cuts the md5 count ~2× without changing the value.
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) { // skip nulls: registered SQL fn, arbitrary arrays
        val c = counts.get(t)
        counts.put(t, if (c == null) 1 else c + 1)
      }
      i += 1
    }
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      md.reset()
      md.update(SimHash60.prefix)
      md.update(e.getKey.getBytes)
      val h = SimHash60.first15HexAsLong(md.digest())
      val c = e.getValue.intValue()
      var k = 0
      while (k < 60) {
        if (((h >>> k) & 1L) == 1L) votes(k) += c else votes(k) -= c
        k += 1
      }
    }
    var out = 0L
    var k = 0
    while (k < 60) { if (votes(k) > 0) out |= (1L << k); k += 1 }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash60 =
    copy(child = c)
}

object SimHash60 {
  private val prefix = "0#".getBytes(StandardCharsets.UTF_8)

  /** The value of `cast(conv(substr(hex(md5), 1, 15), 16, 10) as bigint)`:
    * the first 15 lowercase-hex chars of the digest = the top 7.5 bytes,
    * read big-endian. */
  private[functions] def first15HexAsLong(digest: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    (h << 4) | ((digest(7) & 0xf0L) >>> 4)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash60", exprs => SimHash60(exprs.head), "built-in")
}
